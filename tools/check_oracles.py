"""Local replica of the driver's correctness gate: run every queries()
entry under Spark and its oracle_sql() twin under DuckDB at a given sf,
compare row count, column names, and an order-insensitive value hash.

Run: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        "|".join(_fmt(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _fmt(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from liblognorm_spark.session import get_spark

    # an unknown name (a typo, or flag-style args this positional CLI
    # doesn't take) must be a hard error: a filter that matches nothing
    # once printed "all queries match their oracles" after checking NONE
    unknown = only - set(E.queries())
    if unknown:
        print(f"unknown query names (usage: check_oracles.py SF_DIR [name ...]): "
              f"{sorted(unknown)}")
        sys.exit(2)

    spark = get_spark(app="check_oracles", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0 and name not in ("minhash_pairs", "ngram_jaccard", "embedding_near_dups"):
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        else:
            sh = value_hash([tuple(r) for r in srows], [c.lower() for c in scols])
            oh = value_hash(orows, [c.lower() for c in ocols])
            if sh != oh:
                problems.append("value hash mismatch")
                srt = sorted(map(repr, srows))[:3]
                ort = sorted(map(repr, orows))[:3]
                problems.append(f" spark sample: {srt}")
                problems.append(f" duck  sample: {ort}")
        if problems:
            failures.append((name, "; ".join(problems[:2])))
            print(f"FAIL {name}: " + "\n".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
