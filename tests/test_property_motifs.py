"""Per-motif property fuzz: for every motif with a regex fragment, the
fast path must agree with the exact walker on NEAR-VALID inputs — valid
samples with one random character corrupted, truncated, or extended are
exactly where a superset/subset fragment bug would hide (range checks,
EOS quirks, delimiter lookaheads)."""

import json
import os

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from liblognorm_spark.compiler.compiler import compile_rulebase
from liblognorm_spark.rulebase.loader import Rulebase
from liblognorm_spark.runtime.matcher import match_batch
from liblognorm_spark.runtime.walker import normalize_message

# regression-fuzz infrastructure (found 5 real divergences in round 2):
# `pytest -m fuzz` runs these at the CI budget below; a deep campaign
# multiplies every budget via SPARK_GRAFT_FUZZ_SCALE (see README)
pytestmark = pytest.mark.fuzz
FUZZ_SCALE = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1")))

# (motif rule body, generator of valid-ish field text)
d2 = st.integers(0, 99).map(lambda n: f"{n:02d}")
MOTIFS = [
    ("%f:number% %r:rest%", st.integers(0, 10**12).map(str)),
    ("%f:number{\"maxval\": 500}% %r:rest%", st.integers(0, 1000).map(str)),
    ("%f:float% %r:rest%", st.tuples(st.sampled_from(["", "-"]), st.integers(0, 999), st.sampled_from(["", ".", ".5", ".25"])).map(lambda t: f"{t[0]}{t[1]}{t[2]}")),
    ("%f:hexnumber% %r:rest%", st.integers(0, 2**32).map(hex)),
    ("%f:ipv4% %r:rest%", st.tuples(*[st.integers(0, 300)] * 4).map(lambda t: ".".join(map(str, t)))),
    ("%f:ipv6% %r:rest%", st.one_of(
        st.sampled_from([
            "::1", "fe80::1", "1:2:3:4:5:6:7:8", "::ffff:1.2.3.4", "1::2:3",
            "::", "1:2::3:4", "12345::1", "g::1", "1:2:3:4:5:6:7:8:9", "fe80:::1",
        ]),
        # compositional: 0-9 hex groups with an optional '::' inserted
        # anywhere and an optional trailing v4 suffix
        st.tuples(
            st.lists(st.integers(0, 0xFFFFF).map(lambda v: f"{v:x}"), max_size=9),
            st.integers(-1, 9),
            st.booleans(),
        ).map(lambda t: (lambda gs, dc, v4: (
            ":".join(gs[:dc] ) + "::" + ":".join(gs[dc:]) if 0 <= dc <= len(gs)
            else ":".join(gs)
        ) + (".1.2.3.4" if v4 else ""))(*t)),
    )),
    ("%f:mac48% %r:rest%", st.tuples(st.sampled_from([":", "-"]), *[st.integers(0, 255)] * 6).map(
        lambda t: t[0].join(f"{b:02x}" for b in t[1:]))),
    ("%f:date-rfc3164% %r:rest%", st.one_of(
        st.tuples(
            st.sampled_from(["Jan", "Oct", "Dec", "Xxx", "jan"]), st.integers(0, 39), d2, d2, d2,
        ).map(lambda t: f"{t[0]} {t[1]} {t[2]}:{t[3]}:{t[4]}"),
        # hParseInt accepts ZERO digits (value 0) for hour/min/sec
        st.sampled_from([
            "Jan 10 00:00:", "Jan 10 ::", "Jan 10 :5:", "Jan 10 24::",
            "Jan 10 0:0:0:", "Jan 10 0:0:61",
        ]),
    )),
    ("%f:date-rfc5424% %r:rest%", st.one_of(
        st.tuples(
            st.integers(1999, 2030), st.integers(0, 13), st.integers(0, 32), d2, d2, d2,
            st.sampled_from(["Z", "+01:00", "-23:30", "+24:00", ""]),
        ).map(lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}T{t[3]}:{t[4]}:{t[5]}{t[6]}"),
        # empty year / empty H:M:S / empty offset fields are all valid
        st.sampled_from([
            "-1-1T::Z", "2024-1-2T1:0:0+:", "2024-01-02T::59-0:",
            "-0-1T::Z", "2024-13-1T::Z", "--1T::Z",
        ]),
    )),
    ("%f:date-iso% %r:rest%", st.tuples(st.integers(1999, 2030), st.integers(0, 13), st.integers(0, 32)).map(
        lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}")),
    ("%f:time-24hr% %r:rest%", st.tuples(st.integers(0, 30), d2, d2).map(
        lambda t: f"{t[0]:02d}:{t[1]}:{t[2]}")),
    ("%f:time-12hr% %r:rest%", st.tuples(st.integers(0, 13), d2, d2, st.sampled_from(["AM", "PM", "am", "xm"])).map(
        lambda t: f"{t[0]}:{t[1]}:{t[2]} {t[3]}")),
    ("%f:duration% %r:rest%", st.tuples(st.integers(0, 200), st.integers(0, 70), st.integers(0, 70)).map(
        lambda t: f"{t[0]}:{t[1]:02d}:{t[2]:02d}")),
    ("%f:kernel-timestamp% %r:rest%", st.tuples(st.integers(1, 10**12), st.integers(0, 999999)).map(
        lambda t: f"[{t[0]}.{t[1]:06d}]")),
    ("%f:quoted-string% %r:rest%", st.text(alphabet="ab\\\" ", max_size=12).map(lambda s: f'"{s}"')),
    ("%f:op-quoted-string% %r:rest%", st.text(alphabet="ab\" ", max_size=12)),
    ("%f:char-to:;%;%r:rest%", st.text(alphabet="ab;", max_size=10)),
    ("%f:char-sep:,% %r:rest%", st.text(alphabet="ab,", max_size=10)),
    ("%f:string-to:END%END%r:rest%", st.text(alphabet="aEND", max_size=14)),
    ("%f:v2-iptables% %r:rest%", st.lists(
        st.sampled_from(["IN=", "OUT=eth0", "SRC=1.2.3.4", "DF", "LEN=12", "a=b"]),
        min_size=1, max_size=4).map(" ".join)),
    ("%f:name-value-list% %r:rest%", st.lists(
        st.sampled_from(["a=1", "b=", "=c", "dd=ee", "f"]), min_size=1, max_size=4).map(" ".join)),
    ("%f:cee-syslog% %r:rest%", st.sampled_from([
        '@cee: {"a": 1}', '@cee:{"a":1}', '@cee: {', '@cee: []', 'x@cee: {}',
    ])),
    ("%f:whitespace%x %r:rest%", st.text(alphabet=" \t\n\v\f\rx", max_size=8)),
    # validate-via-walker motifs: a non-superset fragment breaks PRIORITY
    # when a catch-all rule exists (the harness has one) — fuzz the guard
    ("%f:cef% %r:rest%", st.tuples(
        st.sampled_from(["CEF:0", "CEF:1", "CEF", "cef:0"]),
        st.lists(st.sampled_from(["V", "p|q", "x\\|y", "", "a b"]), min_size=6, max_size=6),
        st.sampled_from(["", " ", "   ", " a=b", " a=b c=d e", " _x.y=z", " a=v\\=w", " 9=x"]),
    ).map(lambda t: t[0] + "|" + "|".join(t[1]) + "|" + t[2])),
    ("%f:checkpoint-lea% %r:rest%", st.lists(
        st.sampled_from(["k: v;", "a:b;", " x: y z;", "k:;", ";", "k v;", "a: b"]),
        min_size=1, max_size=4).map("".join)),
    ("%f:json% %r:rest%", st.sampled_from([
        '{"a": 1}', '{"a":1}   ', '{"a": {"b": []}}', '{"a": }', '[1, 2]',
        '"str"', 'true', '{', '{}', '{"a": 1}}', 'null x',
    ])),
    ('%{"name":"f", "type":"repeat", "parser": {"type":"number"}, '
     '"while": {"type":"literal", "text":","}}% %r:rest%',
     st.lists(st.sampled_from(["1", "22", "333", "", "x"]), min_size=1, max_size=5).map(",".join)),
]
COMPILED = [
    (body, compile_rulebase(Rulebase.from_string(f"version=2\nrule=t:{body}\nrule=u:%all:rest%\n")), gen)
    for body, gen in MOTIFS
]

# corruption: identity, 1-char substitution, truncation, prefix/suffix junk
def _corrupt(draw_tuple):
    s, mode, pos, ch = draw_tuple
    if not s or mode == 0:
        return s
    p = pos % len(s)
    if mode == 1:
        return s[:p] + ch + s[p + 1 :]
    if mode == 2:
        return s[:p]
    return s + ch


def case_strategy(gen):
    return st.tuples(
        gen, st.integers(0, 3), st.integers(0, 63), st.sampled_from("09az.:- \\\"'|,=%")
    ).map(_corrupt)


@settings(max_examples=500 * FUZZ_SCALE, deadline=None)
@given(idx=st.integers(0, len(COMPILED) - 1), data=st.data())
def test_motif_fast_path_equals_walker(idx, data):
    body, crb, gen = COMPILED[idx]
    field = data.draw(case_strategy(gen))
    text = f"{field} tail"
    fast = match_batch(crb, pd.Series([text], dtype=object))
    rule, ev, _ = normalize_message(crb.ordered_rules, text, crb.types, crb.annotations)
    fast_rule = int(fast["rule_id"][0])
    walker_rule = rule.rule_id if rule is not None else -1
    assert fast_rule == walker_rule, (
        f"{body}: rule mismatch for {text!r}: fast={fast_rule} walker={walker_rule}"
    )
    fast_ev = json.loads(fast["fields_json"][0]) if fast["fields_json"][0] else {}
    assert fast_ev == ev, f"{body}: event mismatch for {text!r}:\n fast={fast_ev}\n walk={ev}"


rb_line = st.one_of(
    st.text(alphabet="rule=:%abc123{}\"':,.x% \t\\nXYZ@-", max_size=60),
    st.sampled_from([
        "version=2", "rule=t:%f:word%", "rule=:%f:", "rule=:%f:number{%",
        "prefix=%p:word% ", "extendprefix=x", "type=@t:%f:word%", "type=@t",
        "annotate=t:+a=\"b\"", "annotate=:", "include=/nonexistent",
        "rule=:%{\"name\":\"f\"}%", "rule=:%{bad json%", "rule=:%f:repeat{\"parser\":%",
        "rule=:a%%b", "rule=:%-:rest%", "rule=:%.:json%", "rule=:%f:descent:%",
        "rule=:%f:recursive:x:y%", "rule=:%f:tokenized%", "rule=:%f:suffixed:,:%",
    ]),
)


@settings(max_examples=500 * FUZZ_SCALE, deadline=None)
@given(idx=st.integers(0, len(COMPILED) - 1), data=st.data())
def test_flat_walk_equals_recursive_walk(idx, data):
    """The iterative flat walk (walker.walk_flat, the fallback-path speed
    optimization) must be observationally identical to the recursive
    reference-semantics walk on every flat rule: same accept/reject, same
    fields, same parsedTo diagnostics."""
    from liblognorm_spark.runtime.walker import (
        WalkState,
        flat_items,
        walk_flat,
        walk_seq,
    )

    body, crb, gen = COMPILED[idx]
    field = data.draw(case_strategy(gen))
    text = data.draw(st.sampled_from([f"{field} tail", field, f"{field} "]))
    for rule in crb.ordered_rules:
        flat = flat_items(rule)
        if flat is None:  # rule needs the recursive walker anyway
            continue
        s1 = WalkState(text=text, strlen=len(text), types=crb.types)
        s2 = WalkState(text=text, strlen=len(text), types=crb.types)
        ev1: dict = {}
        ev2: dict = {}
        ok1 = walk_flat(s1, flat, ev1)
        ok2 = walk_seq(s2, rule.seq, 0, 0, False, ev2, None)
        assert ok1 == ok2, f"{body}: accept mismatch for {text!r}"
        assert s1.parsed_to == s2.parsed_to, (
            f"{body}: parsedTo mismatch for {text!r}: flat={s1.parsed_to} rec={s2.parsed_to}"
        )
        if ok1:
            assert ev1 == ev2, f"{body}: fields mismatch for {text!r}:\n flat={ev1}\n rec={ev2}"


@settings(max_examples=400 * FUZZ_SCALE, deadline=None)
@given(lines=st.lists(rb_line, min_size=1, max_size=6), data=st.data())
def test_loader_never_crashes(lines, data):
    """Arbitrary rulebase text must load without raising — bad rules turn
    into error strings + dropped rules (the reference reports and skips,
    v1_samp.c:236-242), and whatever loaded must normalize any input
    without raising."""
    from liblognorm_spark.rulebase.loader import Rulebase
    from liblognorm_spark.runtime.matcher import normalize_strings

    rb = Rulebase.from_string("\n".join(lines) + "\n", opts=frozenset({"allowRegex"}))
    probe = data.draw(st.text(alphabet="abc 123.:%{}\"", max_size=30))
    out = normalize_strings(rb, [probe])
    assert isinstance(out[0], dict)


json_scalar = st.one_of(st.text(max_size=8), st.integers(-10, 10**9), st.booleans(), st.none(), st.floats(allow_nan=False, allow_infinity=False))
json_value = st.recursive(
    json_scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.text(max_size=6), inner, max_size=3),
    ),
    max_leaves=8,
)


@settings(max_examples=300 * FUZZ_SCALE, deadline=None)
@given(event=st.dictionaries(st.text(max_size=8), json_value, max_size=5))
def test_encoders_never_crash(event):
    """Every encoder must serialize arbitrary event shapes (nested maps,
    arrays, unicode, control chars) without raising — the CLI feeds them
    whatever a rulebase extracted."""
    from liblognorm_spark.encoders import (
        encode_csv,
        encode_json,
        encode_rfc5424,
        encode_xml,
    )

    assert isinstance(encode_json(event), str)
    assert isinstance(encode_xml(event), str)
    assert isinstance(encode_rfc5424(event), str)
    assert isinstance(encode_csv(event, sorted(event)[:3]), str)


def test_cli_flag_combos_never_traceback(tmp_path):
    """Random CLI flag combinations (valid and invalid) must exit with a
    proper status and never print a traceback."""
    import random
    import subprocess
    import sys

    rb = tmp_path / "t.rulebase"
    rb.write_text("version=2\nrule=t:%f:word%\n")
    flags = [["-e", "json"], ["-e", "bogus"], ["-E", "fields"], ["-p"], ["-P"],
             ["-H"], ["-T"], ["-t", "zzz"], ["-U"], ["-L"], ["-S"], ["-s"],
             ["-o", "bogusOpt"], ["-r", "/nonexistent"], ["--bogus"]]
    rng = random.Random(11)
    for _ in range(20 * FUZZ_SCALE):
        argv = [sys.executable, "-m", "liblognorm_spark.cli"]
        for fl in rng.sample(flags, rng.randrange(1, 3)):
            argv += fl
        if "-r" not in argv:
            argv += ["-r", str(rb)]
        r = subprocess.run(argv, input="hello there\n\x00junk\n",
                           capture_output=True, text=True, timeout=60)
        assert r.returncode in (0, 1, 2), (argv, r.returncode, r.stderr[-300:])
        assert "Traceback" not in r.stderr, (argv, r.stderr[-300:])


def test_corpus_mutation_differential():
    """Every ported reference rulebase, its own golden inputs mutated
    (seeded): the fast path must agree with the walker on ALL of them —
    this is the sweep that caught the float possessive-fraction bug."""
    import random

    corpus = json.load(open("tests/corpus/cases.json"))
    rng = random.Random(42)
    checked = 0
    for script, cases in sorted(corpus["cases"].items()):
        for case in cases:
            if case.get("aux") or case.get("aux_env"):
                continue
            rb = Rulebase.from_string(case["rulebase"], opts=frozenset(case.get("opts", ())))
            crb = compile_rulebase(rb)
            muts = []
            for s in (step["input"] for step in case["steps"]):
                muts.append(s)
                for _ in range(3 * FUZZ_SCALE):
                    if not s:
                        continue
                    p = rng.randrange(len(s))
                    mode = rng.randrange(3)
                    ch = rng.choice("09az.:-| =\\\"'")
                    muts.append(s[:p] + ch + s[p + 1:] if mode == 0
                                else (s[:p] if mode == 1 else s + ch))
            fast = match_batch(crb, pd.Series(muts, dtype=object))
            for i, t in enumerate(muts):
                rule, ev, _ = normalize_message(
                    crb.ordered_rules, t, crb.types, crb.annotations,
                    v1_engine=crb.version == 1,
                )
                fr, wr = int(fast["rule_id"][i]), (rule.rule_id if rule else -1)
                assert fr == wr, f"{script}: {t!r} fast={fr} walker={wr}"
                if wr >= 0:  # matched: the extracted fields must agree too
                    fev = json.loads(fast["fields_json"][i]) if fast["fields_json"][i] else {}
                    assert fev == ev, f"{script}: {t!r}\n fast={fev}\n walk={ev}"
                checked += 1
    assert checked > 1500
