"""Port the reference's golden-output test corpus into tests/corpus/cases.json.

The reference tests (123 shell scripts driving the lognormalizer CLI through
tests/exec.sh) are highly regular: add_rule / execute / assert_output_json_eq
sequences.  This tool extracts those sequences; scripts using features we
don't model (CLI option flags, file inputs, multi-rulebase includes,
loader-error greps) are listed in SKIPPED with a reason and get hand-written
tests instead where the feature is supported.

Run:  python tools/port_reference_tests.py
"""

from __future__ import annotations

import json
import os
import re
import sys

TESTS_DIR = "/root/reference/tests"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus", "cases.json")

CMDS = ("add_rule", "execute", "assert_output_json_eq")
HARD_SKIP = (
    "execute_with_string",
    "add_rule_no_LF",
    "assert_output_contains",
    "ln_opts",
    "export ",
    "for ",
    "if ",
    "while ",
    "msg=",
)
IGNORABLE = (
    "#",
    ". ",
    "test_def",
    "cleanup_tmp_files",
    "no_solaris10",
    "echo ",
    "echo",
    "rm ",
    "set ",
    "exit",
    "uname",
)

# json-c tolerates trailing commas; Python json does not
_TRAILING_COMMA = re.compile(r",(\s*[}\]])")


def _strip_trailing_commas(s: str) -> str:
    # crude but safe for the corpus: no string literal contains ",}" or ",]"
    prev = None
    while prev != s:
        prev = s
        s = _TRAILING_COMMA.sub(r"\1", s)
    return s


def port_script(path: str):
    """Returns (cases, skip_reason). cases = list of {rulebase, steps}."""
    with open(path, encoding="utf-8", errors="replace") as f:
        raw_lines = f.read().splitlines()

    # join multi-line single-quoted commands (quote-count parity)
    lines: list[str] = []
    buf = ""
    for ln in raw_lines:
        buf = buf + "\n" + ln if buf else ln
        if buf.count("'") % 2 == 0:
            lines.append(buf)
            buf = ""
    if buf:
        lines.append(buf)

    cases = []
    cur_rules: list[str] = []
    cur_steps: list[dict] = []
    pending_input = None

    def flush():
        nonlocal cur_rules, cur_steps, pending_input
        if cur_rules and cur_steps:
            cases.append({"rulebase": "\n".join(cur_rules) + "\n", "steps": cur_steps})
        cur_rules, cur_steps, pending_input = [], [], None

    for entry in lines:
        line = entry.strip()
        if not line:
            continue
        first = line.split(None, 1)[0] if line else ""
        if line.startswith("reset_rules"):
            flush()
            continue
        if any(line.startswith(h) for h in HARD_SKIP):
            return None, f"uses {first!r}"
        if first in CMDS or any(line.startswith(c + " ") for c in CMDS):
            q1 = line.find("'")
            q2 = line.rfind("'")
            if q1 < 0 or q2 <= q1:
                return None, f"unquoted arg: {line[:40]!r}"
            arg = line[q1 + 1 : q2]
            trailing = line[q2 + 1 :].strip()
            if trailing and not trailing.startswith("#"):
                return None, f"extra arg: {trailing[:30]!r}"
            kind = first
            if kind == "add_rule":
                if cur_steps:
                    flush()
                # exec.sh's add_rule echoes $1 UNQUOTED: the shell collapses
                # whitespace runs and strips leading/trailing space (the
                # reference's own tests rely on this, e.g.
                # repeat_mismatch_in_while.sh "cannot use two consecutive
                # spaces"); \x20 escapes exist to write literal spaces.
                arg = re.sub(r"[ \t\n]+", " ", arg).strip()
                cur_rules.append(arg)
            elif kind == "execute":
                if arg == "file":
                    return None, "file input"
                pending_input = arg
            else:
                if pending_input is None:
                    return None, "assert without execute"
                try:
                    # raw_decode: json_eq parses the first JSON value and
                    # ignores trailing garbage (a few scripts have stray '}')
                    expected, _ = json.JSONDecoder().raw_decode(
                        _strip_trailing_commas(arg).strip()
                    )
                except ValueError as e:
                    return None, f"unparsable expected json: {e}"
                cur_steps.append({"input": pending_input, "expected": expected})
                pending_input = None
            continue
        if any(line.startswith(p) for p in IGNORABLE):
            continue
        return None, f"unknown construct: {line[:40]!r}"
    flush()
    if not cases:
        return None, "no extractable cases"
    return cases, None


def main():
    corpus = {}
    skipped = {}
    for fn in sorted(os.listdir(TESTS_DIR)):
        if not fn.endswith(".sh") or fn in ("exec.sh", "options.sh"):
            continue
        if fn.endswith("_v1.sh") or "_v1_" in fn:
            skipped[fn] = "v1 engine (out of scope, doc/configuration.rst:60-81)"
            continue
        if fn == "field_name_value_quoted.sh":
            skipped[fn] = "not in reference tests/Makefile.am TESTS (disabled upstream)"
            continue
        cases, reason = port_script(os.path.join(TESTS_DIR, fn))
        if reason:
            skipped[fn] = reason
        elif not any("version=2" in c["rulebase"] for c in cases):
            skipped[fn] = "v1 rulebase (no version=2 header; v1 engine out of scope)"
        else:
            corpus[fn] = cases
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"cases": corpus, "skipped": skipped}, f, indent=1, ensure_ascii=False)
    n_steps = sum(len(c["steps"]) for cs in corpus.values() for c in cs)
    print(f"ported {len(corpus)} scripts / {n_steps} assertions; skipped {len(skipped)}")
    for k, v in sorted(skipped.items()):
        print(f"  SKIP {k}: {v}")


if __name__ == "__main__":
    sys.exit(main())
