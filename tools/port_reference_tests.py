"""Port the reference's golden-output test corpus into tests/corpus/cases.json.

The reference tests (122 shell scripts driving the lognormalizer CLI through
tests/exec.sh) are highly regular: add_rule / execute / assert_output_json_eq
sequences.  This tool extracts those sequences, including:

* named auxiliary rulebases (``add_rule '...' child`` / ``reset_rules child``
  write ``child.rulebase`` next to the main one — used by include= and the
  v1 descent field type); cases carry them as ``aux: {name: text}``
* v1 rulebases (no ``version=2`` header — the reference routes them to the
  v1 engine; the port keeps the raw text and the loader applies the v1
  quirks itself)
* ``export ln_opts='-oallowRegex'`` → ctx opts for subsequent cases
* ``assert_output_contains '"k": v'`` → a subset check on one key
  (exec.sh greps the json-c output; every fragment in the corpus is a
  complete ``"key": value`` pair, so it is parsed and checked as JSON)
* ``add_rule_no_LF`` → the rulebase text ends without a trailing newline
* ``execute_with_string 'rule' 'input'`` → a standalone from-string case
  (the lognormalizer -R path)

Scripts using features we can't model as data (env-var mutation, shell
control flow, file inputs) are listed in SKIPPED with a reason; where the
underlying feature IS supported they are covered by hand-written tests
(tests/test_loader_features.py, CLI tests) instead.

Run:  python tools/port_reference_tests.py
"""

from __future__ import annotations

import json
import os
import re
import sys

TESTS_DIR = "/root/reference/tests"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus", "cases.json")

CMDS = (
    "add_rule_no_LF",
    "add_rule",
    "execute_with_string",
    "execute",
    "assert_output_json_eq",
    "assert_output_contains",
)
HARD_SKIP = (
    "export LIBLOGNORM_RULEBASES",
    "for ",
    "if ",
    "while ",
    "msg=",
    "mv ",
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
_QUOTED = re.compile(r"'([^']*)'", re.S)


def _strip_trailing_commas(s: str) -> str:
    # crude but safe for the corpus: no string literal contains ",}" or ",]"
    prev = None
    while prev != s:
        prev = s
        s = _TRAILING_COMMA.sub(r"\1", s)
    return s


def _parse_opts(line: str) -> set[str]:
    """'-oallowRegex -oaddRule' -> {'allowRegex', 'addRule'}."""
    val = line.split("=", 1)[1].strip().strip("'\"")
    return {m.group(1) for m in re.finditer(r"-o(\S+)", val)}


def _args_of(line: str, first: str):
    """Quoted args plus an optional trailing bare token (include.sh writes
    ``add_rule 'version=2' inc``)."""
    args = _QUOTED.findall(line)
    tail = line
    for q in _QUOTED.finditer(line):
        tail = tail.replace(q.group(0), " ", 1)
    tail = tail.replace(first, "", 1).strip()
    if tail and not tail.startswith("#"):
        args.append(tail.split()[0])
    return args


def port_script(path: str):
    """Returns (cases, skip_reason). cases = list of {rulebase, steps, ...}."""
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
    aux: dict[str, list[str]] = {}  # named rulebases persist across flushes
    opts: set[str] = set()
    no_lf = False
    pending_input = None
    string_case = None  # active execute_with_string case

    def flush():
        nonlocal cur_rules, cur_steps, pending_input, no_lf, string_case
        if cur_rules and cur_steps:
            text = "\n".join(cur_rules) + ("" if no_lf else "\n")
            case = {"rulebase": text, "steps": cur_steps}
            if aux:
                case["aux"] = {k: "\n".join(v) + "\n" for k, v in aux.items() if v}
            if opts:
                case["opts"] = sorted(opts)
            cases.append(case)
        cur_rules, cur_steps, pending_input = [], [], None
        no_lf = False
        string_case = None

    def parse_expected(arg: str, wrap: bool):
        src = "{" + arg + "}" if wrap else arg
        # raw_decode: json_eq parses the first JSON value and ignores
        # trailing garbage (a few scripts have stray '}')
        expected, _ = json.JSONDecoder().raw_decode(
            _strip_trailing_commas(src).strip()
        )
        return expected

    for entry in lines:
        line = entry.strip()
        if not line:
            continue
        first = line.split(None, 1)[0] if line else ""
        if line.startswith("export ln_opts=") or line.startswith("ln_opts="):
            flush()  # earlier cases ran with the OLD opts
            opts |= _parse_opts(line)
            continue
        if line.startswith("reset_rules"):
            rest = line[len("reset_rules"):].strip().strip("'\"")
            if rest:
                aux[rest] = []  # named: clear that file only, no flush
            else:
                flush()
            continue
        if any(line.startswith(h) for h in HARD_SKIP):
            return None, f"uses {first!r}"
        matched_cmd = next(
            (c for c in CMDS if first == c or line.startswith(c + " ")), None
        )
        if matched_cmd:
            args = _args_of(line, matched_cmd)
            if not args:
                return None, f"unquoted arg: {line[:40]!r}"
            kind = matched_cmd
            if kind in ("add_rule", "add_rule_no_LF"):
                if cur_steps or string_case is not None:
                    flush()
                # exec.sh's add_rule echoes $1 UNQUOTED: the shell collapses
                # whitespace runs and strips leading/trailing space (the
                # reference's own tests rely on this, e.g.
                # repeat_mismatch_in_while.sh "cannot use two consecutive
                # spaces"); \x20 escapes exist to write literal spaces.
                rule = re.sub(r"[ \t\n]+", " ", args[0]).strip()
                if len(args) > 1:
                    aux.setdefault(args[1], []).append(rule)
                else:
                    cur_rules.append(rule)
                    no_lf = kind == "add_rule_no_LF"
            elif kind == "execute_with_string":
                if len(args) < 2:
                    return None, f"execute_with_string args: {line[:40]!r}"
                flush()
                string_case = {"rulebase": args[0] + "\n", "steps": []}
                if opts:
                    string_case["opts"] = sorted(opts)
                cases.append(string_case)
                pending_input = args[1]
            elif kind == "execute":
                if args[0] == "file" or len(args) > 1:
                    return None, "file input"
                pending_input = args[0]
            else:
                if pending_input is None:
                    return None, "assert without execute"
                contains = kind == "assert_output_contains"
                try:
                    expected = parse_expected(args[0], wrap=contains)
                except ValueError as e:
                    return None, f"unparsable expected json: {e}"
                step = {"input": pending_input, "expected": expected}
                if contains:
                    step["contains"] = True
                (string_case["steps"] if string_case is not None else cur_steps).append(step)
                # pending_input is kept: test.out persists, so several
                # asserts may check the same execute's output
            continue
        if any(line.startswith(p) for p in IGNORABLE):
            continue
        return None, f"unknown construct: {line[:40]!r}"
    flush()
    cases = [c for c in cases if c["steps"]]
    if not cases:
        return None, "no extractable cases"
    return cases, None


def _very_long_msg() -> str:
    """The shell loop from very_long_logline*.sh: 10 doublings + alphabet
    runs -> a ~110KB line."""
    msg = "foo"
    alpha = ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" * 2)
    for i in range(1, 11):
        msg = f"{msg},{msg},{alpha}{i}"
    return msg


def _hand_ported() -> dict:
    """Scripts whose only unmodelable construct is the shell loop that
    builds the input string — reproduced here."""
    msg = _very_long_msg()
    mac = "f0:f6:1c:5f:cc:a2"
    return {
        "very_long_logline.sh": [
            {"rulebase": "rule=:%line:rest%\n",
             "steps": [{"input": msg, "expected": {"line": msg}}]}
        ],
        "very_long_logline_jsoncnf.sh": [
            {"rulebase": 'version=2\nrule=:%{"name":"line", "type":"rest"}%\n',
             "steps": [{"input": msg, "expected": {"line": msg}}]}
        ],
        # the script mv's inc.rulebase to a directory reachable only via
        # the LIBLOGNORM_RULEBASES env var (samp.c include resolution);
        # aux_env files land in a SEPARATE dir the runner exports there
        "include_RULEBASES.sh": [
            {"rulebase": "version=2\ninclude=inc.rulebase\n",
             "aux_env": {"inc": "version=2\nrule=:%field:mac48%\n"},
             "steps": [
                 {"input": mac, "expected": {"field": mac}},
                 {"input": mac, "expected": {"field": mac}},
             ]}
        ],
    }


def main():
    corpus = {}
    skipped = {}
    hand = _hand_ported()
    for fn in sorted(os.listdir(TESTS_DIR)):
        if not fn.endswith(".sh") or fn in ("exec.sh", "options.sh"):
            continue
        if fn == "field_name_value_quoted.sh":
            skipped[fn] = "not in reference tests/Makefile.am TESTS (disabled upstream)"
            continue
        if fn in hand:
            corpus[fn] = hand[fn]
            continue
        cases, reason = port_script(os.path.join(TESTS_DIR, fn))
        if reason:
            skipped[fn] = reason
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
