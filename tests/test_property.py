"""Property tests: the vectorized regex fast path must agree with the
exact-semantics walker on arbitrary inputs (the walker is the reference
semantics; the regex path is an optimization that must be observationally
identical)."""

import json
import os

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from liblognorm_spark.compiler.compiler import compile_rulebase
from liblognorm_spark.pipeline.fixture_rulebase import routing_rulebase
from liblognorm_spark.rulebase.loader import Rulebase
from liblognorm_spark.runtime.matcher import match_batch
from liblognorm_spark.runtime.walker import normalize_message

# part of the `pytest -m fuzz` regression sweep (see README / pytest.ini)
pytestmark = pytest.mark.fuzz
FUZZ_SCALE = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1")))

RULEBASES = [
    routing_rulebase(),
    routing_rulebase(with_fallback=False),
    # motif soup with priorities + types + alternatives
    (
        "version=2\n"
        "type=@ip:%..:ipv4%\n"
        "type=@ip:%..:ipv6%\n"
        "rule=a:%f:@ip% %r:rest%\n"
        "rule=b:n=%n:number% f=%f:float%\n"
        "rule=c:%h:hexnumber% %m:mac48%\n"
        "rule=d:%d:date-rfc5424% %w:word%\n"
        "rule=e:%q:quoted-string%-%o:op-quoted-string%\n"
        "rule=f:%a:alpha%%s:whitespace%%k:char-to:;%;\n"
        "rule=g:%x:string-to:END%END\n"
        "rule=h:%kv:name-value-list%\n"
    ),
    # prefix-nested user-type alternatives: the reference walks the type as
    # a merged PDAG that prefers the deeper continuation and COMMITS (no
    # re-entry after the type's first terminal success) — 'ab' on input
    # 'ab' therefore consumes 2 and the trailing literal b FAILS the rule,
    # while 'abb' matches (pdag.c:1435-1442; ADVICE round 1)
    (
        "version=2\n"
        "type=@t:a\n"
        "type=@t:ab\n"
        "rule=i:%f:@t%b\n"
        "rule=j:x %g:@t% y\n"
    ),
    # strict-prefix pair with >1 extra char: not regex-expressible (failed
    # deeper branch still extends consumption via npb->parsedTo), so the
    # compiler must route these rules to the exact walker
    (
        "version=2\n"
        "type=@u:a\n"
        "type=@u:abc\n"
        "rule=k:%f:@u%z\n"
    ),
]
COMPILED = [(rb_text, compile_rulebase(Rulebase.from_string(rb_text))) for rb_text in RULEBASES]

# generator biased toward near-miss log-looking strings
log_text = st.one_of(
    st.text(
        alphabet="abcdef0123456789 .:-=[]{}\"'\\,;%\n\tXYZusershd",
        min_size=0,
        max_size=80,
    ),
    st.sampled_from(
        [
            "sshd[123]: Invalid user bob from 10.1.2.3",
            "sshd[123]: Invalid user bob from 10.1.2.999",
            "Oct 29 09:47:08 h1 ftpd: FTP session closed",
            "Oct 29 09:47:08 h1 ftpd FTP session closed",
            "iptables denied: IN= OUT=",
            "a=1 b=2",
            "a=1  b=2",
            '{"k": [1, 2]}',
            '{"k": ',
            "12:34:56",
            "0xff ",
            "fe80::1 x",
            "1.2.3.4",
            '"quoted" z',
            "abc ;x;",
            "payloadEND",
            "n=42 f=-.5",
            "n=042 f=1.2.3",
            "2024-01-02T03:04:05Z w",
            "2024-1-2T3:4:5+01:00 w",
            # custom-type greedy-commit corners
            "ab",
            "abb",
            "abbb",
            "a",
            "ax",
            "az",
            "abz",
            "abcz",
            "x a y",
            "x ab y",
            "x ab yb",
        ]
    ),
)


@settings(max_examples=300 * FUZZ_SCALE, deadline=None)
@given(idx=st.integers(0, len(COMPILED) - 1), text=log_text)
def test_fast_path_equals_walker(idx, text):
    rb_text, crb = COMPILED[idx]
    fast = match_batch(crb, pd.Series([text], dtype=object))
    rule, ev, _pto = normalize_message(crb.ordered_rules, text, crb.types, crb.annotations)
    fast_rule = int(fast["rule_id"][0])
    walker_rule = rule.rule_id if rule is not None else -1
    assert fast_rule == walker_rule, (
        f"rule mismatch for {text!r}: fast={fast_rule} walker={walker_rule}"
    )
    fast_ev = json.loads(fast["fields_json"][0]) if fast["fields_json"][0] else {}
    assert fast_ev == ev, f"event mismatch for {text!r}:\n fast={fast_ev}\n walk={ev}"
