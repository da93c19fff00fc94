"""Exact-semantics sequential matcher ("walker").

Mirrors the reference's recursive PDAG walk (src/pdag.c:1535-1621
``ln_normalizeRec`` + src/pdag.c:1393-1472 ``tryParser``) for a single
linearized rule: try items left to right, recurse on success, backtrack
across :class:`Alt` branches, track the longest parse offset (``parsedTo``,
the source of ``unparsed-data`` diagnostics) and attach field values
bottom-up with the ``fixJSON`` naming rules (src/pdag.c:1320-1389).

This is the slow path: it runs per row only for (a) rows that match no
vectorized rule regex (to compute the unparsed suffix), (b) rules
containing non-regexable motifs (json, cef, ...) after a cheap regex
prefilter, and (c) rows whose regex match failed value-dependent
post-validation.
"""

from __future__ import annotations

from dataclasses import dataclass

from liblognorm_spark.compiler.motifs import PARSERS, coerce_value
from liblognorm_spark.rulebase.loader import Alt, PNode, Rule


@dataclass
class WalkState:
    text: str
    strlen: int
    types: dict  # typename -> list[Seq]
    parsed_to: int = 0


def attach(json: dict, name, value) -> None:
    """fixJSON naming rules, src/pdag.c:1320-1389.

    * name None (or '-') -> discard value
    * name '.'  -> splice dict value's entries into parent
    * child dict with single key '..' -> collapse to scalar under name
    """
    if name is None:
        return
    if name == "." and isinstance(value, dict):
        for k, v in value.items():
            json[k] = v
        return
    if isinstance(value, dict) and len(value) == 1 and ".." in value:
        json[name] = value[".."]
        return
    json[name] = value


def try_parser(state: WalkState, node: PNode, offs: int):
    """One parser attempt.  Returns (ok, consumed, value).

    parsedTo is saved/restored around the attempt as in tryParser
    (src/pdag.c:1456, 1467)."""
    saved = state.parsed_to
    try:
        if node.ptype == "custom":
            tname = node.params["typename"]
            alts = state.types.get(tname)
            if not alts:
                return (False, 0, None)
            child: dict = {}
            ok = False
            for alt_seq in sorted(alts, key=_seq_prio_key):
                if walk_seq(state, alt_seq, 0, offs, True, child, None):
                    ok = True
                    break
            consumed = state.parsed_to - offs
            return (ok, consumed if ok else 0, child if ok else None)
        if node.ptype == "repeat":
            return _parse_repeat(state, node, offs)
        fn = PARSERS.get(node.ptype)
        if fn is None:
            return (False, 0, None)
        res = fn(state.text, offs, node.params)
        if res is None:
            return (False, 0, None)
        consumed, value = res
        return (True, consumed, coerce_value(node.ptype, value, node.params))
    finally:
        state.parsed_to = saved


def _seq_prio_key(seq):
    return seq[0].prio if seq else (30000 << 8) | 16


def _parse_repeat(state: WalkState, node: PNode, offs: int):
    """repeat motif, src/parser.c:3215-3295."""
    body = node.params["parser_seq"]
    while_seq = node.params["while_seq"]
    permit_mismatch = bool(
        node.params.get("option.permitMismatchInParser")
        or node.params.get("option.permitmismatchinparser")
    )
    parsed_to_save = state.parsed_to
    strtoffs = offs
    lastgood = strtoffs
    arr = None
    while True:
        child: dict = {}
        ok = walk_seq(state, body, 0, strtoffs, True, child, None)
        strtoffs = state.parsed_to
        if not ok:
            if permit_mismatch:
                strtoffs = lastgood
                break
            state.parsed_to = parsed_to_save
            return (False, 0, None)
        if arr is None:
            arr = []
        to_add = child
        if len(child) == 1 and "." in child:
            to_add = child["."]
        arr.append(to_add)
        state.parsed_to = 0
        lastgood = strtoffs
        ok = walk_seq(state, while_seq, 0, strtoffs, True, None, None)
        if ok:
            strtoffs = state.parsed_to
        else:
            break
    consumed = strtoffs - offs
    state.parsed_to = parsed_to_save
    return (True, consumed, arr)


def walk_seq(state: WalkState, seq, idx, offs, partial, json, cont) -> bool:
    """Recursive walk over a Seq with continuation `cont` = (seq, idx, cont).

    Returns True on a full (or partial-mode) match; on success, named values
    have been attached to `json` bottom-up."""
    while True:
        if idx == len(seq):
            if cont is None:
                return partial or offs == state.strlen
            seq, idx, cont = cont
            continue
        break
    item = seq[idx]
    if isinstance(item, Alt):
        new_cont = (seq, idx + 1, cont)
        for alt_seq in sorted(item.alts, key=_seq_prio_key):
            if walk_seq(state, alt_seq, 0, offs, partial, json, new_cont):
                return True
        return False
    ok, consumed, value = try_parser(state, item, offs)
    if not ok:
        return False
    new_offs = offs + consumed
    sub = walk_seq(state, seq, idx + 1, new_offs, partial, json, cont)
    # longest-parse update happens after the recursion returns, success or
    # not (src/pdag.c:1600-1603)
    if new_offs > state.parsed_to:
        state.parsed_to = new_offs
    if sub and json is not None:
        attach(json, item.name, value)
    return sub


def match_rule(rule: Rule, text: str, types: dict, state: WalkState | None = None):
    """Try one rule against `text`.  Returns fields dict or None.

    `state` carries parsedTo across rules of the same message so the
    unparsed suffix reflects the global longest parse (src/pdag.c:1299)."""
    if state is None:
        state = WalkState(text=text, strlen=len(text), types=types)
    fields: dict = {}
    if walk_seq(state, rule.seq, 0, 0, False, fields, None):
        return fields
    return None


def _lit_prefix(rule) -> str:
    pref = getattr(rule, "_lit_prefix_cache", None)
    if pref is None:
        seq = rule.seq
        pref = ""
        if seq and isinstance(seq[0], PNode) and seq[0].ptype == "literal" and seq[0].name is None:
            pref = seq[0].params["text"]
        rule._lit_prefix_cache = pref
    return pref


def normalize_message(rules, text: str, types: dict, annotations=None):
    """Full reference semantics for one message: first matching rule wins
    (rules must already be in priority order); on failure emit
    originalmsg/unparsed-data (src/pdag.c:1653-1683, 1299-1316).

    Rules whose leading literal cannot prefix the text are skipped — an
    all-or-nothing leading-literal failure contributes neither a match nor
    parsedTo progress, so the skip is observationally identical."""
    state = WalkState(text=text, strlen=len(text), types=types)
    for rule in rules:
        pref = _lit_prefix(rule)
        if pref and not text.startswith(pref):
            continue
        fields: dict = {}
        if walk_seq(state, rule.seq, 0, 0, False, fields, None):
            event = dict(fields)
            if rule.tags:
                event["event.tags"] = list(rule.tags)
                if annotations:
                    # tags applied in reverse order (annot.c:229)
                    for tag in reversed(rule.tags):
                        for k, v in (annotations.get(tag) or {}).items():
                            event[k] = v
            return rule, event, state.parsed_to
    return None, {"originalmsg": text, "unparsed-data": text[state.parsed_to :]}, state.parsed_to
