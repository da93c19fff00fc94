"""The routing rulebase for the north-rule pipeline (FIXTURES.md §2 shape),
aligned with the deterministic pages synthesis in pages.py.

Exercises: literal rules, prefixes (date-rfc3164 + word + char-to), tags as
routing keys, annotations, and the motif set (number, word, ipv4,
v2-iptables, name-value-list, json, mac48, duration, rest).
Derived from reference examples: doc/configuration.rst:1276-1284 (sshd),
rulebases/messages.rulebase:1-7 (prefix pattern)."""

ROUTING_RULEBASE = r"""version=2
rule=ssh,login,fail:sshd[%pid:number%]: Invalid user %user:word% from %src_ip:ipv4%
prefix=%date:date-rfc3164% %host:word% %tag:char-to:\x3a%:
rule=ftp,close: FTP session closed
rule=ident,err: Bad line received from identity server at %ip:ipv4%: %port:number%
prefix=
rule=fw,deny:iptables denied: %fields:v2-iptables%
rule=kv:%fields:name-value-list%
rule=json,event:%payload:json%
rule=net,dev:dev %mac:mac48% up %dur:duration%
annotate=fail:+severity="high"
annotate=deny:+action="blocked"
"""

FALLBACK_RULE = "rule=fallback:%msg:rest%\n"


def routing_rulebase(with_fallback: bool = True) -> str:
    return ROUTING_RULEBASE + (FALLBACK_RULE if with_fallback else "")
