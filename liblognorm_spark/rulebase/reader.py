"""Rulebase logical-line reader.

Reimplements the reference reader semantics (reference: src/samp.c:1002-1051
``ln_sampRead`` and src/samp.c:940-985 ``ln_sampChkRunawayRule``):

* ``#`` at start of a (logical) line starts a comment that runs to EOL.
* A ``%`` toggles "inside parser definition" state; a newline inside a
  parser definition does NOT finish the logical line (multi-line rules).
* While inside a parser definition, a physical line starting with
  ``rule=`` indicates a runaway rule (unmatched ``%``): the previous rule
  is dropped with an error and reading restarts at the ``rule=`` line.
* Logical lines are capped at 64 KiB.
* A last line without a trailing LF is still processed
  (tests/missing_line_ending.sh).
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_LINE = 64 * 1024


@dataclass
class ReaderResult:
    lines: list[tuple[str, int]] = field(default_factory=list)  # (text, lineno)
    errors: list[str] = field(default_factory=list)


def read_logical_lines(text: str) -> ReaderResult:
    """Split rulebase text into logical lines with %-aware continuation."""
    res = ReaderResult()
    n = len(text)
    pos = 0
    lineno = 1  # 1-based line number of current physical line
    buf: list[str] = []
    start_lineno = 1
    in_parser = False
    in_comment = False

    def flush(cur_lineno: int) -> None:
        nonlocal buf, in_parser
        if buf:
            line = "".join(buf)
            if len(line) >= MAX_LINE:
                res.errors.append(f"line {start_lineno}: line is too long")
            else:
                res.lines.append((line, cur_lineno))
        buf = []
        in_parser = False

    while pos < n:
        c = text[pos]
        pos += 1
        if in_comment:
            if c == "\n":
                in_comment = False
                lineno += 1
                if not in_parser and buf:
                    flush(lineno - 1)
            continue
        if c == "\n":
            lineno += 1
            if in_parser:
                # look ahead: does the next non-comment, non-empty physical
                # line start with "rule="?  -> runaway rule, drop current buf
                la = pos
                while la < n:
                    if text[la] == "\n":
                        la += 1
                        continue
                    if text[la] == "#":
                        nl = text.find("\n", la)
                        la = n if nl < 0 else nl + 1
                        continue
                    break
                if text[la : la + 5] == "rule=":
                    res.errors.append(
                        f"line {lineno - 1}: line has 'rule=' at begin of line, "
                        "which does look like a typo in the previous lines "
                        "(unmatched % character) and is forbidden. Rule ignored."
                    )
                    buf = []
                    in_parser = False
                continue
            if buf:
                flush(lineno - 1)
        elif c == "#" and not buf:
            in_comment = True
        else:
            if c == "%":
                in_parser = not in_parser
            if not buf:
                start_lineno = lineno
            buf.append(c)
    if buf:  # missing line ending on last line: still process it
        flush(lineno)
    return res
