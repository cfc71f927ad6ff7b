"""Parse Catalyst plan text for unpartitioned window specs.

Catalyst prints a window spec as ``windowspecdefinition(partExprs...,
sortExprs..., specifiedwindowframe(...))``; sort expressions carry
' ASC ' / ' DESC ', partition expressions never do. An EMPTY partition
spec — the first non-frame arg is a sort expr, or there are no non-frame
args at all (an ``over ()`` whole-frame window) — plans as
``Exchange SinglePartition`` + one task sorting the entire input: the
one plan shape that cannot survive 100 TB fact cardinality. One parser,
imported by both the CI gate and the scout script, so a Catalyst
print-format change is fixed in exactly one place (review r11).
"""

from __future__ import annotations


def split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def unpartitioned_specs(plan: str) -> list[str]:
    """Arg-strings of every windowspecdefinition with NO partition exprs."""
    hits: list[str] = []
    needle = "windowspecdefinition("
    i = 0
    while True:
        i = plan.find(needle, i)
        if i < 0:
            break
        start = i + len(needle)
        depth, j = 1, start
        while j < len(plan) and depth:
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        args = [
            a
            for a in split_top_level(plan[start : j - 1])
            if not a.startswith("specifiedwindowframe(")
        ]
        if not args or (" ASC " in args[0] or " DESC " in args[0]):
            hits.append(", ".join(args)[:120])
        i = j
    return hits
