"""D4M range-string row filters.

Reference: util/GraphuloUtil.java:157-216 (d4mRowToRanges) parses Matlab-D4M
range strings — tokens separated by a trailing delimiter char, with `:`
marking ranges — into Accumulo seek ranges; the inverse is rangesToD4mRow
(round-trip pinned by UtilTest.java:140-432). Grammar (delimiter shown as ,):

    "a,"        → exactly row 'a'
    "a,:,b,"    → rows in [a, b]
    "a,:,"      → rows ≥ a
    ":,b,"      → rows ≤ b
    "a,b,c,"    → rows ∈ {a, b, c}
    mixtures    → union of the above, e.g. "a,:,b,g,x,:,"

Spark restatement: the ranges become one boolean Column; Catalyst pushes it
into the parquet scan (the seek-range pushdown, for free).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_d4m_ranges(spec: str, delimiter: str | None = None) -> list[tuple[str | None, str | None]]:
    """→ list of (lo, hi) inclusive bounds; None = unbounded; lo==hi = point.
    The delimiter is the string's last char unless given (D4M convention)."""
    if not spec:
        return []
    d = delimiter or spec[-1]
    if not spec.endswith(d):
        raise ValueError(f"D4M range string must end with its delimiter {d!r}: {spec!r}")
    toks = spec.split(d)[:-1]
    out: list[tuple[str | None, str | None]] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if t == ":":
            # leading ':' → everything up to next token (or everything)
            if nxt is None:
                out.append((None, None))
                i += 1
            else:
                out.append((None, nxt))
                i += 2
        elif nxt == ":":
            hi = toks[i + 2] if i + 2 < len(toks) else None
            out.append((t, hi))
            i += 3
        else:
            out.append((t, t))
            i += 1
    return out


def ranges_to_d4m(ranges: list[tuple[str | None, str | None]], delimiter: str = ",") -> str:
    """Inverse of parse_d4m_ranges (GraphuloUtil.rangesToD4mRow parity)."""
    parts: list[str] = []
    for lo, hi in ranges:
        if lo is None and hi is None:
            parts.append(":")
        elif lo is None:
            parts.extend([":", hi])
        elif hi is None:
            parts.extend([lo, ":"])
        elif lo == hi:
            parts.append(lo)
        else:
            parts.extend([lo, ":", hi])
    return delimiter.join(parts) + delimiter if parts else ""


def d4m_row_predicate(col: str | Column, spec: str, delimiter: str | None = None) -> Column:
    """D4M range string → one filter Column (pushdown-friendly disjunction)."""
    c = F.col(col) if isinstance(col, str) else col
    ranges = parse_d4m_ranges(spec, delimiter)
    if not ranges:
        return F.lit(False)
    pred: Column | None = None
    points = [lo for lo, hi in ranges if lo is not None and lo == hi]
    for lo, hi in ranges:
        if lo is not None and lo == hi:
            continue  # points handled as one isin below
        if lo is None and hi is None:
            term = F.lit(True)
        elif lo is None:
            term = c <= hi
        elif hi is None:
            term = c >= lo
        else:
            term = c.between(lo, hi)
        pred = term if pred is None else (pred | term)
    if points:
        term = c.isin(*points)
        pred = term if pred is None else (pred | term)
    return pred
