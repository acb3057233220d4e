"""Element-wise table ops and set-flavored joins.

Graphulo TwoTableIterator modes (skvi/TwoTableIterator.java:83-91 DOTMODE +
emitNoMatch flags, SURVEY.md §2.4):
- EWISE inner        → ewise_mult   (SpEWiseX, Graphulo.java:224-256)
- EWISE union-sum    → ewise_sum    (SpEWiseSum, Graphulo.java:258-294)
- NONE anti          → table_diff   (TwoTableNONE, Graphulo.java:546-566)
- ROW selector semi  → row_selector (TwoTableROWSelector, Graphulo.java:492-514)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewise_mult(a: DataFrame, b: DataFrame, times: str = "mul") -> DataFrame:
    """Hadamard product: match on (src,dst), ⊗ on collision only."""
    op = {
        "mul": F.col("a.w") * F.col("b.w"),
        "add": F.col("a.w") + F.col("b.w"),
        "min": F.least("a.w", "b.w"),
        "max": F.greatest("a.w", "b.w"),
    }[times]
    return (
        a.alias("a")
        .join(b.alias("b"), ["src", "dst"], "inner")
        .select("src", "dst", op.alias("w"))
    )


def ewise_sum(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of entries, ⊕=+ on collision (emitNoMatch=true both sides)."""
    return (
        a.unionByName(b)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )


def table_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Entries of A whose (src,dst) key is absent from B (NONE mode, A side)."""
    return a.join(b.select("src", "dst"), ["src", "dst"], "left_anti")


def row_selector(b: DataFrame, a: DataFrame) -> DataFrame:
    """Rows of B whose src appears as a src in A (SelectorRowMultiply.java:20-64)."""
    return b.join(a.select("src").distinct(), ["src"], "left_semi")
