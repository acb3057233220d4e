"""Top-k per group (Graphulo TopColPerRowIterator, skvi/TopColPerRowIterator.java:24-182)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_row(edges: DataFrame, k: int, by: str = "src", order: str = "w") -> DataFrame:
    """Keep the k largest-``order`` entries per ``by`` group; deterministic
    tie-break on dst so results are stable (and oracle-comparable)."""
    w = Window.partitionBy(by).orderBy(F.col(order).desc(), F.col("dst").asc())
    return (
        edges.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
