"""Predicates / projections from Graphulo's filter-iterator family.

All are single Catalyst filter expressions — predicate pushdown and column
pruning reach the parquet scan for free (SURVEY.md §4 rows 1-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constant — used for a *portable* deterministic
# pseudo-random stream that DuckDB oracles can reproduce with plain integer
# arithmetic (xxhash64 exists only on the Spark side).
_KNUTH = 2654435761


def triangular_filter(edges: DataFrame, mode: str = "upper") -> DataFrame:
    """Keep Upper / Lower / Diagonal / NoDiagonal part by src-vs-dst compare
    (skvi/TriangularFilter.java:14-82)."""
    preds = {
        "upper": F.col("src") < F.col("dst"),
        "upper_diag": F.col("src") <= F.col("dst"),
        "lower": F.col("src") > F.col("dst"),
        "lower_diag": F.col("src") >= F.col("dst"),
        "diag": F.col("src") == F.col("dst"),
        "no_diag": F.col("src") != F.col("dst"),
    }
    return edges.filter(preds[mode])


def minmax_filter(df: DataFrame, col: str = "w", lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Keep entries with lo <= value <= hi (skvi/MinMaxFilter.java:26-186)."""
    out = df
    if lo is not None:
        out = out.filter(F.col(col) >= lo)
    if hi is not None:
        out = out.filter(F.col(col) <= hi)
    return out


def row_degree_filter(
    edges: DataFrame,
    min_degree: int | None = None,
    max_degree: int | None = None,
    by: str = "src",
) -> DataFrame:
    """Suppress rows (vertices) with < min or > max entries
    (skvi/SmallLargeRowFilter.java:26-314). Window count per key, no second
    pass over the data."""
    w = Window.partitionBy(by)
    out = edges.withColumn("_deg", F.count("*").over(w))
    if min_degree is not None:
        out = out.filter(F.col("_deg") >= min_degree)
    if max_degree is not None:
        out = out.filter(F.col("_deg") <= max_degree)
    return out.drop("_deg")


def stratified_sample(
    df: DataFrame, group_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """At most ``k`` rows per group, picked by a deterministic portable hash
    of the integer key — the per-stratum cap a training-data curation pass
    uses to balance sources/languages without a global sort.

    Rank = row_number over (group, hash(key) asc, key asc): one shuffle on
    the group key, per-partition top-k via WindowGroupLimit (no full
    per-group sort materializes), zero RNG state — a SQL oracle reproduces
    the exact row set. The key is pre-reduced mod 2^31-1 so the Knuth product
    stays in int64 in engines that trap overflow (DuckDB).

    The key must be non-null: a NULL key would hash NULL, sort before every
    real hash (Spark nulls-first asc) with a NULL tie-break, and claim the
    group's slots non-deterministically — so NULLs refuse loudly instead
    (non-castable strings already trap at the ANSI cast).

    PRECONDITION (ADVICE r5): ``key_col`` must be unique within each group —
    duplicate key values tie fully in (hash, key), so row_number would pick
    among otherwise-different rows by physical order, which varies across
    runs/plans. Pass a row-unique id (doc id, event id), not a payload
    column."""
    key = F.col(key_col).cast("long")
    checked = F.when(
        key.isNull(),
        F.raise_error(
            F.lit(f"stratified_sample: {key_col} must be a non-null integer key")
        ),
    ).otherwise(key)
    h = F.pmod(
        F.pmod(checked, F.lit(2147483647)) * F.lit(_KNUTH),
        F.lit(1000000007),
    )
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def bernoulli_sample(df: DataFrame, key_col: str, percent: int) -> DataFrame:
    """Deterministic ~percent% sample by multiplicative hash of an integer key
    (skvi/SamplingFilter.java:17-73 hashes the row; here the hash is portable
    arithmetic so a SQL oracle reproduces the exact row set)."""
    bucket = F.pmod(F.col(key_col).cast("long") * F.lit(_KNUTH), F.lit(100))
    return df.filter(bucket < percent)
