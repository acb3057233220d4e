"""SpGEMM — C = A^T ⊕.⊗ B as join + aggregate.

Graphulo TableMult (Graphulo.java:316-422): streaming sort-merge of AT and B
on the shared dimension, Cartesian product of matched rows through MultiplyOp,
lazy plus-combiner on C. Spark restatement (SURVEY.md §3.1 step 2-7):

    A.join(B, A.dst/src == B.src).groupBy(i, j).agg(plus(wA ⊗ wB))

Catalyst picks the join strategy; the aggregate does map-side partial ⊕.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spgemm(
    a: DataFrame,
    b: DataFrame,
    *,
    transpose_a: bool = True,
    plus: str = "sum",
    times: str = "mul",
    drop_zeros: bool = True,
    row_filter=None,
    col_filter=None,
) -> DataFrame:
    """C(i,j) = ⊕_k A(k,i) ⊗ B(k,j)   (transpose_a=True, Graphulo's contract:
    TableMult takes AT, i.e. contraction over the *row* of both tables —
    Graphulo.java:296-314 "Requires transpose table AT instead of A").

    With transpose_a=False computes the usual C(i,j) = ⊕_k A(i,k) B(k,j).

    row_filter / col_filter: optional Column predicates applied to the output
    i / j — Graphulo's rowFilter/colFilter options pushed into the plan
    (util/GraphuloUtil.java:157-216); Catalyst pushes them below the join.
    """
    if transpose_a:
        at = a.select(F.col("src").alias("_k"), F.col("dst").alias("i"), F.col("w").alias("_wa"))
    else:
        at = a.select(F.col("dst").alias("_k"), F.col("src").alias("i"), F.col("w").alias("_wa"))
    bt = b.select(F.col("src").alias("_kb"), F.col("dst").alias("j"), F.col("w").alias("_wb"))

    prod = {
        "mul": F.col("_wa") * F.col("_wb"),
        "add": F.col("_wa") + F.col("_wb"),
        "min": F.least("_wa", "_wb"),
        "max": F.greatest("_wa", "_wb"),
        "left": F.col("_wa"),
        "one": F.lit(1.0),
    }[times]

    joined = at.join(bt, at["_k"] == bt["_kb"], "inner").select("i", "j", prod.alias("_p"))
    if row_filter is not None:
        joined = joined.filter(row_filter)
    if col_filter is not None:
        joined = joined.filter(col_filter)

    agg = {"sum": F.sum, "min": F.min, "max": F.max, "count": lambda c: F.count(c).cast("double")}[plus]
    out = (
        joined.groupBy(F.col("i").alias("src"), F.col("j").alias("dst"))
        .agg(agg("_p").alias("w"))
    )
    if drop_zeros:
        out = out.filter(F.col("w") != 0.0)
    return out
