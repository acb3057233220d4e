"""Connected components — exact, by min-label propagation.

This is the reference's "connected components" capability (SCCGraphulo.java:
56-159 computes components by iterated SpGEMM R_{k+1} = R_k·A; SURVEY.md §2.1
SCC row). Spark restatement: label(v) ← min(label(v), min_{u~v} label(u))
over the symmetrized edge table until fixpoint — each step one join + one
groupBy(min), i.e. an SpMV over the (min, select) semiring. Labels stay LONG
end-to-end (vertex ids are 64-bit hashes; doubles would lose exactness).

Final label of every vertex == the minimum vertex id in its component —
a canonical, deterministic assignment ("exact" per the north rule).

Converges in ≤ diameter steps. For the transcript-derived link graphs this
engine targets, hub entities (role/tool vertices) make diameters tiny; for
long-chain graphs switch to the large-star/small-star variant (round 2+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphulo_spark.checkpoint import SuperstepCheckpointer
from graphulo_spark.linalg.edges import symmetrize


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    history: list | None = None,
) -> DataFrame:
    """Returns DataFrame[v: long, component: long] (component = min id)."""
    params = {"alg": "cc"}
    ckpt = SuperstepCheckpointer(spark, checkpoint_dir, params) if checkpoint_dir else None

    sym = symmetrize(edges.select("src", "dst", F.lit(1.0).alias("w")), combine="min")
    sym = sym.select("src", "dst")
    if ckpt:
        import os

        sym_path = f"{ckpt.run_dir}/sym_edges"
        if not (resume and os.path.exists(sym_path)):
            sym.write.mode("overwrite").parquet(sym_path)
        sym = spark.read.parquet(sym_path)
    else:
        sym = sym.cache()

    vertices = sym.select(F.col("src").alias("v")).distinct()

    start_step = 0
    labels = None
    if ckpt and resume:
        latest = ckpt.latest_step()
        if latest is not None:
            start_step = latest
            labels = ckpt.load(latest)
    if labels is None:
        labels = vertices.select("v", F.col("v").alias("label"))
        if ckpt:
            labels = ckpt.save(0, labels)
        else:
            labels = labels.localCheckpoint()

    for step in range(start_step + 1, max_iter + 1):
        nbr_min = (
            sym.join(labels.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("label").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select("v", F.least(F.col("label"), F.coalesce("_nbr", F.col("label"))).alias("label"))
        )
        if ckpt:
            new_labels = ckpt.save(step, new_labels)
        else:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.withColumnRenamed("label", "_ln")
            .join(labels.withColumnRenamed("label", "_lo"), "v")
            .filter(F.col("_ln") != F.col("_lo"))
            .count()
        )
        if history is not None:
            history.append({"step": step, "changed": changed})
        labels = new_labels
        if changed == 0:
            break

    return labels.withColumnRenamed("label", "component")
