"""Synchronous label propagation with deterministic tie-breaking.

Community-detection flavor of the reference's BFS/label machinery
(GatherReducer frontier collection, reducer/GatherReducer.java:14-84, run as a
loop). Update rule, applied synchronously to every vertex per superstep:

    label_{t+1}(v) = argmax_{l} Σ_{u~v, label_t(u)=l} w(u,v)
                     ties broken by the SMALLEST label

Deterministic by construction (SURVEY.md §7.3 "genuinely hard parts" (a)):
synchronous update + fixed tie-break ⇒ bit-identical assignments across runs
and cluster sizes, which is what makes "exact parity" testable. Fixed
iteration count (LPA can oscillate on bipartite structures). Numeric vertex
ids take the one-aggregate max_by argmax; string ids (entity graphs) keep a
sort-window argmax — same winner rule, see the superstep comment.
"""

from __future__ import annotations

from contextlib import nullcontext
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphulo_spark.materialize import materialize
from graphulo_spark.checkpoint import SuperstepCheckpointer, input_fingerprint
from graphulo_spark.linalg.edges import symmetrize


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    *,
    iters: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    watch: Any | None = None,
    input_fp: str | None = None,
) -> DataFrame:
    """Returns DataFrame[v: long, label: long] after ``iters`` supersteps.

    ``input_fp`` overrides the checkpoint input fingerprint (pass the
    Iceberg snapshot fingerprint for catalog-table-derived edges)."""
    ckpt = None
    if checkpoint_dir:
        # note: iters is NOT part of the params hash — resuming with a larger
        # iteration budget is a legitimate continuation (like pagerank max_iter)
        params = {
            "alg": "lp",
            "input_fp": input_fp or input_fingerprint(edges, "src", "dst", "w"),
        }
        ckpt = SuperstepCheckpointer(spark, checkpoint_dir, params)
        ckpt.prepare(resume)

    sym = symmetrize(edges, combine="sum")
    if ckpt:
        sym = ckpt.side_input("sym_edges", sym, resume=resume)
    # static big side of every round's vote join: partition by the join key
    # once so rounds shuffle only the O(|V|) label table (see pagerank)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = sym.repartition(n_parts, "src").cache()

    span = watch.span if watch is not None else (lambda _name: nullcontext())
    vertices = sym.select(F.col("src").alias("v")).distinct()
    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(vertices.schema["v"].dataType, NumericType)

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
            labels = labels.transform(materialize)

    for step in range(start_step + 1, iters + 1):
        votes = (
            sym.join(labels.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"), "label")
            .agg(F.sum("w").alias("_wt"))
        )
        # argmax by (weight desc, label asc) as ONE aggregate: max over the
        # struct (_wt, -label) picks the heaviest vote, smallest label on
        # ties — map-side partial combine, no per-vertex sort window. And on
        # a symmetrized edge-derived graph every vertex is some edge's dst,
        # so the winner table IS the complete new label table — the former
        # vertices-left-join-winner-left-join-old completion (two |V|-vs-|V|
        # joins per superstep) was provably dead weight.
        # String vertex ids have no cheap order inversion for the tie-break,
        # so they keep the sort-window argmax (entity graphs — small |V|).
        if numeric_ids:
            new_labels = votes.groupBy("v").agg(
                F.max_by(
                    "label", F.struct(F.col("_wt"), (-F.col("label")).alias("_nl"))
                ).alias("label")
            )
        else:
            from pyspark.sql import Window

            w_rank = Window.partitionBy("v").orderBy(
                F.col("_wt").desc(), F.col("label").asc()
            )
            new_labels = (
                votes.withColumn("_rk", F.row_number().over(w_rank))
                .filter(F.col("_rk") == 1)
                .select("v", "label")
            )
        with span("superstep"):
            new_labels = ckpt.save(step, new_labels) if ckpt else new_labels.transform(materialize)
        if watch is not None:
            watch.increment("supersteps")
        labels = new_labels

    return labels
