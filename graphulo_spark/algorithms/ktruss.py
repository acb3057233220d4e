"""k-truss subgraph — iterate support filter to fixpoint.

Graphulo kTrussAdj (Graphulo.java:2109-2214): loop { A2 = A^T·A (noDiag);
filter support < k−2 (MinMaxFilter); A = A2 ⊙ A } until nnz fixpoint.
The Fused/Smart variants (Graphulo.java:2294-2428, 2491-2633) exist only to
cram membership+support into one Accumulo value via parity tricks — in Spark
the two are just columns, and the loop is the plain recurrence.

Golden parity (AlgorithmTest.java:129,173): 5-vertex fixture 3-truss has
nnz=10 (5 undirected edges), 4-truss after adding v2-v4 has nnz=12.
"""

from __future__ import annotations

from contextlib import nullcontext
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphulo_spark.materialize import materialize
from graphulo_spark.algorithms.triangles import edge_support
from graphulo_spark.checkpoint import SuperstepCheckpointer
from graphulo_spark.linalg.edges import canonicalize


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    watch: Any | None = None,
) -> DataFrame:
    """Canonical (src<dst) edges of the k-truss: every surviving edge is in
    ≥ k−2 triangles of the surviving subgraph. Fixpoint on edge count."""
    params = {"alg": "ktruss", "k": k}
    ckpt = SuperstepCheckpointer(spark, checkpoint_dir, params) if checkpoint_dir else None

    span = watch.span if watch is not None else (lambda _name: nullcontext())
    cur = canonicalize(edges).select("src", "dst")
    cur = ckpt.save(0, cur) if ckpt else cur.transform(materialize)
    n = cur.count()

    for step in range(1, max_iter + 1):
        # registry: support caches die with the iteration (the loop would
        # otherwise accrete 3 cached tables per round in executor storage)
        caches: list[DataFrame] = []
        kept = (
            edge_support(cur.withColumn("w", F.lit(1.0)), _cache_registry=caches)
            .filter(F.col("support") >= k - 2)
            .select("src", "dst")
        )
        with span("support_filter"):
            kept = ckpt.save(step, kept) if ckpt else kept.transform(materialize)
        for c in caches:
            c.unpersist()
        if watch is not None:
            watch.increment("iterations")
        with span("fixpoint_test"):
            m = kept.count()
        cur = kept
        if m == n:
            break
        n = m

    return cur


def ktruss_edge(
    spark: SparkSession,
    incidence: DataFrame,
    k: int,
    *,
    max_iter: int = 100,
) -> DataFrame:
    """kTrussEdge (Graphulo.java:3248-3379): the k-truss fixpoint run with the
    state RESIDENT IN THE INCIDENCE ENCODING — the loop filters incidence rows
    by surviving edge ids each iteration (the reference keeps its E table and
    deletes weak edge rows), reconstructing the adjacency view only to score
    support. Returns the surviving incidence rows [edge_id, end, v].

    Equality with the adjacency-path ktruss() is asserted in tests — the
    reference's own cross-implementation check (TriangleCountExample.java
    pattern, AlgorithmTest.java:236-409).
    """
    cur = incidence.select("edge_id", "end", "v").transform(materialize)
    n = cur.select("edge_id").distinct().count()

    for _ in range(1, max_iter + 1):
        # endpoints per surviving edge row, support scored in canonical space
        ends = (
            cur.filter(F.col("end") == "out")
            .select("edge_id", F.col("v").alias("_u"))
            .join(cur.filter(F.col("end") == "in").select("edge_id", F.col("v").alias("_v")), "edge_id")
            .select(
                "edge_id",
                F.least("_u", "_v").alias("src"),
                F.greatest("_u", "_v").alias("dst"),
            )
        )
        caches: list[DataFrame] = []
        sup_ok = (
            edge_support(canonicalize(ends.withColumn("w", F.lit(1.0))), _cache_registry=caches)
            .filter(F.col("support") >= k - 2)
            .select("src", "dst")
        )
        keep_ids = ends.join(sup_ok, ["src", "dst"], "left_semi").select("edge_id")
        kept = cur.join(keep_ids, "edge_id", "left_semi").transform(materialize)
        for c in caches:
            c.unpersist()
        m = kept.select("edge_id").distinct().count()
        cur = kept
        if m == n:
            break
        n = m

    return cur
