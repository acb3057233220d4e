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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
) -> DataFrame:
    """Canonical (src<dst) edges of the k-truss: every surviving edge is in
    ≥ k−2 triangles of the surviving subgraph. Fixpoint on edge count."""
    params = {"alg": "ktruss", "k": k}
    ckpt = SuperstepCheckpointer(spark, checkpoint_dir, params) if checkpoint_dir else None

    cur = canonicalize(edges).select("src", "dst")
    cur = ckpt.save(0, cur) if ckpt else cur.localCheckpoint()
    n = cur.count()

    for step in range(1, max_iter + 1):
        kept = (
            edge_support(cur.withColumn("w", F.lit(1.0)))
            .filter(F.col("support") >= k - 2)
            .select("src", "dst")
        )
        kept = ckpt.save(step, kept) if ckpt else kept.localCheckpoint()
        m = kept.count()
        cur = kept
        if m == n:
            break
        n = m

    return cur
