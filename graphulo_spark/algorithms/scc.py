"""Strongly connected components on a directed edge table.

Reference: SCCGraphulo.java:56-159 computes SCCs by repeated matrix squaring
R_{k+1} = R_k·A (k < rowCount) then R ⊙ R^T — O(n) SpGEMMs over a reachability
table that can be quadratically dense. The Spark-first restatement is the
coloring algorithm (forward min-label coloring + backward marking), whose
supersteps are the same join+groupBy SpMV shape as everything else here and
whose state stays O(|V|):

repeat until no vertices remain:
  1. forward coloring: color(v) ← min(v, colors of in-neighbors) to fixpoint
     (only over still-unassigned vertices);
  2. every color's root r (color(r)=r) anchors one SCC: the vertices with
     color c that can reach r=c along edges within color c — found by
     backward marking from the roots;
  3. marked vertices get SCC id = their color; remove them.

Exact: a root's forward set is its color class, backward-within-color set is
its SCC. Worst case O(longest path) outer rounds (like the reference's O(n)
squarings); power-law graphs finish in a few rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scc(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_outer: int = 50,
    max_inner: int = 100,
) -> DataFrame:
    """Returns DataFrame[v: long, scc: long]; scc = min vertex id in the SCC
    (deterministic canonical assignment, like cc's min-label components)."""
    e_all = edges.select("src", "dst").distinct().localCheckpoint()
    remaining = (
        e_all.select(F.col("src").alias("v"))
        .unionByName(e_all.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    assigned = None

    for _ in range(max_outer):
        if remaining.isEmpty():
            break
        # edges restricted to unassigned vertices
        e = (
            e_all.join(remaining.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        # 1) forward min-label coloring to fixpoint
        colors = remaining.select("v", F.col("v").alias("color")).localCheckpoint()
        for _i in range(max_inner):
            nbr = (
                e.join(colors.withColumnRenamed("v", "src"), "src")
                .groupBy(F.col("dst").alias("v"))
                .agg(F.min("color").alias("_nc"))
            )
            new_colors = (
                colors.join(nbr, "v", "left")
                .select("v", F.least("color", F.coalesce("_nc", F.col("color"))).alias("color"))
                .localCheckpoint()
            )
            changed = (
                new_colors.withColumnRenamed("color", "_n")
                .join(colors.withColumnRenamed("color", "_o"), "v")
                .filter(F.col("_n") != F.col("_o"))
                .count()
            )
            colors = new_colors
            if changed == 0:
                break

        # 2) backward marking from roots within each color class
        ec = (
            e.join(colors.withColumnRenamed("v", "src").withColumnRenamed("color", "c_src"), "src")
            .join(colors.withColumnRenamed("v", "dst").withColumnRenamed("color", "c_dst"), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst", F.col("c_src").alias("color"))
            .localCheckpoint()
        )
        marked = colors.filter(F.col("v") == F.col("color")).select("v", "color").localCheckpoint()
        for _i in range(max_inner):
            newly = (
                ec.join(marked.withColumnRenamed("v", "dst").drop("color"), "dst", "left_semi")
                .select(F.col("src").alias("v"), "color")
                .distinct()
                .join(marked, "v", "left_anti")
                .localCheckpoint()
            )
            if newly.isEmpty():
                break
            marked = marked.unionByName(newly).localCheckpoint()

        batch = marked.select("v", F.col("color").alias("scc"))
        assigned = batch if assigned is None else assigned.unionByName(batch)
        assigned = assigned.localCheckpoint()
        remaining = remaining.join(marked.select("v"), "v", "left_anti").localCheckpoint()

    if assigned is None:
        return remaining.select("v", F.col("v").alias("scc"))
    if not remaining.isEmpty():  # max_outer exhausted: leftover singletons
        assigned = assigned.unionByName(remaining.select("v", F.col("v").alias("scc")))
    return assigned
