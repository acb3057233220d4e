"""Transcript → link-graph edge induction (FIXTURES.md §2).

Edges are induced by conv_id/role/tool co-occurrence across turns, all with
JVM-side window + hash expressions (no Python row path):

- a turn's **entity** is ``role`` when ``tool`` is null else ``role || "/" || tool``;
- within each conversation (ordered by ``turn_idx`` — the stable ordering key),
  consecutive turns link their entities (lag window);
- every turn also links the conversation-participant vertex
  (``"conv:" || conv_id``) to the turn's entity;
- vertex id = xxhash64(entity string); w = co-occurrence count.

Per-turn text equality under stable (conv_id, turn_idx) ordering is the
row-level invariant: induction only *reads* transcripts — tests pin that the
source rows are bit-identical before and after deriving edges.

Graphulo analog: the incidence/single-table schemas pack edge endpoints into
string keys with separators (SingleTransposeIterator.java:22-28,
prependStartPrefix Graphulo.java:1645-1690); here the packing is transient
string surgery resolved to 64-bit ids before any join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def entity_expr() -> Column:
    return F.when(F.col("tool").isNull(), F.col("role")).otherwise(
        F.concat(F.col("role"), F.lit("/"), F.col("tool"))
    )


def induce_edges(transcripts: DataFrame, include_participant: bool = True) -> DataFrame:
    """DataFrame[src: long, dst: long, w: double] (directed, deduped+counted;
    self-loops dropped). Pass through ``linalg.canonicalize`` for undirected."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.withColumn("_ent", entity_expr()).withColumn("_prev", F.lag("_ent").over(w))

    consecutive = t.filter(F.col("_prev").isNotNull()).select(
        F.xxhash64("_prev").alias("src"), F.xxhash64("_ent").alias("dst")
    )
    parts = [consecutive]
    if include_participant:
        participant = t.select(
            F.xxhash64(F.concat(F.lit("conv:"), F.col("conv_id"))).alias("src"),
            F.xxhash64("_ent").alias("dst"),
        )
        parts.append(participant)

    all_edges = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return (
        all_edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )


def vertex_labels(transcripts: DataFrame, include_participant: bool = True) -> DataFrame:
    """Debug/reporting map DataFrame[v: long, entity: string]."""
    ents = transcripts.select(entity_expr().alias("entity"))
    if include_participant:
        ents = ents.unionByName(
            transcripts.select(F.concat(F.lit("conv:"), F.col("conv_id")).alias("entity"))
        )
    ents = ents.distinct()
    return ents.select(F.xxhash64("entity").alias("v"), "entity")
