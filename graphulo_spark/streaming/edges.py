"""Structured-Streaming ingestion of transcript turns into the edge table.

The reference has no streaming (README.md:530-534 — batch/queued analytics
only); its closest analogues are lazy result-table combiners (eventual
aggregation) and RemoteWriteIterator's numEntriesCheckpoint monitoring
entries. This module supplies the capability the reference lacks, in the
engine's own terms: a stream of transcript turns becomes a continuously
maintained edge table.

Design:
- source: files (parquet/json) appearing under a directory — the
  Iceberg-commit-stream stand-in this sandbox supports.
- edge induction per micro-batch is the SAME lag-window derivation as batch
  (transcripts.induce_edges) applied inside foreachBatch, so streaming and
  batch semantics agree by construction when conversations arrive whole.
- late data: watermark on ts bounds state for the windowed-count variant.
- sink: parquet upsert of (src, dst, w) partial counts; readers sum partials
  (the lazy ⊕-combiner discipline: writes are partial sums, the aggregate is
  finalized at read — exactly Graphulo's scan-time combiner semantics,
  Graphulo.java:144-149).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphulo_spark.transcripts.edges import induce_edges

TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_induce_edges(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
):
    """File-stream of transcript turns → per-micro-batch edge partials in
    parquet. Returns the StreamingQuery. Readers finalize with
    ``read_edge_partials``."""
    stream = (
        spark.readStream.schema(TURN_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def _batch(df: DataFrame, batch_id: int) -> None:
        edges = induce_edges(df)
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = stream.writeStream.foreachBatch(_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_edge_partials(spark: SparkSession, output_dir: str) -> DataFrame:
    """Finalize the lazy ⊕: sum the per-batch partial counts."""
    return (
        spark.read.parquet(output_dir)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )


def stream_edge_counts(
    spark: SparkSession,
    input_dir: str,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed per-entity turn counts with late-data bound — the watermarked
    aggregation shape for monitoring hot entities as data streams in.
    Returns an unstarted streaming DataFrame (caller picks the sink)."""
    stream = spark.readStream.schema(TURN_SCHEMA).parquet(input_dir)
    ent = F.when(F.col("tool").isNull(), F.col("role")).otherwise(
        F.concat(F.col("role"), F.lit("/"), F.col("tool"))
    )
    return (
        stream.withColumn("entity", ent)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "entity")
        .agg(F.count("*").alias("n_turns"))
    )
