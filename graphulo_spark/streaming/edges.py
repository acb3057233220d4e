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


def stream_induce_edges_stateful(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    idle_timeout_ms: int | None = None,
    max_files_per_trigger: int = 16,
    trigger_available_now: bool = True,
):
    """Cross-micro-batch edge induction via applyInPandasWithState.

    ``stream_induce_edges`` derives edges per micro-batch, so a conversation
    split across batches silently loses the edge linking its boundary turns.
    This variant keeps per-conversation state — the last (turn_idx, entity)
    seen — so the first turn of a later batch links back to the last turn of
    an earlier one: streaming output == batch ``induce_edges`` regardless of
    how conversations are chopped (pinned by test against the batch path).

    Scale shape: state is O(active conversations) × ~2 small fields, hash-
    partitioned by conv_id (Spark's streaming state store — RocksDB-backed on
    real clusters). ``idle_timeout_ms`` expires conversations idle longer
    than that of *processing* time — mandatory at 10^12-turn scale, where
    unexpired state would grow with every conversation ever seen; None keeps
    state forever (tests / bounded replays).

    Emits CONSECUTIVE-turn edges only: participant edges (conv → entity)
    carry no cross-turn state, so they stay a stateless projection of the
    stream (union them downstream when wanted).

    Assumes turns of a conversation arrive in turn_idx order across batches
    (the input's stable-(conv_id, turn_idx) premise); a violation (a batch
    whose smallest turn_idx is <= the state's last seen turn_idx) raises
    instead of silently emitting wrong boundary edges — the premise failing
    means the upstream file ordering broke, and a loud task failure beats a
    corrupted edge table. Within a batch any order is fine (sorted here).
    Emits entity-STRING pairs; callers resolve vertex ids with the same
    xxhash64 the batch path uses (keeping the hash JVM-side — the Python
    worker never needs to reimplement it).
    """
    import pandas as pd  # locals — the stateful func ships to Python workers

    def _induce(key, pdfs, state):
        conv_id = key[0]
        chunks = [p[["turn_idx", "role", "tool"]] for p in pdfs]
        if state.hasTimedOut:
            state.remove()
            return
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("turn_idx")
        if not len(pdf):
            return
        ent = pdf["role"].where(pdf["tool"].isna(), pdf["role"] + "/" + pdf["tool"])
        prev_idx = prev_ent = None
        if state.exists:
            prev_idx, prev_ent = state.get
        first_idx = int(pdf["turn_idx"].iloc[0])
        if prev_idx is not None and first_idx <= prev_idx:
            raise ValueError(
                f"out-of-order turns for conv {conv_id!r}: batch starts at "
                f"turn_idx {first_idx} but state already saw {prev_idx} — "
                "the stable-(conv_id, turn_idx) arrival premise is violated"
            )
        # edge pairing is exactly a lag: src = previous turn's entity. The
        # state's last entity seeds the first row (the cross-batch boundary
        # edge); the conversation's very first turn has no predecessor and
        # its NaN src row is dropped.
        src = ent.shift(1)
        if prev_ent is not None:
            src.iloc[0] = prev_ent
        state.update((int(pdf["turn_idx"].iloc[-1]), ent.iloc[-1]))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        out = pd.DataFrame({"conv_id": conv_id, "src_ent": src, "dst_ent": ent})
        out = out[out["src_ent"].notna()]
        if len(out):
            yield out

    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(TURN_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    edges = stream.groupBy("conv_id").applyInPandasWithState(
        _induce,
        outputStructType="conv_id string, src_ent string, dst_ent string",
        stateStructType="last_idx int, last_ent string",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    writer = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def resolve_edge_entities(edge_pairs: DataFrame) -> DataFrame:
    """Entity-string pairs → the batch path's id space: [src, dst, w] with
    src/dst = xxhash64(entity), w = pair count, self-loops dropped (the same
    finalization as transcripts.induce_edges)."""
    return (
        edge_pairs.select(
            F.xxhash64("src_ent").alias("src"), F.xxhash64("dst_ent").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
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
