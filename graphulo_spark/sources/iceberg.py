"""Transcript table source — Iceberg catalog tables first, parquet fallback.

The production input (BASELINE.json north rule / input_hint) is an Iceberg
table of multi-turn conversation transcripts with columns (conv_id: string,
turn_idx: int32, role: string, text: string, tool: string, ts: timestamp).
Iceberg matters at 10^12 turns for three engine-relevant reasons, all of
which this engine exploits declaratively rather than re-implementing:

- **Hidden partitioning** (e.g. ``bucket(N, conv_id)`` + ``days(ts)``): scan
  pruning happens in the table-format metadata before Spark plans the scan,
  so conversation-sliced and time-sliced queries never enumerate 10^12 rows
  of file listings. The engine adds no partitioning code — the same
  ``load_transcripts`` call scales from one parquet file to a bucketed
  petabyte table.
- **Snapshot isolation**: an iterative loop (PageRank supersteps over edges
  induced from the table) must read ONE table version throughout, and a
  resumed run must read the SAME version. ``current_snapshot_id`` feeds the
  checkpoint input fingerprint, so resume-after-table-commit refuses loudly
  (the checkpoint.py changed-input discipline) instead of silently mixing
  versions.
- **Metadata tables** (``<table>.snapshots``): the fingerprint comes from
  catalog metadata, not a data scan.

This sandbox carries no Iceberg runtime jar, so catalog reads are gated at
the call: ``load_transcripts`` resolves ``source`` as a catalog table via
``spark.read.table`` when it is a table identifier (Iceberg or any
catalog-registered table — temp views exercise this path in tests), and as
a parquet path otherwise. Either way the result is validated and normalized
to exactly the contract schema (pruning extra columns — column pruning to
the 6 contract columns reaches the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the input_hint contract schema, in canonical column order
TRANSCRIPT_SCHEMA: dict[str, str] = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
}


def _is_path(source: str) -> bool:
    """Paths contain '/' or a URI scheme; bare dotted names are catalog
    table identifiers."""
    return "/" in source or "://" in source or source.endswith(".parquet")


def _normalize(df: DataFrame, source: str) -> DataFrame:
    missing = [c for c in TRANSCRIPT_SCHEMA if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source {source!r} is missing contract columns {missing}; "
            f"expected {list(TRANSCRIPT_SCHEMA)}"
        )
    return df.select(*[F.col(c).cast(t).alias(c) for c, t in TRANSCRIPT_SCHEMA.items()])


def load_transcripts(
    spark: SparkSession,
    source: str,
    *,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Load a transcript table from an Iceberg catalog table or parquet path.

    ``source``: a catalog table identifier (``catalog.db.transcripts``) or a
    parquet path. ``snapshot_id`` / ``as_of_ms`` pin an Iceberg table
    version (Iceberg read options ``snapshot-id`` / ``as-of-timestamp``) —
    they are meaningless for bare parquet and refused there, because a
    caller that asks for version pinning and silently gets an unpinned read
    would violate the resume discipline.

    Returns the contract columns only, contract-typed, in canonical order —
    so every downstream operator (edge induction, streaming, dedup over
    ``text``) sees one schema regardless of the physical source.
    """
    if _is_path(source):
        if snapshot_id is not None or as_of_ms is not None:
            raise ValueError(
                "snapshot pinning requires an Iceberg catalog table; "
                f"{source!r} is a plain parquet path"
            )
        df = spark.read.parquet(source)
    else:
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_ms))
        df = reader.table(source)
    return _normalize(df, source)


def transcripts_fingerprint(spark: SparkSession, source: str) -> str | None:
    """Cheap input fingerprint for checkpoint manifests: the Iceberg CURRENT
    snapshot id — from the ``.history`` metadata table, not ``.snapshots``.
    ``.snapshots`` lists every unexpired snapshot, so after a rollback (or
    branch/cherry-pick) its MAX(committed_at) row is NOT the current table
    state and the resume discipline would track rolled-back data. ``.history``
    records ``made_current_at`` transitions including rollbacks, so its
    latest row IS the current snapshot. No data scan either way.
    Returns None for parquet paths or non-Iceberg tables; the caller then
    falls back to checkpoint.py's file-level fingerprint."""
    if _is_path(source):
        return None
    try:
        row = (
            spark.sql(
                f"SELECT snapshot_id FROM {source}.history "
                f"ORDER BY made_current_at DESC LIMIT 1"
            ).first()
        )
    except Exception:
        return None
    return f"iceberg-snapshot:{row[0]}" if row else None


def source_input_fp(
    spark: SparkSession, source: str, derived: DataFrame, *cols: str
) -> str:
    """Checkpoint ``input_fp`` for a table derived from ``source`` (e.g. the
    edge table induced from a transcript table): the Iceberg current-snapshot
    fingerprint when the source is a catalog table — catalog metadata only,
    zero data scan — else checkpoint.py's content fingerprint of the derived
    projection (one parallel pass).

    Pass the result as the ``input_fp`` of :func:`~graphulo_spark.algorithms.
    pagerank` / ``connected_components`` / ``label_propagation``: a resumed
    run against a table that committed a new snapshot then refuses from the
    snapshot id alone, before any superstep touches data. (Graphulo's analogue
    is the one-table-version scan its BatchScanner session pins,
    Graphulo.java:634-668; here snapshot isolation is the table format's job
    and the engine's job is refusing to mix versions across a resume.)"""
    fp = transcripts_fingerprint(spark, source)
    if fp is not None:
        return fp
    from graphulo_spark.checkpoint import input_fingerprint

    return input_fingerprint(derived, *cols)
