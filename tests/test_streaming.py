"""Streaming edge ingestion: streamed result == batch result on the same turns."""

from __future__ import annotations

import pytest

from graphulo_spark.streaming import stream_edge_counts, stream_induce_edges
from graphulo_spark.streaming.edges import (
    read_edge_partials,
    resolve_edge_entities,
    stream_induce_edges_stateful,
)
from graphulo_spark.transcripts import generate_transcripts, induce_edges


def test_stream_equals_batch(spark, tmp_path):
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    t = generate_transcripts(spark, 200)
    # arrival in conversation-complete chunks (3 file drops)
    for i in range(3):
        t.filter(f"pmod(xxhash64(conv_id), 3) = {i}").coalesce(1).write.mode("append").parquet(inp)

    q = stream_induce_edges(spark, inp, outp, ckpt)
    q.awaitTermination(240)

    got = {(r["src"], r["dst"]): r["w"] for r in read_edge_partials(spark, outp).collect()}
    want = {(r["src"], r["dst"]): r["w"] for r in induce_edges(t).collect()}
    assert got == want


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    t = generate_transcripts(spark, 120)
    t.filter("pmod(xxhash64(conv_id), 2) = 0").coalesce(1).write.mode("append").parquet(inp)
    q = stream_induce_edges(spark, inp, outp, ckpt)
    q.awaitTermination(240)
    # second wave of files; restart from the same checkpoint — no reprocessing
    t.filter("pmod(xxhash64(conv_id), 2) = 1").coalesce(1).write.mode("append").parquet(inp)
    q2 = stream_induce_edges(spark, inp, outp, ckpt)
    q2.awaitTermination(240)
    got = {(r["src"], r["dst"]): r["w"] for r in read_edge_partials(spark, outp).collect()}
    want = {(r["src"], r["dst"]): r["w"] for r in induce_edges(t).collect()}
    assert got == want


def test_stateful_stream_links_across_batches(spark, tmp_path):
    """A conversation chopped mid-way across micro-batches must still emit the
    boundary edge — the per-batch inducer can't; the stateful one must match
    batch induce_edges exactly (consecutive edges; participant edges are a
    stateless projection outside the operator)."""
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    t = generate_transcripts(spark, 40).cache()
    # chop EVERY conversation in half across two files → one batch each
    # (maxFilesPerTrigger=1): every conversation has a cross-batch boundary
    t.filter("turn_idx < 5").coalesce(1).write.mode("append").parquet(inp)
    t.filter("turn_idx >= 5").coalesce(1).write.mode("append").parquet(inp)

    q = stream_induce_edges_stateful(spark, inp, outp, ckpt, max_files_per_trigger=1)
    q.awaitTermination(240)

    got_df = resolve_edge_entities(spark.read.parquet(outp))
    got = {(r["src"], r["dst"]): r["w"] for r in got_df.collect()}
    want = {
        (r["src"], r["dst"]): r["w"]
        for r in induce_edges(t, include_participant=False).collect()
    }
    assert got == want
    # sanity: the per-batch inducer on the same chopped input would MISS the
    # turn4→turn5 boundary edges — state is what closes the gap
    assert len(got) > 0


def test_stateful_stream_rejects_out_of_order_batches(spark, tmp_path):
    """The stateful inducer's correctness premise is turn_idx-ordered arrival
    across batches. When that breaks (late file with earlier turns), it must
    fail the query loudly — silently pairing a turn-9 state with a turn-0
    batch would emit wrong boundary edges."""
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    t = generate_transcripts(spark, 10).cache()
    # write the LATER half first: batch 1 seeds state at turn_idx 9, batch 2
    # arrives starting at turn_idx 0 — premise violated
    t.filter("turn_idx >= 5").coalesce(1).write.mode("append").parquet(inp)
    t.filter("turn_idx < 5").coalesce(1).write.mode("append").parquet(inp)

    q = stream_induce_edges_stateful(spark, inp, outp, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception) as ei:
        q.awaitTermination(240)
        if q.exception() is not None:  # surface async failure modes too
            raise q.exception()
    assert "out-of-order" in str(ei.value)


def test_windowed_counts_plan_is_streaming(spark, tmp_path):
    inp = str(tmp_path / "in")
    generate_transcripts(spark, 20).coalesce(1).write.parquet(inp)
    df = stream_edge_counts(spark, inp)
    assert df.isStreaming
    assert "window" in df.columns and "entity" in df.columns
