"""Graph500 triple-file ingestion and D4M range parsing (UtilTest parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphulo_spark.sources import d4m_row_predicate, parse_d4m_ranges, read_triple_files
from graphulo_spark.sources.d4m import ranges_to_d4m


def test_triple_files(spark, tmp_path):
    (tmp_path / "r.txt").write_text("1,2,3,1,\n")
    (tmp_path / "c.txt").write_text("2,3,1,2,\n")
    e = read_triple_files(spark, str(tmp_path / "r.txt"), str(tmp_path / "c.txt"))
    got = {(r["src"], r["dst"]): r["w"] for r in e.collect()}
    assert got == {(1, 2): 2.0, (2, 3): 1.0, (3, 1): 1.0}


def test_triple_files_leading_delimiter(spark, tmp_path):
    """ADVICE r2: a seed file starting with the delimiter used to yield a
    filtered-out empty token at position 0, shifting that file's real tokens
    by one vs the other file — src/dst silently misaligned. Positions are now
    assigned AFTER the empty-token filter."""
    (tmp_path / "r.txt").write_text(",1,2,3\n")  # leading delimiter
    (tmp_path / "c.txt").write_text("2,3,1\n")
    e = read_triple_files(spark, str(tmp_path / "r.txt"), str(tmp_path / "c.txt"))
    got = {(r["src"], r["dst"]): r["w"] for r in e.collect()}
    assert got == {(1, 2): 1.0, (2, 3): 1.0, (3, 1): 1.0}


@pytest.mark.parametrize(
    "spec,want",
    [
        ("a,", [("a", "a")]),
        ("a,:,b,", [("a", "b")]),
        ("a,:,", [("a", None)]),
        (":,b,", [(None, "b")]),
        ("a,b,c,", [("a", "a"), ("b", "b"), ("c", "c")]),
        ("a,:,b,g,x,:,", [("a", "b"), ("g", "g"), ("x", None)]),
        (":,", [(None, None)]),
    ],
)
def test_parse_d4m_ranges(spec, want):
    assert parse_d4m_ranges(spec) == want


def test_d4m_roundtrip():
    # UtilTest.java:140-432 pins d4mRowToRanges <-> rangesToD4mRow round-trips
    for spec in ["a,", "a,:,b,", "a,:,", ":,b,", "a,b,c,", "a,:,b,g,x,:,"]:
        assert ranges_to_d4m(parse_d4m_ranges(spec)) == spec


def test_d4m_predicate_filters(spark):
    df = spark.createDataFrame([(x,) for x in "abcdefg"], "k string")
    keep = {r["k"] for r in df.filter(d4m_row_predicate("k", "a,:,c,f,")).collect()}
    assert keep == {"a", "b", "c", "f"}


# ---------------- transcript source (Iceberg seam + parquet fallback) --------


def test_load_transcripts_parquet_path(spark, tmp_path):
    """Parquet-path mode: contract schema enforced, values identical to the
    generated table, downstream edge induction unchanged."""
    from graphulo_spark.sources import load_transcripts
    from graphulo_spark.transcripts import generate_transcripts, induce_edges

    t = generate_transcripts(spark, 20)
    p = str(tmp_path / "transcripts.parquet")
    t.write.parquet(p)
    loaded = load_transcripts(spark, p)
    assert [f.name for f in loaded.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict((f.name, f.dataType.simpleString()) for f in loaded.schema.fields)[
        "turn_idx"] == "int"
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    assert sorted(map(tuple, loaded.select(cols).collect())) == sorted(
        map(tuple, t.select(cols).collect()))
    assert sorted(map(tuple, induce_edges(loaded).collect())) == sorted(
        map(tuple, induce_edges(t).collect()))


def test_load_transcripts_catalog_table(spark):
    """Table-identifier mode goes through spark.read.table — the Iceberg/
    catalog path (exercised here via a registered view; the Iceberg runtime
    resolves real catalog tables through the identical call)."""
    from graphulo_spark.sources import load_transcripts, transcripts_fingerprint
    from graphulo_spark.transcripts import generate_transcripts

    t = generate_transcripts(spark, 5)
    # extra column on the source side must be pruned by the contract select
    t.withColumn("extra", F.lit(1)).createOrReplaceTempView("transcripts_view")
    loaded = load_transcripts(spark, "transcripts_view")
    assert loaded.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert loaded.count() == t.count()
    # a non-Iceberg table has no .history metadata table -> fingerprint None
    assert transcripts_fingerprint(spark, "transcripts_view") is None
    assert transcripts_fingerprint(spark, "/some/path.parquet") is None


def test_snapshot_fingerprint_gates_checkpoint_resume(spark, tmp_path):
    """The Iceberg snapshot fingerprint feeds SuperstepCheckpointer's params
    hash: resuming the same run after the source table advanced to a new
    snapshot (a new fingerprint string) REFUSES from catalog metadata alone,
    while resume under the unchanged snapshot continues. No data scan is
    involved — the edges content hash is bypassed entirely (the edge tables
    below are identical; only the snapshot id differs)."""
    from graphulo_spark.algorithms import pagerank

    run = str(tmp_path / "pr_run")
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)], "src long, dst long, w double"
    )
    pagerank(spark, e, tol=0.0, max_iter=2, checkpoint_dir=run,
             input_fp="iceberg-snapshot:1111")
    # same snapshot -> resume continues (larger budget is a legal continuation)
    pagerank(spark, e, tol=0.0, max_iter=3, checkpoint_dir=run, resume=True,
             input_fp="iceberg-snapshot:1111")
    # table advanced -> new snapshot id -> refuse via params-hash mismatch
    with pytest.raises(ValueError, match="refusing to resume"):
        pagerank(spark, e, tol=0.0, max_iter=3, checkpoint_dir=run, resume=True,
                 input_fp="iceberg-snapshot:2222")


def test_source_input_fp_dispatch(spark, tmp_path):
    """source_input_fp prefers the catalog-metadata snapshot fingerprint and
    falls back to the content fingerprint. The catalog side is simulated with
    a managed ``<db>.history`` table shaped like Iceberg's metadata table —
    the helper's SQL is identical against the real thing — including a
    rollback (newest ``made_current_at`` wins, not the largest snapshot id)."""
    from graphulo_spark.checkpoint import input_fingerprint
    from graphulo_spark.sources import source_input_fp

    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, w double"
    )
    # parquet-path source -> content fingerprint of the derived projection
    fp = source_input_fp(spark, str(tmp_path / "t.parquet"), e, "src", "dst", "w")
    assert fp == input_fingerprint(e, "src", "dst", "w")

    spark.sql("CREATE DATABASE IF NOT EXISTS ice_sim")
    try:
        spark.sql(
            "CREATE TABLE ice_sim.history (snapshot_id BIGINT, "
            "made_current_at TIMESTAMP) USING parquet"
        )
        spark.sql(
            "INSERT INTO ice_sim.history VALUES "
            "(111, TIMESTAMP '2026-01-01 00:00:00'), "
            "(222, TIMESTAMP '2026-01-02 00:00:00')"
        )
        assert source_input_fp(spark, "ice_sim", e) == "iceberg-snapshot:222"
        # rollback to 111: a NEW history row marks the OLD snapshot current
        spark.sql(
            "INSERT INTO ice_sim.history VALUES "
            "(111, TIMESTAMP '2026-01-03 00:00:00')"
        )
        assert source_input_fp(spark, "ice_sim", e) == "iceberg-snapshot:111"
    finally:
        spark.sql("DROP DATABASE IF EXISTS ice_sim CASCADE")


def test_load_transcripts_refuses_bad_inputs(spark, tmp_path):
    from graphulo_spark.sources import load_transcripts
    from graphulo_spark.transcripts import generate_transcripts

    p = str(tmp_path / "t.parquet")
    generate_transcripts(spark, 3).write.parquet(p)
    with pytest.raises(ValueError, match="snapshot pinning"):
        load_transcripts(spark, p, snapshot_id=123)
    bad = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(bad)
    with pytest.raises(ValueError, match="missing contract columns"):
        load_transcripts(spark, bad)
