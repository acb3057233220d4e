"""Graph500 triple-file ingestion and D4M range parsing (UtilTest parity)."""

from __future__ import annotations

import pytest

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
