"""Local mirror of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.01; compare row count, sorted
column names, and the order-insensitive multiset of row values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: collapse -0.0/0.0 and format stably
        if v == 0:
            return "0"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


# iterative/fixpoint ops the contract allows to ship without an oracle
# (driver records a weaker rows-only check for these). Empty since round 2:
# ktruss_3 gained a bounded-unroll CTE oracle.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert missing == set(), f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, duck, name):
    if name in ROWS_ONLY:
        assert QUERIES[name](spark, SF).count() >= 0  # rows-only smoke
        return
    sdf = QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
    assert sset == dset, f"{name}: value mismatch, first diffs {mismatches}"


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert df.columns == ["partkey", "p_name", "rank"]
    assert rows[0]["rank"] >= rows[-1]["rank"]
