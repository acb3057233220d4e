"""PageRank / CC / LP / BFS vs pure-python oracles on random power-law-ish graphs."""

from __future__ import annotations

import random

import pytest

from conftest import numpy_pagerank, python_cc, python_label_prop, python_triangles
from graphulo_spark.algorithms import (
    adj_bfs,
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)


def _random_graph(n=60, m=180, seed=7):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        # skewed: quadratic bias toward low ids → hub vertices
        s = int(n * rng.random() ** 2)
        d = rng.randrange(n)
        if s != d:
            edges.add((s, d))
    return [(s, d, float(rng.randint(1, 3))) for s, d in sorted(edges)]


@pytest.fixture(scope="module")
def rgraph(spark):
    el = _random_graph()
    return el, spark.createDataFrame(el, "src long, dst long, w double")


@pytest.mark.parametrize("strategy", ["broadcast", "salted"])
def test_pagerank_fixed_steps_match_oracle(spark, rgraph, strategy):
    # fixed-superstep parity with the numpy mirror: pins the exact update rule
    el, df = rgraph
    want = numpy_pagerank(el, alpha=0.85, tol=0.0, max_iter=15)
    got = {r["v"]: r["rank"] for r in pagerank(spark, df, tol=0.0, max_iter=15, strategy=strategy).collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_pagerank_converged_allclose_1e6(spark):
    # north-rule tolerance: converged scores allclose 1e-6 vs oracle
    el = _random_graph(n=25, m=70, seed=21)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    want = numpy_pagerank(el, alpha=0.85, tol=1e-7, max_iter=200)
    hist = []
    got = {r["v"]: r["rank"] for r in pagerank(spark, df, tol=1e-7, max_iter=200, history=hist).collect()}
    assert hist[-1]["delta"] < 1e-7  # actually converged, not max_iter'd
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, v


def test_pagerank_arrow_path_agrees(spark, rgraph):
    el, df = rgraph
    a = {r["v"]: r["rank"] for r in pagerank(spark, df, tol=0.0, max_iter=8, strategy="broadcast").collect()}
    b = {r["v"]: r["rank"] for r in pagerank(spark, df, tol=0.0, max_iter=8, strategy="arrow").collect()}
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12, v


def test_pagerank_dangling_mass_sums_to_one(spark):
    # v3 is dangling: ranks must still sum to 1
    import pyspark.sql.functions as F

    s = spark.createDataFrame([(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, w double")
    ranks = pagerank(spark, s, tol=0.0, max_iter=10)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_cc_exact_oracle(spark, rgraph):
    el, df = rgraph
    want = python_cc(el)
    got = {r["v"]: r["component"] for r in connected_components(spark, df).collect()}
    assert got == want


def test_cc_two_components(spark):
    el = [(1, 2, 1.0), (2, 3, 1.0), (10, 11, 1.0)]
    df = spark.createDataFrame(el, "src long, dst long, w double")
    got = {r["v"]: r["component"] for r in connected_components(spark, df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_label_prop_exact_oracle(spark, rgraph):
    el, df = rgraph
    want = python_label_prop(el, iters=3)
    got = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=3).collect()}
    assert got == want


def test_label_prop_deterministic(spark, rgraph):
    _, df = rgraph
    a = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=4).collect()}
    b = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=4).collect()}
    assert a == b


def test_triangles_random_oracle(spark, rgraph):
    el, df = rgraph
    assert triangle_count(df) == python_triangles(el)
    assert triangle_count(df, orientation="id") == python_triangles(el)


def test_bfs(spark, g5):
    got = {r["v"]: r["dist"] for r in adj_bfs(spark, g5, [5], k=2).collect()}
    # undirected: 5 -> 2 -> {1,3}; dist(5)=0, dist(2)=1, dist(1)=dist(3)=2
    assert got == {5: 0, 2: 1, 1: 2, 3: 2}


def test_bfs_degree_filter(spark, g5):
    # refuse to expand through vertices with degree > 2: from v5, reach v2
    # (deg 3) but do not traverse through it
    got = {r["v"]: r["dist"] for r in adj_bfs(spark, g5, [5], k=3, max_degree=2).collect()}
    assert got == {5: 0, 2: 1}


def test_bfs_directed(spark):
    e = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    df = spark.createDataFrame(e, "src long, dst long, w double")
    got = {r["v"]: r["dist"] for r in adj_bfs(spark, df, [1], k=1, directed=True).collect()}
    assert got == {1: 0, 2: 1}
