"""Superstep checkpoint/resume: interrupted run == uninterrupted run, bitwise."""

from __future__ import annotations

import json
import os

from conftest import numpy_pagerank
from graphulo_spark.algorithms import pagerank
from graphulo_spark.checkpoint import SuperstepCheckpointer
from test_algorithms import _random_graph


def _ranks(df):
    return {r["v"]: r["rank"] for r in df.collect()}


def test_resume_bitwise_identical(spark, tmp_path):
    el = _random_graph(n=40, m=120, seed=11)
    df = spark.createDataFrame(el, "src long, dst long, w double")

    full_dir = str(tmp_path / "full")
    a = _ranks(pagerank(spark, df, tol=0.0, max_iter=8, checkpoint_dir=full_dir))

    # simulate a kill after 4 supersteps, then resume to 8
    kill_dir = str(tmp_path / "killed")
    pagerank(spark, df, tol=0.0, max_iter=4, checkpoint_dir=kill_dir)
    b = _ranks(pagerank(spark, df, tol=0.0, max_iter=8, checkpoint_dir=kill_dir, resume=True))

    assert set(a) == set(b)
    for v in a:
        assert a[v] == b[v], v  # bitwise: both paths executed identical superstep inputs


def test_resume_ignores_incomplete_step(spark, tmp_path):
    el = _random_graph(n=30, m=80, seed=3)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    d = str(tmp_path / "run")
    pagerank(spark, df, tol=0.0, max_iter=3, checkpoint_dir=d)
    # corrupt the newest step: delete its manifest (simulates a mid-write kill)
    os.remove(os.path.join(d, "step=3", "_MANIFEST.json"))
    ck = SuperstepCheckpointer(spark, d, {"alg": "pagerank", "alpha": 0.85, "tol": 0.0, "strategy": "auto"})
    assert ck.latest_step() == 2


def test_manifest_contents(spark, tmp_path):
    el = _random_graph(n=30, m=80, seed=5)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    d = str(tmp_path / "run")
    pagerank(spark, df, tol=0.0, max_iter=2, checkpoint_dir=d)
    with open(os.path.join(d, "step=2", "_MANIFEST.json")) as f:
        m = json.load(f)
    assert m["step"] == 2
    assert m["lineage"]["parent_step"] == 1
    assert m["partitioner"]["num_partitions"] >= 1
    n_vertices = df.selectExpr("src AS v").union(df.selectExpr("dst AS v")).distinct().count()
    assert sum(p["rows"] for p in m["partition_metrics"].values()) == n_vertices
    assert all(p["bytes"] > 0 for p in m["partition_metrics"].values())


def test_resume_refuses_mismatched_params(spark, tmp_path):
    el = _random_graph(n=20, m=50, seed=9)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    d = str(tmp_path / "run")
    pagerank(spark, df, tol=0.0, max_iter=2, checkpoint_dir=d, alpha=0.85)
    ck = SuperstepCheckpointer(spark, d, {"alg": "pagerank", "alpha": 0.5, "tol": 0.0, "strategy": "auto"})
    assert ck.latest_step() is None  # different params hash → no resumable step


def test_checkpointed_equals_uncheckpointed(spark, tmp_path):
    el = _random_graph(n=40, m=120, seed=13)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    want = numpy_pagerank(el, tol=0.0, max_iter=12)
    got = _ranks(pagerank(spark, df, tol=0.0, max_iter=12, checkpoint_dir=str(tmp_path / "r")))
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
