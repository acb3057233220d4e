"""Watch span/counter parity (skvi/Watch.java): spans accumulate, counters
increment, trace gate makes it a no-op, and pagerank reports per-superstep
spans through it."""

from __future__ import annotations

from graphulo_spark.watch import Watch


def test_watch_spans_and_counters():
    w = Watch()
    for _ in range(3):
        with w.span("Multiply"):
            pass
    w.increment("RowSkipNum", 5)
    w.increment("RowSkipNum")
    r = w.report()
    assert r["spans"]["Multiply"]["count"] == 3
    assert r["spans"]["Multiply"]["total_s"] >= 0
    assert r["spans"]["Multiply"]["min_s"] <= r["spans"]["Multiply"]["max_s"]
    assert r["counters"]["RowSkipNum"] == 6


def test_watch_trace_gate_noop():
    Watch.enable_trace = False
    try:
        w = Watch()
        with w.span("All"):
            pass
        w.increment("All")
        assert w.report() == {"spans": {}, "counters": {}}
    finally:
        Watch.enable_trace = True


def test_pagerank_reports_superstep_spans(spark):
    from graphulo_spark.algorithms import pagerank

    df = spark.createDataFrame([(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)], "src long, dst long, w double")
    w = Watch(spark)
    pagerank(spark, df, tol=0.0, max_iter=4, watch=w)
    r = w.report()
    assert r["spans"]["superstep"]["count"] == 4
    assert r["counters"]["supersteps"] == 4
    assert r["spans"]["superstep"]["mean_s"] > 0
