"""NMF vs a numpy mirror of the exact same alternating update."""

from __future__ import annotations

import numpy as np

from graphulo_spark.algorithms.nmf import nmf, reconstruction_error


def test_nmf_error_decreases(spark):
    rng = np.random.default_rng(5)
    edges = [
        (int(i), int(100 + j), float(rng.integers(1, 5)))
        for i in range(12)
        for j in range(8)
        if rng.random() < 0.6
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    w2, h2 = nmf(spark, df, k=3, max_iter=2)
    e2 = reconstruction_error(df, w2, h2, 3)
    w8, h8 = nmf(spark, df, k=3, max_iter=8)
    e8 = reconstruction_error(df, w8, h8, 3)
    assert e8 <= e2 * 1.001  # monotone-ish improvement under more iterations
    total = df.selectExpr("sum(w*w)").collect()[0][0]
    assert e8 < 0.9 * total  # actually explains variance


def test_nmf_exact_rank_recovery(spark):
    # rank-1 matrix: w(i,j) = r(i)*c(j) — NMF with k>=1 reconstructs ~exactly
    edges = [(i, 100 + j, float((i + 1) * (j + 1))) for i in range(6) for j in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    w, h = nmf(spark, df, k=2, max_iter=15)
    err = reconstruction_error(df, w, h, 2)
    total = sum(x[2] ** 2 for x in edges)
    assert err / total < 1e-3


def test_nmf_factors_nonnegative(spark):
    edges = [(i, 100 + (i * 3) % 7, 1.0 + i % 4) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    w, h = nmf(spark, df, k=3, max_iter=4)
    for fdf in (w, h):
        pdf = fdf.toPandas()
        assert (pdf[[c for c in pdf.columns if c.startswith("f")]].to_numpy() >= 0).all()


def test_assign_topics_matches_numpy(spark):
    """doHT_HHTinv (Graphulo.java:4302-4343): projecting rows onto a frozen H
    equals the numpy closed form W_new = onlyPos((A·H) inv(HᵀH + εI))."""
    import numpy as np

    from graphulo_spark.algorithms.nmf import assign_topics, nmf

    rng = np.random.RandomState(7)
    n, m, k = 30, 20, 3
    a = (rng.rand(n, m) < 0.3) * rng.randint(1, 5, (n, m)).astype(float)
    el = [(i, j, float(a[i, j])) for i in range(n) for j in range(m) if a[i, j] != 0]
    df = spark.createDataFrame(el, "src long, dst long, w double")
    _, h_df = nmf(spark, df, k=k, max_iter=3)

    hrows = {r["id"]: [r[f"f{i}"] for i in range(k)] for r in h_df.collect()}
    hm = np.zeros((m, k))
    for j, vec in hrows.items():
        hm[j] = vec
    inv = np.linalg.inv(hm.T @ hm + 1e-9 * np.eye(k))
    want = np.maximum(0.0, (a @ hm) @ inv)  # inv symmetric: (A·H)·inv == row-wise inv·(HᵀA)

    got = {r["id"]: [r[f"f{i}"] for i in range(k)] for r in assign_topics(df, h_df, k).collect()}
    for i in range(n):
        if i in got:
            assert np.allclose(got[i], want[i], atol=1e-9), i
