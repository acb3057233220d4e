"""SCC vs a python Tarjan oracle on random digraphs (SCCGraphulo parity)."""

from __future__ import annotations

import random

from graphulo_spark.algorithms.scc import scc


def tarjan_scc(edge_list):
    """Iterative Tarjan; returns {v: min vertex id of its SCC}."""
    adj = {}
    vs = set()
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
        vs.update((s, d))
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    for root in sorted(vs):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return out


def _rand_digraph(n, m, seed):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        s, d = rng.randrange(n), rng.randrange(n)
        if s != d:
            es.add((s, d))
    return sorted(es)


def test_scc_cycle_plus_tail(spark):
    el = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame([(s, d, 1.0) for s, d in el], "src long, dst long, w double")
    got = {r["v"]: r["scc"] for r in scc(spark, df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_scc_two_cycles_bridge(spark):
    el = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)]
    df = spark.createDataFrame([(s, d, 1.0) for s, d in el], "src long, dst long, w double")
    got = {r["v"]: r["scc"] for r in scc(spark, df).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_scc_random_oracle(spark):
    el = _rand_digraph(40, 90, seed=17)
    want = tarjan_scc(el)
    df = spark.createDataFrame([(s, d, 1.0) for s, d in el], "src long, dst long, w double")
    got = {r["v"]: r["scc"] for r in scc(spark, df).collect()}
    assert got == want


def test_scc_block_refinement_on_cycle_chain(spark):
    """A chain of 50 two-cycles (C0 → C1 → … → C49) is a 50-level
    condensation: single-pivot peeling (the r2 shape) removes one SCC per
    outer pass — 50 passes. (fwd, bwd) block refinement splits the chain
    into per-SCC blocks after pass 1 (shared fwd = 0, distinct bwd = own
    cycle min), so pass 2 finishes everything: ≤2 outer passes, exact."""
    from graphulo_spark.watch import Watch

    el = []
    for i in range(50):
        a, b = 2 * i, 2 * i + 1
        el += [(a, b), (b, a)]
        if i < 49:
            el.append((b, a + 2))
    df = spark.createDataFrame([(s, d, 1.0) for s, d in el], "src long, dst long, w double")
    w = Watch(spark)
    got = {r["v"]: r["scc"] for r in scc(spark, df, watch=w).collect()}
    assert got == {v: 2 * (v // 2) for v in range(100)}
    assert w.report()["counters"]["outer_passes"] <= 2


def test_scc_pointer_jumping_logarithmic_on_cycle(spark):
    """A 1024-vertex directed cycle is ONE SCC with diameter 1023 — the r2
    one-hop-per-round inner loops needed ~10^3 rounds on it. With the
    label(label) shortcut (cc.py's pointer jumping applied to both the fwd
    and bwd propagations) it must converge in O(log n) inner rounds."""
    from graphulo_spark.watch import Watch

    n = 1024
    el = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame([(s, d, 1.0) for s, d in el], "src long, dst long, w double")
    w = Watch(spark)
    got = {r["v"]: r["scc"] for r in scc(spark, df, watch=w).collect()}
    assert got == {v: 0 for v in range(n)}
    rep = w.report()
    assert rep["counters"]["outer_passes"] == 1
    assert rep["counters"]["fwd_round"] <= 15, rep["counters"]
    assert rep["counters"]["bwd_round"] <= 15, rep["counters"]
    assert rep["spans"]["outer_pass"]["count"] == 1


def test_scc_pointer_jumping_logarithmic_on_path(spark):
    """A 1024-vertex directed path: all singleton SCCs. Single-pivot peeling
    (the r2 shape) assigns ONE vertex per outer pass here — O(n) passes. With
    (fwd, bwd) block refinement, pass 1 assigns the head and splits everyone
    else into singleton blocks (distinct bwd labels), pass 2 assigns them
    all: exactly 2 outer passes, with O(log n) shortcut-bounded inner rounds."""
    from graphulo_spark.watch import Watch

    n = 1024
    el = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame([(s, d, 1.0) for s, d in el], "src long, dst long, w double")
    w = Watch(spark)
    got = {r["v"]: r["scc"] for r in scc(spark, df, watch=w).collect()}
    assert got == {v: v for v in range(n)}
    rep = w.report()
    assert rep["counters"]["outer_passes"] <= 2
    assert rep["counters"]["fwd_round"] <= 16, rep["counters"]
    assert rep["counters"]["bwd_round"] <= 16, rep["counters"]
