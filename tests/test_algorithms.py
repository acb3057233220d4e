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


def test_cc_fractional_ids_take_diff_join_witness(spark):
    """Fractional numeric vertex ids must NOT use the decimal(38,0) label-mass
    witness: ids 0.25 apart all round to the same decimal, so a real label
    change can alias to a zero mass delta and break the loop pre-fixpoint.
    The dispatch routes them to the type-generic diff join — components on a
    long path of fractional ids must still reach the true minimum."""
    # path 1.25 - 1.5 - 1.75 - ... : every label rounds to 1 or 2
    ids = [1.0 + 0.25 * i for i in range(12)]
    el = [(ids[i], ids[i + 1], 1.0) for i in range(len(ids) - 1)]
    df = spark.createDataFrame(el, "src double, dst double, w double")
    got = {r["v"]: r["component"] for r in connected_components(spark, df).collect()}
    assert got == {v: 1.0 for v in ids}


def test_label_prop_exact_oracle(spark, rgraph):
    el, df = rgraph
    want = python_label_prop(el, iters=3)
    got = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=3).collect()}
    assert got == want


def test_label_prop_hub_takes_two_exchange_fallback(spark):
    """r6 skew gate: a hub whose in-degree exceeds the hot threshold
    (max(1000, |E|/(4·parts))) must push LP off the single-shuffle vote plan
    onto the (dst,label)-keyed two-exchange fallback — and the result must
    still match the python oracle (same winner rule on either plan)."""
    from graphulo_spark.algorithms.label_prop import _single_shuffle_votes

    el = [(i, 0, 1.0) for i in range(1, 1202)] + [(1, 2, 5.0), (3, 4, 5.0)]
    # the hub (in-degree 1201 after symmetrize) must trip the gate...
    assert not _single_shuffle_votes(1201, 2 * len(el), 32)
    # ...which a hub-free graph of the same size does not
    assert _single_shuffle_votes(120, 2 * len(el), 32)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    want = python_label_prop(el, iters=2)
    got = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=2).collect()}
    assert got == want


def test_label_prop_deterministic(spark, rgraph):
    _, df = rgraph
    a = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=4).collect()}
    b = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=4).collect()}
    assert a == b


def test_label_prop_string_ids(spark, rgraph):
    """String vertex ids take the sort-window argmax path (no order
    inversion for the max_by struct) — same assignments as the numeric
    path under an order-isomorphic id mapping."""
    el, df = rgraph
    sdf = spark.createDataFrame(
        [(f"v{s:03d}", f"v{d:03d}", w) for s, d, w in el],
        "src string, dst string, w double",
    )
    got = {r["v"]: r["label"] for r in label_propagation(spark, sdf, iters=3).collect()}
    base = {r["v"]: r["label"] for r in label_propagation(spark, df, iters=3).collect()}
    assert got == {f"v{v:03d}": f"v{l:03d}" for v, l in base.items()}


def test_triangles_random_oracle(spark, rgraph):
    el, df = rgraph
    assert triangle_count(df) == python_triangles(el)
    assert triangle_count(df, orientation="id") == python_triangles(el)


def test_triangle_closers_intersect_equals_wedge_path(spark, rgraph, g5):
    """r6 opt pin: the broadcast path emits triangles via per-edge
    N⁺(a) ∩ N⁺(b) adjacency intersection (wedges never materialize); it must
    produce the exact (a, b, c) triple SET of the shuffled wedge-join path,
    under both orientations, and the scalar counts must agree too."""
    from graphulo_spark.algorithms.triangles import triangle_closers

    _, rdf = rgraph
    for df in (g5, rdf):
        for orientation in ("degree", "id"):
            fast = {
                (r["a"], r["b"], r["c"])
                for r in triangle_closers(
                    df, orientation=orientation, closer_strategy="broadcast"
                ).collect()
            }
            slow = {
                (r["a"], r["b"], r["c"])
                for r in triangle_closers(
                    df, orientation=orientation, closer_strategy="shuffle"
                ).collect()
            }
            assert fast == slow and len(fast) == len(slow)
            assert triangle_count(df, orientation, closer_strategy="broadcast") == triangle_count(
                df, orientation, closer_strategy="shuffle"
            )


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


# ---------------------------------------------------------------------------
# cross-implementation equivalences (the reference's own check pattern:
# TriangleCountExample.java, AlgorithmTest.java:236-409)
# ---------------------------------------------------------------------------


def test_single_bfs_equals_adj_bfs(spark, rgraph, g5):
    from graphulo_spark.algorithms.bfs import single_bfs

    for df, seed in ((g5, 5), (rgraph[1], 0)):
        for k in (1, 2, 3):
            a = {(r["v"], r["dist"]) for r in adj_bfs(spark, df, [seed], k=k).collect()}
            b = {(r["v"], r["dist"]) for r in single_bfs(spark, df, [seed], k=k).collect()}
            assert a == b, (seed, k)


def test_ktruss_edge_equals_adjacency_path(spark, rgraph, g5):
    from graphulo_spark.algorithms.ktruss import ktruss, ktruss_edge
    from graphulo_spark.linalg.edges import canonicalize
    from graphulo_spark.linalg.incidence import from_incidence, to_incidence

    for df in (g5, rgraph[1]):
        for k in (3, 4):
            adj = {(r["src"], r["dst"]) for r in ktruss(spark, df, k=k).collect()}
            inc = ktruss_edge(spark, to_incidence(canonicalize(df)), k=k)
            edge = {(r["src"], r["dst"]) for r in from_incidence(inc).collect()}
            assert adj == edge, k


def test_tricount_via_support_equals_closers(spark, rgraph, g5):
    from graphulo_spark.algorithms.triangles import triangle_count_via_support

    el, rdf = rgraph
    assert triangle_count_via_support(g5) == triangle_count(g5) == 2
    assert triangle_count_via_support(rdf) == triangle_count(rdf)


def test_edge_support_wedges_are_degree_oriented(spark, rgraph, g5):
    """Scale guard: edge_support must generate its wedges under the DEGREE
    orientation (hubs receive, never fan out — Graphulo's d(d-1)/2 split
    concern, Graphulo.java:2701-2739). The degree join's internal aliases
    (ds/dd) are visible in the physical plan; the id orientation has neither.
    Values stay exact: per-edge support on a hub graph where id order and
    degree order disagree matches a brute-force Python oracle."""
    import contextlib
    import io
    import itertools

    from graphulo_spark.algorithms.triangles import edge_support

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edge_support(g5).explain("formatted")
    plan = buf.getvalue()
    assert "ds#" in plan and "dd#" in plan, "edge_support wedge source is not degree-oriented"

    # hub vertex 100 (max id, max degree) + triangles hanging off it: under
    # id order the hub is a wedge *center* only via its low-id neighbors, so
    # orientations genuinely disagree about who fans out
    hub_edges = [(i, 100) for i in range(1, 9)] + [(1, 2), (3, 4), (5, 6)]
    df = spark.createDataFrame([(a, b, 1.0) for a, b in hub_edges], "src long, dst long, w double")
    adj = {v: set() for v in set(itertools.chain.from_iterable(hub_edges))}
    for a, b in hub_edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {
        (a, b): len(adj[a] & adj[b]) for a, b in hub_edges
    }
    got = {(r["src"], r["dst"]): r["support"] for r in edge_support(df).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# scale-shape guards
# ---------------------------------------------------------------------------


def test_cc_pointer_jumping_logarithmic_on_path(spark):
    """A 1024-vertex path converges in O(log n) rounds with shortcutting —
    plain min-label propagation would need ~1023."""
    n = 1024
    df = spark.createDataFrame([(i, i + 1, 1.0) for i in range(n - 1)], "src long, dst long, w double")
    hist = []
    out = connected_components(spark, df, max_iter=30, history=hist)
    assert hist[-1]["changed"] == 0, "did not converge"
    assert len(hist) <= 15, f"needed {len(hist)} rounds — shortcutting broken?"
    assert out.filter(out["component"] != 0).count() == 0  # one component, min id 0


def test_cc_label_mass_delta_monotone(spark):
    """cc's convergence witness is the label-mass delta Σlabel_{k-1}−Σlabel_k
    (one map-side partial agg per round, no |V|-vs-|V| diff join). Labels
    only ever decrease, so every recorded delta is > 0 until the final 0 —
    and a zero delta genuinely means fixpoint (labels == min-id assignment)."""
    el = _random_graph(n=60, m=90, seed=77)
    df = spark.createDataFrame(el, "src long, dst long, w double")
    hist = []
    out = connected_components(spark, df, max_iter=40, history=hist)
    assert hist[-1]["changed"] == 0
    assert all(h["changed"] > 0 for h in hist[:-1]), hist
    # string vertex ids take the diff-join witness path (the decimal mass
    # sum would throw) — same components, same zero-terminated history
    sdf = spark.createDataFrame(
        [(f"v{s:03d}", f"v{d:03d}", 1.0) for s, d, _ in el],
        "src string, dst string, w double",
    )
    shist = []
    sout = connected_components(spark, sdf, max_iter=40, history=shist)
    assert shist[-1]["changed"] == 0
    scomp = {r["v"]: r["component"] for r in sout.collect()}
    comp0 = {r["v"]: r["component"] for r in out.collect()}
    assert scomp == {f"v{v:03d}": f"v{c:03d}" for v, c in comp0.items()}
    # the fixpoint the delta detected is the true min-label assignment
    comp = {r["v"]: r["component"] for r in out.collect()}
    adj = {}
    for s, d, _ in el:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for v in comp:
        stack, seen = [v], {v}
        while stack:
            u = stack.pop()
            for w in adj.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        assert comp[v] == min(seen)


def test_pagerank_one_job_per_superstep(spark):
    """Fixed-iteration mode on a dangling-free graph runs exactly ONE Spark
    job per FUSED superstep group (the state materialization) — never more,
    and no per-superstep driver collects (the VERDICT r01 'What's wrong' #4
    regression guard, tightened by r6's superstep fusion: bare
    fixed-iteration chains DEFAULT_SUPERSTEP_FUSE supersteps per job)."""
    import math

    from graphulo_spark.algorithms.pagerank import DEFAULT_SUPERSTEP_FUSE
    from graphulo_spark.linalg.edges import symmetrize

    el = _random_graph(n=40, m=100, seed=31)
    df = symmetrize(spark.createDataFrame(el, "src long, dst long, w double")).localCheckpoint()
    sc = spark.sparkContext
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def jobs(group: str, iters: int) -> int:
            spark.catalog.clearCache()  # cross-call cache reuse skews setup job counts
            sc.setJobGroup(group, group)
            pagerank(spark, df, tol=0.0, max_iter=iters, strategy="plain")
            sc.setJobGroup("idle", "idle")
            return len(sc.statusTracker().getJobIdsForGroup(group))

        j2 = jobs("pr-jobs-2", 2)
        j5 = jobs("pr-jobs-5", 5)
        f = DEFAULT_SUPERSTEP_FUSE
        want = math.ceil(5 / f) - math.ceil(2 / f)
        assert j5 - j2 == want, f"expected {want} extra jobs (fuse={f}), got {j5 - j2}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
