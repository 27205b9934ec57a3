"""PageRank golden tests — fixtures F1 (unit graph) and F2 (doc graph).

Reference goldens: algo/src/test/java/org/neo4j/gds/pagerank/PageRankTest.java:66-141
and doc/modules/ROOT/pages/algorithms/page-rank.adoc result tables.
"""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import Graph, edges_from_tuples, graph_from_edges
from graph_data_science_spark.operators.pagerank import pagerank

from tests.fixtures import (
    F1_EDGES, F1_EXPECTED, F1_NODES,
    F2_EDGES, F2_EXPECTED_TOL01, F2_EXPECTED_UNWEIGHTED, F2_EXPECTED_WEIGHTED, F2_NODES,
)


def build_graph(spark, edges, nodes, weighted=False):
    e = edges_from_tuples(spark, edges, weighted=weighted)
    n = spark.createDataFrame([(i,) for i in nodes], "node_id long")
    return Graph(nodes=n, edges=e)


def scores_dict(result):
    return {r["node_id"]: r["score"] for r in result.scores.collect()}


def test_pagerank_f1_fixpoint(spark):
    g = build_graph(spark, F1_EDGES, F1_NODES)
    res = pagerank(g, damping_factor=0.85, tolerance=0.0, max_iterations=41)
    got = scores_dict(res)
    for node, want in F1_EXPECTED.items():
        assert got[node] == pytest.approx(want, abs=1e-5), f"node {node}"


def test_pagerank_f1_sinks_exact_alpha(spark):
    # dangling mass NOT redistributed: pure sources/sinks stay at 1-d = 0.15
    g = build_graph(spark, F1_EDGES, F1_NODES)
    res = pagerank(g, tolerance=0.0, max_iterations=41)
    got = scores_dict(res)
    for node in (6, 7, 8, 9, 10):
        assert got[node] == pytest.approx(0.15, abs=1e-12)


def test_pagerank_f2_unweighted_defaults(spark):
    g = build_graph(spark, F2_EDGES, F2_NODES, weighted=True)
    res = pagerank(g, damping_factor=0.85, tolerance=1e-7, max_iterations=20)
    got = scores_dict(res)
    for node, want in F2_EXPECTED_UNWEIGHTED.items():
        assert got[node] == pytest.approx(want, abs=1e-6), f"node {node}"
    assert res.ran_iterations == 20  # doc golden: ranIterations = 20


def test_pagerank_f2_weighted(spark):
    g = build_graph(spark, F2_EDGES, F2_NODES, weighted=True)
    res = pagerank(g, weighted=True)
    got = scores_dict(res)
    for node, want in F2_EXPECTED_WEIGHTED.items():
        assert got[node] == pytest.approx(want, abs=1e-6), f"node {node}"


def test_pagerank_f2_tolerance_early_stop(spark):
    g = build_graph(spark, F2_EDGES, F2_NODES, weighted=True)
    res = pagerank(g, tolerance=0.1)
    got = scores_dict(res)
    for node, want in F2_EXPECTED_TOL01.items():
        assert got[node] == pytest.approx(want, abs=1e-6), f"node {node}"
    assert res.converged
    assert res.ran_iterations < 20


def test_pagerank_personalized_source_nodes(spark):
    # personalized: non-source nodes start at 0; sources at alpha
    g = build_graph(spark, F2_EDGES, F2_NODES, weighted=True)
    # maxIterations counts the send-only initial superstep: 2 = one exchange
    res = pagerank(g, source_nodes=[0], tolerance=0.0, max_iterations=2)
    got = scores_dict(res)
    assert got[0] == pytest.approx(0.15)
    # Home's 3 out-neighbors each get d * (0.15/3)
    for nb in (1, 2, 3):
        assert got[nb] == pytest.approx(0.85 * 0.05)
    for other in (4, 5, 6, 7):
        assert got[other] == pytest.approx(0.0)


def test_pagerank_salted_two_level_agg_matches(spark):
    g = build_graph(spark, F1_EDGES, F1_NODES)
    base = scores_dict(pagerank(g, tolerance=0.0, max_iterations=41))
    salted = scores_dict(pagerank(g, tolerance=0.0, max_iterations=41, skew_salt=4))
    for node in F1_NODES:
        assert salted[node] == pytest.approx(base[node], abs=1e-12)


def test_pagerank_vs_numpy_power_iteration(spark):
    """F6 cross-check: same delta-push recurrence in dense NumPy."""
    import numpy as np

    rng = np.random.default_rng(42)
    n = 60
    edges = set()
    while len(edges) < 300:
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((int(a), int(b)))
    edges = sorted(edges)

    # dense reference of the exact GDS recurrence
    alpha, d, iters = 0.15, 0.85, 30
    out_deg = np.zeros(n)
    for a, b in edges:
        out_deg[a] += 1
    rank = np.full(n, alpha)
    delta = rank.copy()
    for _ in range(iters):
        msg = np.zeros(n)
        for a, b in edges:
            if delta[a] > 0:
                msg[b] += delta[a] / out_deg[a]
        delta = d * msg
        rank += delta

    g = build_graph(spark, edges, list(range(n)))
    res = pagerank(g, tolerance=0.0, max_iterations=iters + 1)
    got = scores_dict(res)
    for i in range(n):
        assert got[i] == pytest.approx(rank[i], abs=1e-9), f"node {i}"


# ---- incremental (warm-start push-residual) ---------------------------------

def test_pagerank_incremental_matches_full_recompute(spark):
    from graph_data_science_spark.operators.pagerank import pagerank_incremental
    base_edges = [(a, b) for (a, b, *_r) in F2_EDGES]
    g0 = build_graph(spark, base_edges, F2_NODES)
    # damping 0.5: deltas halve per superstep, so 1e-9 converges in ~30
    # supersteps (0.85 would need ~130 — same math, slower test)
    prev = pagerank(g0, damping_factor=0.5, tolerance=1e-9,
                    max_iterations=60).scores
    # perturb: drop one edge, add two (one to a brand-new node 99)
    new_edges = base_edges[1:] + [(0, 6), (3, 99)]
    g1 = build_graph(spark, new_edges, list(F2_NODES) + [99])
    full = scores_dict(pagerank(g1, damping_factor=0.5, tolerance=1e-9,
                                max_iterations=60))
    inc = pagerank_incremental(g1, prev, damping_factor=0.5,
                               tolerance=1e-9, max_iterations=60)
    assert inc.converged
    got = scores_dict(inc)
    assert set(got) == set(full)
    for k in full:
        assert abs(got[k] - full[k]) < 1e-6, (k, got[k], full[k])


def test_pagerank_incremental_cold_start_equals_reference_kernel(spark):
    from graph_data_science_spark.operators.pagerank import pagerank_incremental
    g = build_graph(spark, F1_EDGES, F1_NODES)
    empty_prev = spark.createDataFrame([], "node_id long, score double")
    got = scores_dict(pagerank_incremental(g, empty_prev, tolerance=1e-10,
                                           max_iterations=60))
    ref = scores_dict(pagerank(g, tolerance=1e-10, max_iterations=60))
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-9


def test_pagerank_incremental_frontier_is_local(spark):
    from graph_data_science_spark.operators.pagerank import pagerank_incremental
    # long chain; a leaf edge appended at the TAIL perturbs only its
    # neighborhood, so the warm-start frontier must be a small fraction of n
    n = 40
    chain = [(i, i + 1) for i in range(n - 1)]
    g0 = build_graph(spark, chain, list(range(n)))
    prev = pagerank(g0, tolerance=1e-12, max_iterations=100).scores
    g1 = build_graph(spark, chain + [(n - 1, n)], list(range(n + 1)))
    inc = pagerank_incremental(g1, prev, tolerance=1e-7, max_iterations=100)
    full = scores_dict(pagerank(g1, tolerance=1e-7, max_iterations=100))
    got = scores_dict(inc)
    for k in full:
        assert abs(got[k] - full[k]) < 1e-5
    # first superstep's frontier: nodes with |residual| > tol — the chain
    # upstream of the change has zero residual, so well under half of n
    first_active = inc.metrics[0]["active"] if inc.metrics else None
    assert first_active is not None and first_active < (n + 1) // 2
