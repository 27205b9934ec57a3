"""Property tests, batch 2: centrality / similarity / HITS / LCC vs
independent brute-force references on random graphs (see
test_property_random_graphs.py for the rationale)."""

from __future__ import annotations

import itertools
from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from graph_data_science_spark.graph import Graph

N_MAX = 12
SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@st.composite
def edge_lists(draw):
    n = draw(st.integers(min_value=2, max_value=N_MAX))
    m = draw(st.integers(min_value=1, max_value=min(30, n * (n - 1) // 2)))
    pairs = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        min_size=m, max_size=m))
    edges = sorted({(a, b) for a, b in pairs if a != b})
    if not edges:
        edges = [(0, 1)]
    return n, edges


def _graph(spark, n, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    return Graph(nodes=nodes,
                 edges=spark.createDataFrame(edges, "src long, dst long"))


def _bfs_dists(adj, s, n):
    dist = {s: 0}
    q = deque([s])
    while q:
        v = q.popleft()
        for u in adj[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist


# -- betweenness vs python Brandes (directed, unweighted) ---------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_betweenness_matches_brandes(spark, data):
    from graph_data_science_spark.operators.centrality import betweenness

    n, edges = data
    adj = {v: [] for v in range(n)}
    for a, b in edges:
        adj[a].append(b)
    score = {v: 0.0 for v in range(n)}
    for s in range(n):
        # forward BFS with path counts
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    sigma[u] = 0.0
                    order.append(u)
                    q.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
        delta = {v: 0.0 for v in order}
        for v in reversed(order):
            for u in adj[v]:
                if u in dist and dist[u] == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[u] * (1.0 + delta[u])
            if v != s:
                score[v] += delta[v]

    got = {r["node_id"]: r["score"]
           for r in betweenness(_graph(spark, n, edges)).collect()}
    assert got == pytest.approx({v: round(score[v], 6) for v in range(n)},
                                abs=1e-6)


# -- closeness / harmonic vs BFS references -----------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_closeness_and_harmonic_match_bfs(spark, data):
    from graph_data_science_spark.operators.centrality import closeness, harmonic

    n, edges = data
    adj = {v: [] for v in range(n)}
    for a, b in edges:
        adj[a].append(b)
    close, harm = {}, {}
    for s in range(n):
        dist = _bfs_dists(adj, s, n)
        r1 = len(dist) - 1
        sumd = sum(dist.values())
        close[s] = round(r1 / sumd, 6) if sumd > 0 else 0.0
        h = sum(1.0 / d for d in dist.values() if d > 0)
        harm[s] = round(h / (n - 1), 6) if n > 1 else 0.0

    g = _graph(spark, n, edges)
    got_c = {r["node_id"]: r["score"] for r in closeness(g).collect()}
    got_h = {r["node_id"]: r["score"] for r in harmonic(g).collect()}
    assert got_c == pytest.approx(close, abs=1e-6)
    assert got_h == pytest.approx(harm, abs=1e-6)


# -- local clustering coefficient vs brute force ------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_lcc_matches_brute_force(spark, data):
    from graph_data_science_spark.operators.triangle import (
        local_clustering_coefficient,
    )

    n, edges = data
    und = {frozenset(e) for e in edges}
    nbrs = {v: set() for v in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    for v in range(n):
        d = len(nbrs[v])
        if d < 2:
            expect[v] = 0.0
            continue
        t = sum(1 for a, b in itertools.combinations(sorted(nbrs[v]), 2)
                if frozenset((a, b)) in und)
        expect[v] = 2.0 * t / (d * (d - 1))

    got = {r["node_id"]: r["lcc"]
           for r in local_clustering_coefficient(_graph(spark, n, edges)).collect()}
    assert got == pytest.approx(expect, abs=1e-9)


# -- nodeSimilarity (exact jaccard) vs brute force ----------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_node_similarity_matches_brute_force(spark, data):
    from graph_data_science_spark.operators.similarity import node_similarity

    n, edges = data
    out = {v: set() for v in range(n)}
    for a, b in edges:
        out[a].add(b)
    expect = {}
    for a in range(n):
        if not out[a]:
            continue
        scored = []
        for b in range(n):
            if b == a or not out[b]:
                continue
            inter = len(out[a] & out[b])
            if inter == 0:
                continue
            sim = round(inter / len(out[a] | out[b]), 6)
            scored.append((-sim, b))
        for rank, (neg, b) in enumerate(sorted(scored)):
            if rank < 10:
                expect[(a, b)] = -neg

    got = {(r["node1"], r["node2"]): r["similarity"]
           for r in node_similarity(
               _graph(spark, n, edges),
               max_neighbor_frequency=None).collect()}
    assert got == pytest.approx(expect, abs=1e-9)


# -- HITS vs numpy power iteration --------------------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_hits_matches_numpy(spark, data):
    import numpy as np
    from graph_data_science_spark.operators.hits import hits

    n, edges = data
    A = np.zeros((n, n))
    for a, b in edges:
        A[a, b] = 1.0
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(20):
        auth = A.T @ hub
        na = np.linalg.norm(auth)
        auth = auth / na if na > 0 else auth * 0.0
        hub = A @ auth
        nh = np.linalg.norm(hub)
        hub = hub / nh if nh > 0 else hub * 0.0

    res = hits(_graph(spark, n, edges)).scores.collect()
    got_h = {r["node_id"]: r["hub"] for r in res}
    got_a = {r["node_id"]: r["auth"] for r in res}
    assert got_h == pytest.approx({v: hub[v] for v in range(n)}, abs=1e-6)
    assert got_a == pytest.approx({v: auth[v] for v in range(n)}, abs=1e-6)


# -- delta-stepping vs python Bellman-Ford (weighted, random deltas) ----------

@st.composite
def weighted_edge_lists(draw):
    n, edges = draw(edge_lists())
    ws = draw(st.lists(
        st.sampled_from([0.25, 0.5, 1.0, 1.5, 2.0, 3.0, 7.5]),
        min_size=len(edges), max_size=len(edges)))
    return n, [(a, b, w) for (a, b), w in zip(edges, ws)]


@given(data=weighted_edge_lists(),
       delta=st.sampled_from([0.5, 2.0, 4.0]))
@settings(**SETTINGS)
def test_delta_stepping_matches_bellman_ford_property(spark, data, delta):
    from graph_data_science_spark.operators.paths import shortest_paths_delta

    n, edges = data
    ref = {i: float("inf") for i in range(n)}
    ref[0] = 0.0
    for _ in range(n):  # python Bellman-Ford
        for a, b, w in edges:
            if ref[a] + w < ref[b]:
                ref[b] = ref[a] + w

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    g = Graph(nodes=nodes, edges=spark.createDataFrame(
        edges, "src long, dst long, weight double"))
    res = shortest_paths_delta(g, source=0, delta=delta)
    assert res.converged
    got = {r["node_id"]: r["distance"] for r in res.distances.collect()}
    for i in range(n):
        assert abs(got[i] - ref[i]) < 1e-9 or (got[i] == ref[i] == float("inf")), \
            f"node {i}: {got[i]} vs {ref[i]} (delta={delta})"
