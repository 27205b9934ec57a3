"""Property tests: engine operators vs independent in-Python brute-force
references on RANDOM small graphs (hypothesis).

A different correctness axis than the DuckDB oracle gate: the gate runs
unrolled SQL twins of the same recurrences on fixed derived tables; these
properties run *algorithmically independent* references (union-find, heapq
Dijkstra, peeling, DP over a topological order, dense power iteration) on
randomized structure, so a systematic error shared by the Spark plan and
its SQL twin would still be caught here.

Examples are kept small (≤ 18 nodes / ≤ 50 edges) and few — each example
costs real Spark jobs; the value is structural randomness, not volume.
"""

from __future__ import annotations

import heapq
import itertools

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from graph_data_science_spark.graph import Graph

N_MAX = 18
SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic CI: same examples every run
)


@st.composite
def edge_lists(draw, weighted=False, acyclic=False):
    n = draw(st.integers(min_value=2, max_value=N_MAX))
    m = draw(st.integers(min_value=1, max_value=min(50, n * (n - 1) // 2)))
    pairs = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        min_size=m, max_size=m))
    edges = []
    seen = set()
    for a, b in pairs:
        if a == b:
            continue
        if acyclic:
            a, b = min(a, b), max(a, b)  # i<j ⇒ DAG by construction
        if (a, b) in seen:
            continue
        seen.add((a, b))
        if weighted:
            w = draw(st.integers(1, 9))  # integer weights: exact float sums
            edges.append((a, b, float(w)))
        else:
            edges.append((a, b))
    if not edges:
        edges = [(0, 1, 1.0)] if weighted else [(0, 1)]
    return n, edges


def _graph(spark, n, edges, weighted=False):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    schema = ("src long, dst long, weight double" if weighted
              else "src long, dst long")
    return Graph(nodes=nodes, edges=spark.createDataFrame(edges, schema))


# -- WCC vs union-find --------------------------------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_wcc_matches_union_find(spark, data):
    from graph_data_science_spark.operators.wcc import wcc

    n, edges = data
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # engine contract: component id = min member node id
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expect = {v: comp_min[find(v)] for v in range(n)}

    got = {r["node_id"]: r["component"]
           for r in wcc(_graph(spark, n, edges)).components.collect()}
    assert got == expect


# -- triangle count vs brute force -------------------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_triangle_count_matches_brute_force(spark, data):
    from graph_data_science_spark.operators.triangle import triangle_count

    n, edges = data
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    per_node = {v: 0 for v in range(n)}
    total = 0
    for a, b, c in itertools.combinations(range(n), 3):
        if ({frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= und):
            total += 1
            per_node[a] += 1
            per_node[b] += 1
            per_node[c] += 1

    res = triangle_count(_graph(spark, n, edges))
    assert res.global_count == total
    got = {r["node_id"]: r["triangles"] for r in res.per_node.collect()}
    assert got == per_node


# -- coreness vs peeling ------------------------------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_coreness_matches_peeling(spark, data):
    from graph_data_science_spark.operators.kcore import coreness

    n, edges = data
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in range(n)}
    core = dict(deg)
    alive = set(range(n))
    k = 0
    while alive:
        k += 1
        changed = True
        while changed:
            changed = False
            for v in list(alive):
                if deg[v] < k:
                    core[v] = k - 1
                    alive.discard(v)
                    for u in adj[v]:
                        if u in alive:
                            deg[u] -= 1
                    changed = True

    got = {r["node_id"]: r["core"]
           for r in coreness(_graph(spark, n, edges)).collect()}
    assert got == core


# -- dijkstra vs heapq --------------------------------------------------------

@given(data=edge_lists(weighted=True))
@settings(**SETTINGS)
def test_dijkstra_costs_match_heapq(spark, data):
    from graph_data_science_spark.operators.paths import dijkstra

    n, edges = data
    adj = {v: [] for v in range(n)}
    for a, b, w in edges:
        adj[a].append((b, w))
    dist = {0: 0.0}
    pq = [(0.0, 0)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, float("inf")):
            continue
        for u, w in adj[v]:
            nd = d + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))

    got = {r["target_node"]: r["total_cost"]
           for r in dijkstra(_graph(spark, n, edges, weighted=True),
                             source=0).paths.collect()}
    assert got == pytest.approx(dist)


# -- dag_longest_path vs DP over topological order ---------------------------

@given(data=edge_lists(weighted=True, acyclic=True))
@settings(**SETTINGS)
def test_dag_longest_path_matches_dp(spark, data):
    from graph_data_science_spark.operators.paths import dag_longest_path

    n, edges = data
    best = {v: 0.0 for v in range(n)}
    for a in range(n):            # edges go low→high: id order IS topological
        for (s, d, w) in edges:
            if s == a and best[s] + w > best[d]:
                best[d] = best[s] + w

    got = {r["node_id"]: r["dist"]
           for r in dag_longest_path(
               _graph(spark, n, edges, weighted=True), weighted=True).collect()}
    assert got == pytest.approx(best)


# -- pagerank vs dense delta-push power iteration ------------------------------

@given(data=edge_lists())
@settings(**SETTINGS)
def test_pagerank_matches_dense_delta_push(spark, data):
    import numpy as np
    from graph_data_science_spark.operators.pagerank import pagerank

    n, edges = data
    damping, tol, max_iter = 0.85, 1e-6, 12
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[a] += 1
    alpha = 1.0 - damping
    rank = np.full(n, alpha)
    delta = rank.copy()
    # GDS recurrence: initial superstep sends regardless of tolerance, then
    # max_iter-1 message rounds; senders need delta > tol (init: delta > 0)
    active = delta > 0.0
    for _ in range(max_iter - 1):
        if not active.any():
            break
        msg = np.zeros(n)
        for a, b in edges:
            if active[a] and outdeg[a] > 0:
                msg[b] += delta[a] / outdeg[a]
        delta = damping * msg
        rank = rank + delta
        active = delta > tol

    res = pagerank(_graph(spark, n, edges), tolerance=tol,
                   max_iterations=max_iter)
    got = {r["node_id"]: r["score"] for r in res.scores.collect()}
    assert got == pytest.approx({v: rank[v] for v in range(n)}, abs=1e-9)
