"""HITS, modularity, conductance, collapsePath, RWR sampling."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import Graph, edges_from_tuples, graph_from_edges
from graph_data_science_spark.operators.community_metrics import (
    conductance,
    modularity,
    total_modularity,
)
from graph_data_science_spark.operators.hits import hits
from graph_data_science_spark.operators.walking import collapse_path, sample_rwr
from tests.conftest import rows_to_dict


def test_hits_bipartite(spark):
    # hubs 0,1 point at authorities 10,11 — symmetric: equal hubs, equal auths
    edges = edges_from_tuples(spark, [(0, 10), (0, 11), (1, 10), (1, 11)])
    g = graph_from_edges(spark, edges)
    res = hits(g, hits_iterations=10)
    rows = {r["node_id"]: (r["hub"], r["auth"]) for r in res.scores.collect()}
    assert rows[0][0] == pytest.approx(rows[1][0], abs=1e-12)
    assert rows[10][1] == pytest.approx(rows[11][1], abs=1e-12)
    assert rows[0][0] == pytest.approx(1 / math.sqrt(2), abs=1e-9)
    assert rows[10][1] == pytest.approx(1 / math.sqrt(2), abs=1e-9)
    assert rows[10][0] == 0.0 and rows[0][1] == 0.0


def test_hits_asymmetric(spark):
    # node 2 pointed at by both hubs; node 3 by one → auth(2) > auth(3)
    edges = edges_from_tuples(spark, [(0, 2), (1, 2), (1, 3)])
    res = hits(graph_from_edges(spark, edges), hits_iterations=15)
    rows = {r["node_id"]: r for r in res.scores.collect()}
    assert rows[2]["auth"] > rows[3]["auth"]
    assert rows[1]["hub"] > rows[0]["hub"]


@pytest.fixture()
def two_cliques(spark):
    c1 = [(0, 1), (1, 2), (0, 2)]
    c2 = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    g = graph_from_edges(spark, edges_from_tuples(spark, c1 + c2 + bridge))
    comm = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node_id long, community long")
    return g, comm


def test_modularity_two_cliques(spark, two_cliques):
    g, comm = two_cliques
    per = rows_to_dict(modularity(g, comm), "community", "modularity")
    # hand-computed: m=7, e_c=3, K_c=7 each → 3/7 - (7/14)^2 = 0.178571...
    want = 3 / 7 - 0.25
    assert per[0] == pytest.approx(want, abs=1e-12)
    assert per[1] == pytest.approx(want, abs=1e-12)
    assert total_modularity(g, comm) == pytest.approx(2 * want, abs=1e-12)


def test_modularity_single_community_zero(spark):
    g = graph_from_edges(spark, edges_from_tuples(spark, [(0, 1), (1, 2)]))
    comm = spark.createDataFrame([(i, 7) for i in range(3)], "node_id long, community long")
    assert total_modularity(g, comm) == pytest.approx(0.0, abs=1e-12)


def test_conductance_two_cliques(spark, two_cliques):
    g, comm = two_cliques
    per = rows_to_dict(conductance(g, comm), "community", "conductance")
    # cut=1, vol(c)=7, total_vol=14 → min(7, 7)=7 → 1/7
    assert per[0] == pytest.approx(1 / 7, abs=1e-12)
    assert per[1] == pytest.approx(1 / 7, abs=1e-12)


def test_collapse_path_two_hops(spark):
    edges = edges_from_tuples(spark, [(0, 1), (1, 2), (2, 3), (1, 4)])
    g = graph_from_edges(spark, edges)
    got = {tuple(r) for r in collapse_path(g, 2).collect()}
    assert got == {(0, 2), (0, 4), (1, 3)}
    got3 = {tuple(r) for r in collapse_path(g, 3).collect()}
    assert got3 == {(0, 3)}


def test_sample_rwr_deterministic_and_connected(spark):
    edges = edges_from_tuples(spark, [(i, i + 1) for i in range(20)])
    g = graph_from_edges(spark, edges)
    a = {r["node_id"] for r in sample_rwr(g, [0], rounds=8, accept_prob=0.7).collect()}
    b = {r["node_id"] for r in sample_rwr(g, [0], rounds=8, accept_prob=0.7).collect()}
    assert a == b
    assert 0 in a and len(a) > 1
    # sample only contains nodes reachable from the start
    assert all(n <= 20 for n in a)
