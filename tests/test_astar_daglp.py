"""A* (heuristic bound-pruned) + dag.longestPath.

A* fixture = the reference's Singapore→Chiba route graph
(algo/src/test/java/org/neo4j/gds/paths/astar/AStarTest.java:80-120):
two branches from nB — the northern one is optimal (2979 NM); the southern
(via Karimata/Lombok) heads AWAY from Chiba, which is exactly what the
haversine heuristic prunes. The test asserts BOTH the reference's expected
path/cost AND that pruning explores strictly fewer states than the
dijkstra fixpoint — the property the round-2 astar (a dijkstra alias)
lacked.
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.operators.paths import (
    astar, dag_longest_path, dijkstra)

# node ids: A..P = 0..15, X (CHIBA) = 16 — reference AStarTest.java DB_CYPHER
ASTAR_NODES = [
    (0, 1.304444, 103.717373),    # nA SINGAPORE
    (1, 1.1892, 103.4689),        # nB SINGAPORE STRAIT
    (2, 8.83055556, 111.8725),    # nC WAYPOINT 68
    (3, 10.82916667, 113.9722222),  # nD WAYPOINT 70
    (4, 11.9675, 115.2366667),    # nE WAYPOINT 74
    (5, 16.0728, 119.6128),       # nF SOUTH CHINA SEA
    (6, 20.5325, 121.845),        # nG LUZON STRAIT
    (7, 29.32611111, 131.2988889),  # nH WAYPOINT 87
    (8, -2.0428, 108.6225),       # nI KARIMATA STRAIT
    (9, -8.3256, 115.8872),       # nJ LOMBOK STRAIT
    (10, -8.5945, 116.6867),      # nK SUMBAWA STRAIT
    (11, -8.2211, 125.2411),      # nL KOLANA AREA
    (12, -1.8558, 126.5572),      # nM EAST MANGOLE
    (13, 3.96861111, 128.3052778),  # nN WAYPOINT 88
    (14, 12.76305556, 131.2980556),  # nO WAYPOINT 89
    (15, 22.32027778, 134.700000),  # nP WAYPOINT 90
    (16, 35.562222, 140.059187),  # nX CHIBA
]
ASTAR_EDGES = [
    (0, 1, 29.0), (1, 2, 694.0), (2, 3, 172.0), (3, 4, 101.0),
    (4, 5, 357.0), (5, 6, 299.0), (6, 7, 740.0), (7, 16, 587.0),
    (1, 8, 389.0), (8, 9, 584.0), (9, 10, 82.0), (10, 11, 528.0),
    (11, 12, 391.0), (12, 13, 364.0), (13, 14, 554.0), (14, 15, 603.0),
    (15, 16, 847.0),
]


@pytest.fixture()
def route_graph(spark):
    nodes = spark.createDataFrame(
        ASTAR_NODES, "node_id long, latitude double, longitude double")
    edges = spark.createDataFrame(ASTAR_EDGES, "src long, dst long, weight double")
    return Graph(nodes=nodes, edges=edges)


def test_astar_reference_path(route_graph):
    res = astar(route_graph, source=0, target=16, weighted=True,
                latitude_property="latitude", longitude_property="longitude")
    rows = res.paths.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["total_cost"] == pytest.approx(2979.0)
    # reference expected: nA nB nC nD nE nF nG nH nX
    assert r["node_ids"] == [0, 1, 2, 3, 4, 5, 6, 7, 16]
    assert r["costs"] == pytest.approx(
        [0.0, 29.0, 723.0, 895.0, 996.0, 1353.0, 1652.0, 2392.0, 2979.0])
    assert r["path"] == "0->1->2->3->4->5->6->7->16"


def test_astar_prunes_vs_dijkstra(route_graph):
    """The heuristic must reduce EXPLORED STATES, not just match output.

    The southern branch's f = g + h exceeds the target bound once the
    northern path settles, so its tail is never expanded; fixpoint dijkstra
    relaxes every reachable node to its final distance."""
    dj = dijkstra(route_graph, source=0, weighted=True, targets=[16])
    a_h = astar(route_graph, source=0, target=16, weighted=True,
                latitude_property="latitude", longitude_property="longitude")
    a_0 = astar(route_graph, source=0, target=16, weighted=True)
    assert a_h.explored_states < dj.explored_states
    # h=0 bound pruning can never explore MORE than the heuristic-less bound
    assert a_h.explored_states <= a_0.explored_states
    # all three agree on the result
    for res in (a_h, a_0):
        assert res.paths.first()["total_cost"] == pytest.approx(2979.0)


def test_astar_requires_both_coordinates(route_graph):
    with pytest.raises(ValueError, match="go together"):
        astar(route_graph, 0, 16, latitude_property="latitude")
    with pytest.raises(ValueError, match="has not been loaded"):
        astar(route_graph, 0, 16, latitude_property="nope",
              longitude_property="longitude")
    with pytest.raises(ValueError, match="not in graph"):
        astar(route_graph, 0, 999)


def test_astar_unreachable_target(spark):
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")
    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    res = astar(g, source=0, target=2, weighted=True)
    assert res.paths.count() == 0


# -- dag.longestPath ----------------------------------------------------------

def test_dag_longest_path_weighted_reference_fixture(spark):
    """WeightedDagLongestPathTest.java basic fixture: n0-8->n1, n0-5->n2,
    n2-2->n1, n3-8->n0 → longest to n1 = 3→0→2→1 = 15."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 8.0), (0, 2, 5.0), (2, 1, 2.0), (3, 0, 8.0)],
        "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    out = {r["node_id"]: (r["dist"], r["pred"])
           for r in dag_longest_path(g, weighted=True).collect()}
    assert out[3] == (0.0, 3)          # root
    assert out[0] == (8.0, 3)
    assert out[2] == (13.0, 0)
    assert out[1] == (16.0, 0)         # 3→0→1 = 8+8 beats 3→0→2→1 = 15


def test_dag_longest_path_unweighted_equals_dag_levels(spark):
    from graph_data_science_spark.operators.paths import dag_levels
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 1.0), (3, 4, 1.0), (4, 2, 1.0)],
        "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    lp = {r["node_id"]: r["dist"]
          for r in dag_longest_path(g, weighted=False).collect()}
    lv = {r["node_id"]: r["level"] for r in dag_levels(g).collect()}
    assert lp == {k: float(v) for k, v in lv.items()}


def test_dag_longest_path_cycle_raises(spark):
    nodes = spark.createDataFrame([(0,), (1,)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    with pytest.raises(ValueError, match="cycle"):
        dag_longest_path(g, max_iterations=8)


def test_dag_longest_path_pred_tie_breaks_smaller(spark):
    # two preds offer the same max distance — smaller id wins
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 2, 3.0), (1, 2, 3.0), (2, 3, 1.0)],
        "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    out = {r["node_id"]: (r["dist"], r["pred"])
           for r in dag_longest_path(g).collect()}
    assert out[2] == (3.0, 0)
    assert out[3] == (4.0, 2)


def test_dag_longest_path_zero_weight_cycle_raises(spark):
    """A zero-total-weight cycle never improves dist; detection rides the
    tracked hop count (strictly growing around the cycle)."""
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 0.0), (1, 0, 0.0), (0, 2, 1.0)],
        "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    with pytest.raises(ValueError, match="cycle"):
        dag_longest_path(g, weighted=True, max_iterations=8)


def test_dag_longest_path_rejects_negative_weights(spark):
    nodes = spark.createDataFrame([(0,), (1,)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, -2.0)], "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    with pytest.raises(ValueError, match="non-negative"):
        dag_longest_path(g, weighted=True)


def test_astar_null_intermediate_coordinates_degrade_to_h0(spark):
    """A NULL lat/lon on an intermediate node must not silently drop it from
    the frontier (h falls back to 0, which is always admissible)."""
    nodes = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, None, None), (2, 0.2, 0.2)],
        "node_id long, latitude double, longitude double")
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    res = astar(g, 0, 2, latitude_property="latitude",
                longitude_property="longitude")
    row = res.paths.first()
    assert row["total_cost"] == 2.0
    assert list(row["node_ids"]) == [0, 1, 2]


def test_astar_null_target_coordinates_raise(spark):
    nodes = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, None, None)],
        "node_id long, latitude double, longitude double")
    edges = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    with pytest.raises(ValueError, match="NULL"):
        astar(g, 0, 1, latitude_property="latitude",
              longitude_property="longitude")


def test_topological_sort_validity_and_determinism(spark):
    from graph_data_science_spark.operators.paths import topological_sort
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 1.0), (3, 4, 1.0), (4, 2, 1.0),
         (5, 6, 1.0)],
        "src long, dst long, weight double")
    g = Graph(nodes=nodes, edges=edges)
    out = topological_sort(g)
    ranks = {r["node_id"]: r["topo_rank"] for r in out.collect()}
    # a permutation of 0..n-1
    assert sorted(ranks.values()) == list(range(7))
    # valid dependency order: every edge goes forward
    for s, d in [(0, 1), (1, 2), (0, 3), (3, 4), (4, 2), (5, 6)]:
        assert ranks[s] < ranks[d]
    # canonical (level, node_id) order: level-0 nodes {0,5} rank first by id
    assert ranks[0] == 0 and ranks[5] == 1
    # layout-independent
    g2 = Graph(nodes=nodes.repartition(5), edges=edges.repartition(3))
    ranks2 = {r["node_id"]: r["topo_rank"]
              for r in topological_sort(g2).collect()}
    assert ranks2 == ranks


def test_topological_sort_cycle_raises(spark):
    from graph_data_science_spark.operators.paths import topological_sort
    nodes = spark.createDataFrame([(i,) for i in range(3)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double")
    with pytest.raises(ValueError, match="cycle"):
        topological_sort(Graph(nodes=nodes, edges=edges), max_iterations=10)
