"""CSR gather-scatter mode vs join mode: identical semantics."""

import pytest

from graph_data_science_spark.graph import Graph, edges_from_tuples
from graph_data_science_spark.operators.pagerank import pagerank
from tests.fixtures import (
    F1_EDGES, F1_EXPECTED, F1_NODES,
    F2_EDGES, F2_EXPECTED_UNWEIGHTED, F2_EXPECTED_WEIGHTED, F2_NODES,
)


def _graph(spark, edges, nodes, weighted=False):
    e = edges_from_tuples(spark, edges, weighted=weighted)
    n = spark.createDataFrame([(i,) for i in nodes], "node_id long")
    return Graph(nodes=n, edges=e)


def _scores(res):
    return {r["node_id"]: r["score"] for r in res.scores.collect()}


def test_csr_f1_goldens(spark):
    g = _graph(spark, F1_EDGES, F1_NODES)
    got = _scores(pagerank(g, tolerance=0.0, max_iterations=41, mode="csr"))
    for node, want in F1_EXPECTED.items():
        assert got[node] == pytest.approx(want, abs=1e-5)


def test_csr_weighted_goldens(spark):
    g = _graph(spark, F2_EDGES, F2_NODES, weighted=True)
    got = _scores(pagerank(g, weighted=True, mode="csr"))
    for node, want in F2_EXPECTED_WEIGHTED.items():
        assert got[node] == pytest.approx(want, abs=1e-6)


def test_csr_matches_join_mode_closely(spark):
    g = _graph(spark, F2_EDGES, F2_NODES, weighted=True)
    a = _scores(pagerank(g, mode="join"))
    b = _scores(pagerank(g, mode="csr"))
    for k in a:
        assert b[k] == pytest.approx(a[k], abs=1e-12)
    for node, want in F2_EXPECTED_UNWEIGHTED.items():
        assert b[node] == pytest.approx(want, abs=1e-6)


def test_csr_personalized(spark):
    g = _graph(spark, F2_EDGES, F2_NODES, weighted=True)
    got = _scores(pagerank(g, source_nodes=[0], tolerance=0.0,
                           max_iterations=2, mode="csr"))
    assert got[0] == pytest.approx(0.15)
    for nb in (1, 2, 3):
        assert got[nb] == pytest.approx(0.85 * 0.05)


def test_csr_rejects_checkpoint(spark):
    g = _graph(spark, F1_EDGES, F1_NODES)
    with pytest.raises(ValueError, match="join"):
        pagerank(g, mode="csr", checkpoint_dir="/tmp/x")


def test_pagerank_csr_unknown_source_nodes_dropped(spark):
    """Unknown personalized sources are dropped (join-mode parity), never
    seeded onto the insertion-point node or crashed on out-of-range ids."""
    from graph_data_science_spark.graph import Graph
    from graph_data_science_spark.operators.pagerank import pagerank

    nodes = spark.createDataFrame([(0,), (2,), (4,)], "node_id long")
    edges = spark.createDataFrame([(0, 2), (2, 4)], "src long, dst long")
    g = Graph(nodes=nodes, edges=edges)
    # 3 is absent (mid-range), 99 is absent (out of range)
    for srcs in ([2, 3], [2, 99]):
        csr = {r["node_id"]: r["score"]
               for r in pagerank(g, source_nodes=srcs, mode="csr").scores.collect()}
        join = {r["node_id"]: r["score"]
                for r in pagerank(g, source_nodes=srcs, mode="join").scores.collect()}
        assert csr == pytest.approx(join, abs=1e-9)
