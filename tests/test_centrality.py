"""Betweenness / closeness / harmonic / allShortestPaths (MSBFS kernel)."""

import pytest

from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges
from graph_data_science_spark.operators.centrality import (
    all_shortest_paths,
    betweenness,
    closeness,
    harmonic,
    msbfs,
)
from tests.conftest import rows_to_dict


def test_betweenness_directed_path(spark):
    edges = edges_from_tuples(spark, [(0, 1), (1, 2), (2, 3)])
    g = graph_from_edges(spark, edges)
    got = rows_to_dict(betweenness(g), "node_id", "score")
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_betweenness_diamond_splits_flow(spark):
    edges = edges_from_tuples(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    g = graph_from_edges(spark, edges)
    got = rows_to_dict(betweenness(g), "node_id", "score")
    assert got == {0: 0.0, 1: 0.5, 2: 0.5, 3: 0.0}


def test_betweenness_sampled_subset(spark):
    edges = edges_from_tuples(spark, [(0, 1), (1, 2), (2, 3)])
    g = graph_from_edges(spark, edges)
    got = rows_to_dict(betweenness(g, sources=[0]), "node_id", "score")
    # only source 0's dependencies: delta(0,1)=2, delta(0,2)=1
    assert got == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}


def test_closeness_and_harmonic(spark):
    edges = edges_from_tuples(spark, [(0, 1), (1, 2), (2, 3)])
    g = graph_from_edges(spark, edges)
    c = rows_to_dict(closeness(g), "node_id", "score")
    assert c[0] == pytest.approx(3 / 6, abs=1e-6)
    assert c[3] == 0.0
    cw = rows_to_dict(closeness(g, wasserman_faust=True), "node_id", "score")
    assert cw[0] == pytest.approx((3 / 6) * (3 / 3), abs=1e-6)
    h = rows_to_dict(harmonic(g), "node_id", "score")
    assert h[0] == pytest.approx((1 + 0.5 + 1 / 3) / 3, abs=1e-6)
    assert h[3] == 0.0


def test_msbfs_sigma_counts_paths(spark):
    edges = edges_from_tuples(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    g = graph_from_edges(spark, edges)
    rows = {(r["s"], r["v"]): (r["dist"], r["sigma"])
            for r in msbfs(g, sources=[0]).collect()}
    assert rows[(0, 3)] == (2, 2.0)
    assert rows[(0, 1)] == (1, 1.0)
    assert rows[(0, 0)] == (0, 1.0)


def test_all_shortest_paths_rows(spark):
    edges = edges_from_tuples(spark, [(0, 1), (1, 2)])
    g = graph_from_edges(spark, edges)
    got = {(r["source_node"], r["target_node"]): r["distance"]
           for r in all_shortest_paths(g).collect()}
    assert got == {(0, 0): 0.0, (0, 1): 1.0, (0, 2): 2.0,
                   (1, 1): 0.0, (1, 2): 1.0, (2, 2): 0.0}
