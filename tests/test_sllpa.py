"""SLLPA (speaker-listener LPA, overlapping communities) invariants.

The reference algorithm (SpeakerListenerLPA.java) is randomized; this
engine's variant draws the spoken memory slot from a seeded edge hash, so
results are deterministic — tests assert the structural invariants that
hold for ANY draw sequence plus exact determinism across runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import (
    UNDIRECTED,
    edges_from_tuples,
    graph_from_edges,
)
from graph_data_science_spark.operators.sllpa import sllpa


def _communities(df):
    return {r["node_id"]: list(r["community_ids"]) for r in df.collect()}


def _two_triangles(spark):
    # two disjoint triangles {0,1,2} and {10,11,12}
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    return graph_from_edges(
        spark, edges_from_tuples(spark, edges)).oriented(UNDIRECTED)


def test_labels_never_cross_components(spark):
    got = _communities(sllpa(_two_triangles(spark), max_iterations=8).communities)
    assert set(got) == {0, 1, 2, 10, 11, 12}
    for node, comms in got.items():
        assert comms, f"node {node} pruned to no community"
        pool = {0, 1, 2} if node < 10 else {10, 11, 12}
        assert set(comms) <= pool, (node, comms)
    # community ids are sorted ascending (canonical output order)
    for comms in got.values():
        assert comms == sorted(comms)


def test_isolated_node_votes_for_itself(spark):
    edges = edges_from_tuples(spark, [(0, 1), (1, 0)])
    nodes = spark.createDataFrame([(0,), (1,), (99,)], "node_id long")
    g = graph_from_edges(spark, edges, nodes)
    got = _communities(sllpa(g, max_iterations=6).communities)
    assert got[99] == [99]


def test_deterministic_across_runs(spark):
    g = _two_triangles(spark)
    a = _communities(sllpa(g, max_iterations=8, seed=7).communities)
    b = _communities(sllpa(g, max_iterations=8, seed=7).communities)
    assert a == b


def test_association_strength_monotone(spark):
    g = _two_triangles(spark)
    loose = _communities(sllpa(g, max_iterations=8,
                               min_association_strength=0.0).communities)
    tight = _communities(sllpa(g, max_iterations=8,
                               min_association_strength=0.4).communities)
    for node in loose:
        assert set(tight[node]) <= set(loose[node])


def test_bridge_node_can_overlap(spark):
    # two 4-cliques joined through node 100; the union of all memberships
    # must mention both cliques' label pools
    a = [(i, j) for i in range(4) for j in range(4) if i != j]
    b = [(10 + i, 10 + j) for i in range(4) for j in range(4) if i != j]
    bridge = [(0, 100), (100, 0), (10, 100), (100, 10)]
    g = graph_from_edges(
        spark, edges_from_tuples(spark, a + b + bridge))
    got = _communities(sllpa(g, max_iterations=12,
                             min_association_strength=0.1).communities)
    assert set(got[100]) <= {0, 1, 2, 3, 10, 11, 12, 13, 100}
    # the bridge node hears both cliques equally and must OVERLAP: its
    # memberships mention both label pools (the unbiased hash tie-break is
    # what makes this possible — a min-label rule would always pick clique a)
    assert set(got[100]) & {0, 1, 2, 3}
    assert set(got[100]) & {10, 11, 12, 13}
    # clique members keep labels from their own clique only (+ the bridge)
    for i in range(1, 4):
        assert set(got[i]) <= {0, 1, 2, 3, 100}
        assert set(got[10 + i]) <= {10, 11, 12, 13, 100}


def test_rejects_single_iteration(spark):
    with pytest.raises(ValueError):
        sllpa(_two_triangles(spark), max_iterations=1)
