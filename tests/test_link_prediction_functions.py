"""gds.alpha.linkprediction.* pair scorers vs hand-computed goldens.

Fixture graph (directed edge list; BOTH-direction neighbor sets):
    (0,1),(0,2),(1,2),(1,3),(2,3),(3,4)
N(0)={1,2} N(1)={0,2,3} N(2)={0,1,3} N(3)={1,2,4} N(4)={3}
rel-count degrees (both): 0→2, 1→3, 2→3, 3→3, 4→1
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.functions import link_prediction_scores
from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges

EDGES = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]


def _scores(spark, pairs, direction="both", community=None):
    g = graph_from_edges(spark, edges_from_tuples(spark, EDGES))
    if community is not None:
        comm = spark.createDataFrame(community, "node_id long, community long")
        g = g.with_node_property(comm, "community")
    df = link_prediction_scores(
        g, spark.createDataFrame(pairs, "src long, dst long"),
        direction=direction,
        community_col="community" if community is not None else None)
    return {(r["src"], r["dst"]): r.asDict() for r in df.collect()}


def test_both_direction_goldens(spark):
    s = _scores(spark, [(0, 3), (0, 4), (2, 2)])
    r = s[(0, 3)]
    assert r["common_neighbors"] == 2.0
    assert r["adamic_adar"] == pytest.approx(2 / math.log(3))
    assert r["resource_allocation"] == pytest.approx(2 / 3)
    assert r["preferential_attachment"] == 6.0
    assert r["total_neighbors"] == 3.0  # {1,2} ∪ {1,2,4}

    r = s[(0, 4)]
    assert r["common_neighbors"] == 0.0 and r["adamic_adar"] == 0.0
    assert r["preferential_attachment"] == 2.0
    assert r["total_neighbors"] == 3.0  # {1,2} ∪ {3}

    # identical nodes: empty common set (NeighborsFinder), union = N(2)
    r = s[(2, 2)]
    assert r["common_neighbors"] == 0.0
    assert r["total_neighbors"] == 3.0
    assert r["preferential_attachment"] == 9.0


def test_out_direction_uses_flipped_side(spark):
    # commonNeighbors(a,b) dir=OUT: N_out(a) ∩ {w : w →OUT→ b}
    s = _scores(spark, [(0, 2)], direction="out")
    r = s[(0, 2)]
    # N_out(0)={1,2}; {w: w→2}={0,1} → common={1}; deg_out(1)=2
    assert r["common_neighbors"] == 1.0
    assert r["adamic_adar"] == pytest.approx(1 / math.log(2))
    assert r["resource_allocation"] == pytest.approx(0.5)
    # deg_out(0)=2, deg_out(2)=1
    assert r["preferential_attachment"] == 2.0
    # totalNeighbors stays same-direction: |{1,2} ∪ {3}| = 3
    assert r["total_neighbors"] == 3.0


def test_same_community_property(spark):
    comm = [(0, 7), (1, 7), (2, 7), (3, 8)]  # node 4 has no property
    s = _scores(spark, [(0, 1), (0, 3), (0, 4)], community=comm)
    assert s[(0, 1)]["same_community"] == 1.0
    assert s[(0, 3)]["same_community"] == 0.0
    assert s[(0, 4)]["same_community"] == 0.0  # missing property → 0


def test_self_loop_counts_once_in_degree(spark):
    g = graph_from_edges(
        spark, edges_from_tuples(spark, [(5, 5), (5, 0), (0, 1)]))
    df = link_prediction_scores(
        g, g.edges.sparkSession.createDataFrame([(5, 1)], "src long, dst long"))
    r = df.collect()[0]
    # N(5)={0} (loop excluded), N(1)={0} → common {0}; deg(0)=out(0,1)+in(5,0)=2
    assert r["common_neighbors"] == 1.0
    assert r["resource_allocation"] == pytest.approx(1 / 2)
    # deg(5): out {(5,5),(5,0)} + in {} (loop not double-counted) = 2
    assert r["preferential_attachment"] == 2.0


def test_no_udf_in_plan(spark):
    g = graph_from_edges(spark, edges_from_tuples(spark, EDGES))
    plan = link_prediction_scores(
        g, spark.createDataFrame([(0, 3)], "src long, dst long")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
