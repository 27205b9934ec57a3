"""splitRelationships: holdout/remaining partition + negative sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges
from graph_data_science_spark.ml.splitting import split_relationships


def _ring(spark, n=40):
    edges = [(i, (i + 1) % n) for i in range(n)]
    return graph_from_edges(spark, edges_from_tuples(spark, edges))


def _pairs(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_partition_is_exact_and_disjoint(spark):
    g = _ring(spark)
    res = split_relationships(g, holdout_fraction=0.3, seed=1)
    hold = _pairs(res.selected.where("label = 1.0"))
    rem = _pairs(res.remaining)
    assert hold | rem == _pairs(g.edges)
    assert hold & rem == set()
    assert res.n_holdout == len(hold)
    # binomial around the fraction, not degenerate
    assert 0 < len(hold) < 40


def test_negatives_are_nonedges_with_requested_ratio(spark):
    g = _ring(spark)
    res = split_relationships(
        g, holdout_fraction=0.3, negative_sampling_ratio=1.0, seed=1)
    neg = _pairs(res.selected.where("label = 0.0"))
    assert len(neg) == res.n_negative > 0
    true_edges = _pairs(g.edges)
    for s, d in neg:
        assert s != d
        assert (s, d) not in true_edges and (d, s) not in true_edges


def test_deterministic_and_layout_stable(spark):
    g = _ring(spark)
    a = split_relationships(g, holdout_fraction=0.25, seed=9)
    # same edges, different physical layout
    g2 = graph_from_edges(spark, g.edges.repartition(13), g.nodes)
    b = split_relationships(g2, holdout_fraction=0.25, seed=9)
    assert _pairs(a.selected) == _pairs(b.selected)
    assert _pairs(a.remaining) == _pairs(b.remaining)
    # a different seed migrates edges
    c = split_relationships(g, holdout_fraction=0.25, seed=10)
    assert _pairs(c.selected.where("label = 1.0")) != _pairs(
        a.selected.where("label = 1.0"))


def test_undirected_keeps_mirrored_edges_together(spark):
    n = 30
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(d, s) for s, d in edges]  # both directions materialized
    g = graph_from_edges(spark, edges_from_tuples(spark, edges))
    res = split_relationships(g, holdout_fraction=0.4, seed=3,
                              undirected=True)
    hold = _pairs(res.selected.where("label = 1.0"))
    rem = _pairs(res.remaining)
    for s, d in hold:
        assert (d, s) in hold, "mirror fell in a different split"
    for s, d in rem:
        assert (d, s) in rem


def test_zero_ratio_yields_no_negatives(spark):
    res = split_relationships(_ring(spark), holdout_fraction=0.3,
                              negative_sampling_ratio=0.0, seed=1)
    assert res.n_negative == 0
    assert res.selected.where("label = 0.0").count() == 0


def test_invalid_fraction_rejected(spark):
    with pytest.raises(ValueError):
        split_relationships(_ring(spark), holdout_fraction=1.0)
