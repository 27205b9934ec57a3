"""Link prediction + node classification pipelines (logistic regression)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges
from graph_data_science_spark.ml.pipelines import (
    LogRegModel,
    link_prediction_pipeline,
    logreg_fit,
    node_classification_pipeline,
    predict_proba,
)


def test_logreg_learns_separable_data(spark):
    # y = 1 iff x0 > 0 — trivially separable
    rows = [([float(i) / 10.0 - 0.5, 1.0], 1.0 if i > 5 else 0.0)
            for i in range(11)]
    ex = spark.createDataFrame(rows, "x array<double>, y double")
    model = logreg_fit(ex, dim=2, iterations=40, learning_rate=1.0)
    assert model.history[-1] < model.history[0]  # loss decreases
    preds = predict_proba(ex, model).collect()
    acc = sum((r["probability"] >= 0.5) == (r["y"] == 1.0)
              for r in preds) / len(preds)
    assert acc >= 0.9


def test_logreg_deterministic(spark):
    rows = [([float(i), 1.0], float(i % 2)) for i in range(8)]
    ex = spark.createDataFrame(rows, "x array<double>, y double")
    m1 = logreg_fit(ex, dim=2, iterations=5)
    m2 = logreg_fit(ex, dim=2, iterations=5)
    assert m1.weights == m2.weights


def _two_cluster_graph(spark, size=8):
    # two dense clusters with one sparse cross link
    e = []
    for b in (0, 20):
        ids = list(range(b, b + size))
        e += [(a, c) for a in ids for c in ids if a < c]
    e += [(0, 20)]
    return graph_from_edges(spark, edges_from_tuples(spark, e))


def test_link_prediction_pipeline_runs_and_scores(spark):
    g = _two_cluster_graph(spark)
    res = link_prediction_pipeline(
        g, embedding_dim=8, iterations=60, learning_rate=2.0, seed=3)
    rows = res.test_predictions.collect()
    assert rows and all(0.0 <= r["probability"] <= 1.0 for r in rows)
    # trained hard on a separable fixture: loss must drop substantially and
    # the holdout must beat coin-flipping
    assert res.model.history[-1] < res.model.history[0] * 0.9
    assert res.test_accuracy >= 0.5


def test_node_classification_pipeline(spark):
    g = _two_cluster_graph(spark)
    labels = g.nodes.select(
        "node_id", (F.col("node_id") >= 10).cast("long").alias("label"))
    res = node_classification_pipeline(
        g, labels, embedding_dim=8, iterations=15, holdout=0.4, seed=5)
    assert set(res.models) == {0, 1}
    rows = res.test_predictions.collect()
    assert rows and all(r["predicted"] in (0, 1) for r in rows)
