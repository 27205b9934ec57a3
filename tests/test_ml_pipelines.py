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


def test_linreg_fits_exact_linear_target(spark):
    from graph_data_science_spark.ml.pipelines import linreg_fit
    # y = 2·x0 − 3·x1 + 0.5 exactly — GD should drive MSE near 0
    rows = [([i / 10.0, (i % 5) / 5.0],
             2.0 * (i / 10.0) - 3.0 * ((i % 5) / 5.0) + 0.5)
            for i in range(30)]
    ex = spark.createDataFrame(rows, "x array<double>, y double")
    # lr must stay under 2/λ_max of the 2/n·XᵀX Hessian (~0.25 here);
    # 0.1 converges to MSE ≈ 2.4e-3 in 200 iterations (numpy-verified)
    m = linreg_fit(ex, dim=2, iterations=200, learning_rate=0.1)
    assert m.history[-1] < 0.01
    assert m.history[-1] < m.history[0]
    m2 = linreg_fit(ex, dim=2, iterations=200, learning_rate=0.1)
    assert m.weights == m2.weights  # deterministic


def test_node_regression_pipeline(spark):
    from graph_data_science_spark.ml.pipelines import node_regression_pipeline
    g = _two_cluster_graph(spark)
    nodes = [r["node_id"] for r in g.nodes.collect()]
    # target correlated with cluster membership
    targets = spark.createDataFrame(
        [(v, 10.0 if v >= 20 else -10.0) for v in nodes],
        "node_id long, target double")
    res = node_regression_pipeline(g, targets, embedding_dim=8,
                                   iterations=60, learning_rate=0.2,
                                   holdout=0.3, seed=4)
    assert res.test_predictions.count() > 0
    assert res.model.history[-1] < res.model.history[0]
    assert res.test_rmse < 10.0  # better than predicting the mean of ±10
