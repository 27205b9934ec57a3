"""Random forest + MLP classifiers: nonlinear separation (beyond logreg),
determinism, pipeline integration."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml.forest import (
    random_forest_fit,
    random_forest_predict,
)
from graph_data_science_spark.ml.mlp import mlp_fit, mlp_predict
from graph_data_science_spark.operators.graphsage import _py_u01


def _xor(spark, n=200):
    """XOR quadrants — linearly inseparable, hash-jittered, deterministic."""
    rows = []
    for i in range(n):
        qx = 1 if _py_u01("qx", i) < 0.5 else 0
        qy = 1 if _py_u01("qy", i) < 0.5 else 0
        x = qx * 2.0 - 1.0 + (_py_u01("jx", i) - 0.5) * 0.8
        y = qy * 2.0 - 1.0 + (_py_u01("jy", i) - 0.5) * 0.8
        rows.append((i, [x, y], qx ^ qy))
    return spark.createDataFrame(rows, "id long, x array<double>, y int")


@pytest.fixture(scope="module")
def xor_df(spark):
    return _xor(spark).localCheckpoint(eager=True)


def test_random_forest_learns_xor(spark, xor_df):
    model = random_forest_fit(xor_df, n_trees=8, max_depth=4, seed=1)
    preds = random_forest_predict(xor_df.select("id", "x"), model)
    acc = (preds.join(xor_df.select("id", "y"), "id")
           .select(F.avg((F.col("predicted") == F.col("y")).cast("double")))
           .first()[0])
    assert acc > 0.9  # a linear model caps near 0.5 on XOR


def test_random_forest_deterministic(spark, xor_df):
    m1 = random_forest_fit(xor_df, n_trees=4, max_depth=3, seed=7)
    m2 = random_forest_fit(xor_df, n_trees=4, max_depth=3, seed=7)
    assert m1.splits == m2.splits
    assert (m1.mins, m1.steps) == (m2.mins, m2.steps)


def test_random_forest_single_class_all_leaves(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0], 0) for i in range(10)],
        "id long, x array<double>, y int")
    model = random_forest_fit(df, n_trees=2, max_depth=3, seed=1)
    # pure nodes never split
    assert all(v[0] == "leaf" and v[1] == 0 for v in model.splits.values())
    preds = random_forest_predict(df.select("id", "x"), model)
    assert all(r["predicted"] == 0 for r in preds.collect())


def test_mlp_learns_xor_and_loss_descends(spark, xor_df):
    model = mlp_fit(xor_df, hidden=8, iterations=120, learning_rate=1.5,
                    seed=2)
    assert model.history[-1] < model.history[0]
    preds = mlp_predict(xor_df.select("id", "x"), model)
    acc = (preds.join(xor_df.select("id", "y"), "id")
           .select(F.avg((F.col("predicted") == F.col("y")).cast("double")))
           .first()[0])
    assert acc > 0.85


def test_mlp_deterministic_across_partitionings(spark, xor_df):
    m1 = mlp_fit(xor_df, hidden=4, iterations=5, n_partitions=2, seed=3)
    m2 = mlp_fit(xor_df.repartition(7), hidden=4, iterations=5,
                 n_partitions=2, seed=3)
    assert (m1.w1, m1.w2, m1.history) == (m2.w1, m2.w2, m2.history)


def test_mlp_deterministic_with_multibatch_partitions(spark, xor_df):
    """A partition larger than arrow.maxRecordsPerBatch arrives as SEVERAL
    Arrow batches whose order depends on shuffle fetch order; the gradient
    must not depend on that order (partial() concatenates all batches and
    sorts the whole partition by id once). With 200 rows in 2 partitions and
    a 16-row batch cap, every partition spans ~7 batches."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "16")
        m1 = mlp_fit(xor_df, hidden=4, iterations=5, n_partitions=2, seed=3)
        m2 = mlp_fit(xor_df.repartition(13), hidden=4, iterations=5,
                     n_partitions=2, seed=3)
    finally:
        spark.conf.set(key, old)
    # single-batch reference: same data, same partitioning, no batch cap
    m3 = mlp_fit(xor_df, hidden=4, iterations=5, n_partitions=2, seed=3)
    assert (m1.w1, m1.w2, m1.history) == (m2.w1, m2.w2, m2.history)
    assert (m1.w1, m1.w2, m1.history) == (m3.w1, m3.w2, m3.history)


def test_pipeline_classifier_options(spark):
    from graph_data_science_spark.graph import (
        edges_from_tuples, graph_from_edges)
    from graph_data_science_spark.ml.pipelines import (
        node_classification_pipeline)

    # two 5-cliques joined by a bridge; labels = clique membership
    e = []
    for b in (0, 5):
        e += [(b + i, b + j) for i in range(5) for j in range(5) if i != j]
    e.append((4, 5))
    g = graph_from_edges(spark, edges_from_tuples(spark, e))
    labels = spark.createDataFrame(
        [(v, v // 5) for v in range(10)], "node_id long, label long")
    for clf in ("random_forest", "mlp"):
        res = node_classification_pipeline(
            g, labels, embedding_dim=8, iterations=20, holdout=0.3,
            seed=5, classifier=clf)
        assert res.test_predictions.count() > 0, clf
        assert 0.0 <= res.test_accuracy <= 1.0, clf
    with pytest.raises(ValueError):
        node_classification_pipeline(g, labels, classifier="nope")
