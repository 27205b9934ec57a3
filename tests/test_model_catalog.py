"""Model catalog lifecycle (ModelCatalog.java surface): set/get/list/drop/
exists, JSON store/load round-trip, predict-by-name dispatch."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml.model_catalog import ModelCatalog
from graph_data_science_spark.ml.pipelines import LogRegModel, logreg_fit


def test_lifecycle(tmp_path):
    cat = ModelCatalog(store_location=str(tmp_path))
    m = LogRegModel(weights=[0.1, 0.2, 0.3], history=[1.0, 0.5])
    cat.set("my-model", "logistic_regression", m, {"trainedOn": "g1"})
    assert cat.exists("my-model") and not cat.exists("nope")
    assert cat.list() == [{"modelName": "my-model",
                           "modelType": "logistic_regression",
                           "trainedOn": "g1"}]
    with pytest.raises(ValueError, match="already exists"):
        cat.set("my-model", "logistic_regression", m)
    assert cat.get("my-model") is m
    cat.drop("my-model")
    assert not cat.exists("my-model")
    with pytest.raises(ValueError, match="does not exist"):
        cat.get("my-model")
    cat.drop("my-model", fail_if_missing=False)  # no raise


def test_store_load_roundtrip_logreg(tmp_path):
    cat = ModelCatalog(store_location=str(tmp_path))
    m = LogRegModel(weights=[0.5, -1.0], history=[0.7])
    cat.set("lr", "logistic_regression", m)
    path = cat.store("lr")
    cat2 = ModelCatalog(store_location=str(tmp_path))
    cat2.load_stored("lr")
    got = cat2.get("lr")
    assert isinstance(got, LogRegModel)
    assert got.weights == m.weights and got.history == m.history
    assert path.endswith("lr.json")


def test_store_load_roundtrip_forest(tmp_path):
    from graph_data_science_spark.ml.forest import RandomForestModel
    cat = ModelCatalog(store_location=str(tmp_path))
    m = RandomForestModel(n_features=2, n_classes=2, n_bins=4,
                          mins=[0.0, 0.0], steps=[0.25, 0.25])
    m.splits = {(0, 0): ("split", 1, 2), (0, 1): ("leaf", 0)}
    cat.set("rf", "random_forest", m)
    cat.store("rf")
    cat2 = ModelCatalog(store_location=str(tmp_path))
    cat2.load_stored("rf")
    got = cat2.get("rf")
    assert got.splits == {(0, 0): ("split", 1, 2), (0, 1): ("leaf", 0)}
    assert got.mins == m.mins and got.n_bins == 4


def test_predict_by_name_logreg(spark, tmp_path):
    # AND-ish data: y = x0 > 0.5
    rows = [(i, [float(i % 2), float((i // 2) % 2)], float(i % 2))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x array<double>, y double")
    model = logreg_fit(df, dim=2, iterations=30, learning_rate=0.5)
    cat = ModelCatalog()
    cat.set("clf", "logistic_regression", model)
    scored = cat.predict("clf", df)
    acc = scored.select(F.avg(((F.col("probability") >= 0.5).cast("double")
                               == F.col("y")).cast("double"))).first()[0]
    assert acc >= 0.9


def test_predict_by_name_graphsage(spark):
    from graph_data_science_spark.graph import Graph, edges_from_tuples
    from graph_data_science_spark.operators.graphsage import (
        degree_features, init_weights)
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node_id long")
    edges = edges_from_tuples(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    g = Graph(nodes=nodes, edges=edges)
    cat = ModelCatalog()
    cat.set("sage", "graphsage", init_weights([3, 4], seed=1))
    out = cat.predict("sage", g, degree_features(g), sample_sizes=[2], seed=1)
    assert out.count() == 5


def test_predict_unknown_type():
    cat = ModelCatalog()
    cat.set("x", "mystery", object())
    with pytest.raises(ValueError, match="no predict dispatch"):
        cat.predict("x")
