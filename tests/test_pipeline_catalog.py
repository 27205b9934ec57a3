"""Named pipeline catalog: staged config, lifecycle, train-with-selection.

Reference parity targets: pipeline/.../PipelineCatalog.java (set/get/
exists/drop), proc/pipeline-catalog (list/exists/drop procs), and the
create→addNodeProperty→addFeature→configureSplit→add<Trainer>→train flow
of gds.beta.pipeline.* with candidate model selection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges
from graph_data_science_spark.ml.model_catalog import ModelCatalog
from graph_data_science_spark.ml.pipeline_catalog import PipelineCatalog


@pytest.fixture()
def pipes():
    return PipelineCatalog(model_catalog=ModelCatalog())


def _ring_graph(spark, n=40):
    edges = [(i, (i + 1) % n) for i in range(n)] + \
        [(i, (i + 7) % n) for i in range(n)]
    return graph_from_edges(spark, edges_from_tuples(spark, edges))


def test_staged_config_and_lifecycle(pipes):
    pipes.create("lp", "linkPrediction")
    assert pipes.exists("lp") and not pipes.exists("nope")
    with pytest.raises(ValueError):
        pipes.create("lp", "linkPrediction")  # duplicate name
    with pytest.raises(ValueError):
        pipes.create("x", "weird_kind")
    pipes.add_node_property("lp", "fastRP", {"embedding_dim": 8})
    with pytest.raises(ValueError):
        pipes.add_node_property("lp", "pageRank")  # unsupported step
    pipes.add_feature("lp", "hadamard")
    with pytest.raises(ValueError):
        pipes.add_feature("lp", "COSINE")
    pipes.configure_split("lp", holdout=0.3, negative_ratio=1.0)
    with pytest.raises(ValueError):
        pipes.configure_split("lp", holdout=1.5)
    pipes.add_logistic_regression("lp", learning_rate=0.5)
    rows = pipes.list()
    assert rows == [{"pipelineName": "lp", "pipelineType": "linkPrediction",
                     "nodePropertySteps": 1, "trainerCandidates": 1}]
    pipes.drop("lp")
    assert not pipes.exists("lp")
    with pytest.raises(ValueError):
        pipes.drop("lp")
    pipes.drop("lp", fail_if_missing=False)  # no-op


def test_trainer_kind_compatibility(pipes):
    pipes.create("nc", "nodeClassification")
    pipes.add_random_forest("nc", n_trees=4)
    pipes.add_mlp("nc", hidden=4)
    with pytest.raises(ValueError):
        pipes.add_linear_regression("nc")  # regression trainer on classifier
    pipes.create("lp", "linkPrediction")
    with pytest.raises(ValueError):
        pipes.add_random_forest("lp")  # LP supports logistic regression
    pipes.create("nr", "nodeRegression")
    with pytest.raises(ValueError):
        pipes.add_feature("nr", "hadamard")  # features are LP-only


def test_link_prediction_train_registers_model(spark, pipes):
    g = _ring_graph(spark)
    pipes.create("lp", "linkPrediction")
    pipes.add_node_property("lp", "fastRP", {"embedding_dim": 8})
    pipes.add_feature("lp", "hadamard")
    pipes.configure_split("lp", holdout=0.25)
    pipes.add_logistic_regression("lp", iterations=10)
    report = pipes.train("lp", g, model_name="lp-model", seed=7)
    assert report["modelName"] == "lp-model"
    assert report["winningMethod"] == "logistic_regression"
    assert 0.0 <= report["metric"] <= 1.0
    assert pipes.model_catalog.exists("lp-model")
    meta = pipes.model_catalog.list()[0]
    assert meta["pipeline"] == "lp" and meta["kind"] == "linkPrediction"


def test_node_classification_selection_and_predict_by_name(spark, pipes):
    g = _ring_graph(spark)
    labels = g.nodes.select(
        "node_id", (F.col("node_id") % 2).cast("long").alias("label"))
    pipes.create("nc", "nodeClassification")
    pipes.add_node_property("nc", "fastRP", {"embedding_dim": 8})
    pipes.add_logistic_regression("nc", iterations=8)
    pipes.add_random_forest("nc", n_trees=4, max_depth=3)
    report = pipes.train("nc", g, model_name="nc-model", targets=labels,
                         seed=7)
    assert len(report["candidates"]) == 2
    assert report["winningMethod"] in ("logistic_regression", "random_forest")
    best = max(c["metric"] for c in report["candidates"]
               if c["metric"] is not None)
    assert report["metric"] == best
    # predict-by-name closes the loop for the OVR winner too
    if report["winningMethod"] == "logistic_regression":
        from graph_data_science_spark.operators.embeddings import fastrp
        feat = fastrp(g, embedding_dim=8, seed=7) \
            .select("node_id", F.col("embedding").alias("x"))
        out = pipes.model_catalog.predict("nc-model", feat)
        assert set(out.columns) >= {"node_id", "predicted"}
        assert out.count() == g.node_count()


def test_node_regression_train_rmse_selection(spark, pipes):
    g = _ring_graph(spark)
    targets = g.nodes.select(
        "node_id", (F.col("node_id") * 0.1).cast("double").alias("target"))
    pipes.create("nr", "nodeRegression")
    pipes.add_node_property("nr", "fastRP", {"embedding_dim": 8})
    pipes.add_linear_regression("nr", iterations=10, learning_rate=0.05)
    pipes.add_linear_regression("nr", iterations=1, learning_rate=0.0)
    report = pipes.train("nr", g, model_name="nr-model", targets=targets,
                         seed=7)
    # lower RMSE wins; the zero-learning-rate candidate cannot beat training
    metrics = {tuple(sorted(c["params"].items())): c["metric"]
               for c in report["candidates"]}
    assert report["metric"] == min(m for m in metrics.values()
                                   if m is not None)
    from graph_data_science_spark.operators.embeddings import fastrp
    feat = targets.join(fastrp(g, embedding_dim=8, seed=7), "node_id") \
        .select("node_id", F.col("embedding").alias("x"))
    pred = pipes.model_catalog.predict("nr-model", feat)
    assert "predicted" in pred.columns and pred.count() == g.node_count()


def test_train_defaults_when_no_candidates(spark, pipes):
    g = _ring_graph(spark)
    pipes.create("lp", "linkPrediction")
    pipes.add_node_property("lp", "fastRP", {"embedding_dim": 8})
    report = pipes.train("lp", g, model_name="lp-default", seed=7)
    assert report["winningMethod"] == "logistic_regression"
