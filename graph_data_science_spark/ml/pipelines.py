"""ML pipelines: link prediction + node classification (logistic regression).

Reference analogs:
- ``gds.beta.pipeline.linkPrediction`` — pipeline/src/main/java/org/neo4j/
  gds/ml/pipeline/linkPipeline/LinkPredictionTrainingPipeline.java (node
  embeddings → link feature combiner → binary classifier; negatives sampled
  from non-edges; train/test split).
- ``gds.beta.pipeline.nodeClassification`` — pipeline/.../node/
  classification/NodeClassificationTrainingPipeline.java.
- classifiers: ml/ml-core/.../LogisticRegressionTrainer.java (this module),
  randomforest/RandomForestClassifierTrainer.java (ml/forest.py —
  distributed-histogram trees) and mlp/MLPClassifierTrainer.java
  (ml/mlp.py — partition-partial full-batch GD); select via
  ``node_classification_pipeline(classifier=...)``.

Spark-first training: FULL-BATCH deterministic gradient descent where each
iteration is ONE distributed aggregation — per-example gradient
``(σ(w·x) − y)·x`` is computed with ``F.aggregate``/``F.transform`` array
expressions (JVM-side, no Python), summed per component via posexplode +
partial agg. The weight vector (d+1 floats) is the only driver state; at
100 TB the examples stream through executors and only d+1 doubles come
back per iteration — the textbook distributed-GD shape. Determinism: fixed
iteration count, full batch (no sampling order), hash-based negative
sampling and splits (embeddings._u01).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.operators.embeddings import _u01, fastrp


@dataclass
class LogRegModel:
    weights: list[float]  # [bias, w_1..w_d]
    history: list[float]  # mean log-loss per iteration


def _dot(w: list[float]):
    """Column expr: w[0] + Σ w[i+1]·x[i] — pure Catalyst array arithmetic."""
    expr = F.lit(float(w[0]))
    arr = F.col("x")
    for i in range(1, len(w)):
        expr = expr + F.lit(float(w[i])) * F.element_at(arr, i)
    return expr


def logreg_fit(examples: DataFrame, dim: int, iterations: int = 20,
               learning_rate: float = 0.5, l2: float = 0.0) -> LogRegModel:
    """Fit on (x: array<double>[dim], y: double∈{0,1}) — one distributed
    aggregation per iteration, d+1 doubles to the driver."""
    ex = examples.select("x", F.col("y").cast("double").alias("y"))
    ex = ex.localCheckpoint(eager=True)
    n = ex.count()
    if n == 0:
        raise ValueError("no training examples")
    w = [0.0] * (dim + 1)
    history = []
    for _ in range(int(iterations)):
        z = _dot(w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.greatest(F.lit(-30.0),
                                                         F.least(F.lit(30.0), z))))
        # materialize err/loss ONCE per row (a prior select), then build the
        # per-component gradient from the named column — w·x is evaluated a
        # single time per example instead of once per output expression
        pre = ex.select(
            "x", (p - F.col("y")).alias("_e"),
            (-(F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
               + (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(1e-12))))).alias("_l"),
        )
        graded = pre.select(
            "_e", "_l",
            F.transform(F.col("x"), lambda xi: xi * F.col("_e")).alias("_g"))
        # one shuffle: per-component partial sums; Σerr (bias gradient) and
        # Σloss ride ONLY the _i=0 group (conditional sum — the other dim-1
        # groups partial-aggregate nulls instead of shuffling full copies)
        row = (graded
               .select("_e", "_l", F.posexplode("_g").alias("_i", "_gi"))
               .groupBy("_i")
               .agg(F.sum("_gi").alias("g"),
                    F.sum(F.when(F.col("_i") == 0, F.col("_e"))).alias("ge"),
                    F.sum(F.when(F.col("_i") == 0, F.col("_l"))).alias("loss"))
               .collect())
        by_i = {int(r["_i"]): r for r in row}
        loss = float(by_i[0]["loss"]) / n
        grad = [float(by_i[0]["ge"]) / n] + [
            float(by_i[i]["g"]) / n for i in range(dim)]
        lr = float(learning_rate)
        w = [wi - lr * (gi + float(l2) * wi) for wi, gi in zip(w, grad)]
        history.append(round(float(loss), 6))
    return LogRegModel(w, history)


def predict_proba(df: DataFrame, model: LogRegModel, out: str = "probability"
                  ) -> DataFrame:
    z = _dot(model.weights)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.greatest(F.lit(-30.0),
                                                     F.least(F.lit(30.0), z))))
    return df.withColumn(out, F.round(p, 6))


def _hadamard(a: str, b: str):
    return F.zip_with(F.col(a), F.col(b), lambda x, y: x * y)


@dataclass
class LinRegModel:
    weights: list[float]  # [bias, w_1..w_d]
    history: list[float]  # mean squared error per iteration


def linreg_fit(examples: DataFrame, dim: int, iterations: int = 30,
               learning_rate: float = 0.1, l2: float = 0.0) -> LinRegModel:
    """Linear regression on (x: array<double>[dim], y: double) — the node
    REGRESSION trainer (reference:
    ml/ml-core/.../linearregression/LinearRegressionTrainer.java). Same
    distributed shape as logreg_fit: full-batch deterministic GD, one
    partial-aggregated shuffle per iteration, d+1 doubles to the driver."""
    ex = examples.select("x", F.col("y").cast("double").alias("y"))
    ex = ex.localCheckpoint(eager=True)
    n = ex.count()
    if n == 0:
        raise ValueError("no training examples")
    w = [0.0] * (dim + 1)
    history = []
    for _ in range(int(iterations)):
        # err computed ONCE per row in a prior select (w·x was previously
        # re-evaluated three times per row), and Σerr/Σloss aggregated only
        # for the _i=0 group instead of shuffling dim identical copies
        pre = ex.select("x", (_dot(w) - F.col("y")).alias("_e"))
        graded = pre.select(
            "_e", (F.col("_e") * F.col("_e")).alias("_l"),
            F.transform(F.col("x"), lambda xi: xi * F.col("_e")).alias("_g"))
        row = (graded
               .select("_e", "_l", F.posexplode("_g").alias("_i", "_gi"))
               .groupBy("_i")
               .agg(F.sum("_gi").alias("g"),
                    F.sum(F.when(F.col("_i") == 0, F.col("_e"))).alias("ge"),
                    F.sum(F.when(F.col("_i") == 0, F.col("_l"))).alias("loss"))
               .collect())
        by_i = {int(r["_i"]): r for r in row}
        mse = float(by_i[0]["loss"]) / n
        grad = [2.0 * float(by_i[0]["ge"]) / n] + [
            2.0 * float(by_i[i]["g"]) / n for i in range(dim)]
        lr = float(learning_rate)
        w = [wi - lr * (gi + float(l2) * wi) for wi, gi in zip(w, grad)]
        history.append(round(mse, 6))
    return LinRegModel(w, history)


@dataclass
class NodeRegressionResult:
    model: "LinRegModel"
    test_predictions: DataFrame  # (node_id, y, predicted)
    test_rmse: float


def node_regression_pipeline(
    graph: Graph,
    targets: DataFrame,  # (node_id, target: double)
    embedding_dim: int = 16,
    iterations: int = 30,
    learning_rate: float = 0.1,
    holdout: float = 0.25,
    seed: int = 42,
) -> NodeRegressionResult:
    """``gds.alpha.pipeline.nodeRegression`` analog: fastRP features →
    linear regression (pipeline/.../noderegression/
    NodeRegressionTrainingPipeline.java)."""
    emb = fastrp(graph, embedding_dim=embedding_dim, seed=seed) \
        .localCheckpoint(eager=True)
    data = targets.join(emb, "node_id").select(
        "node_id", F.col("target").cast("double").alias("y"),
        F.col("embedding").alias("x"))
    data = data.withColumn(
        "_test", _u01(F.col("node_id"), F.lit(seed + 3)) < float(holdout)
    ).localCheckpoint(eager=True)
    train = data.where(~F.col("_test"))
    test = data.where(F.col("_test"))
    model = linreg_fit(train.select("x", "y"), embedding_dim, iterations,
                       learning_rate)
    preds = test.select("node_id", "y",
                        F.round(_dot(model.weights), 6).alias("predicted"))
    rmse_row = preds.select(F.sqrt(F.avg(
        (F.col("predicted") - F.col("y"))
        * (F.col("predicted") - F.col("y")))).alias("rmse")).first()
    # an empty holdout must not report a perfect score — surface NaN
    return NodeRegressionResult(
        model, preds,
        float("nan") if rmse_row["rmse"] is None else float(rmse_row["rmse"]))


@dataclass
class LinkPredictionResult:
    model: LogRegModel
    test_predictions: DataFrame  # (src, dst, y, probability)
    test_accuracy: float


def link_prediction_pipeline(
    graph: Graph,
    embedding_dim: int = 16,
    iterations: int = 20,
    learning_rate: float = 0.5,
    negative_ratio: float = 1.0,
    holdout: float = 0.25,
    seed: int = 42,
) -> LinkPredictionResult:
    """Train/eval a link-prediction pipeline: fastRP node embeddings →
    hadamard link features → logistic regression. Negatives are
    hash-sampled node pairs verified NOT to be edges (anti-join)."""
    spark = graph.nodes.sparkSession
    emb = fastrp(graph, embedding_dim=embedding_dim, seed=seed)
    emb = emb.localCheckpoint(eager=True)

    pos = graph.edges.select("src", "dst").distinct() \
        .where(F.col("src") != F.col("dst"))
    n_pos = pos.count()
    # hash-derived candidate pairs, anti-joined against real edges
    nodes = graph.nodes.select("node_id")
    n_nodes = nodes.count()
    want_neg = int(n_pos * float(negative_ratio))
    factor = max(1, math.ceil(3 * want_neg / max(1, n_pos)))
    reps = spark.range(factor).select(F.col("id").alias("_r"))
    cand = (pos.crossJoin(F.broadcast(reps))
            .select(
                F.col("src"),
                (F.pmod(F.conv(F.substring(F.md5(F.concat_ws(
                    ":", F.col("src"), F.col("dst"), F.col("_r"),
                    F.lit(seed))), 1, 15), 16, 10).cast("long"),
                    F.lit(n_nodes))).alias("_idx"))
            )
    # dense index without a single-task global window (sources/idmap.py:
    # returns (node_id=dense id, <key_col>=original))
    from graph_data_science_spark.sources.idmap import assign_dense_ids
    # idmap keys are strings; the mapping only needs to be a bijection here
    idx = assign_dense_ids(
        nodes.select(F.col("node_id").cast("string").alias("_orig")),
        key_col="_orig",
    ).select(F.col("node_id").alias("_idx"),
             F.col("_orig").cast("long").alias("node_id"))
    neg = (cand.join(idx, "_idx").select("src", F.col("node_id").alias("dst"))
           .where(F.col("src") != F.col("dst"))
           .join(pos, ["src", "dst"], "left_anti")
           .dropDuplicates(["src", "dst"])
           .limit(want_neg))
    ex = (pos.withColumn("y", F.lit(1.0))
          .unionByName(neg.withColumn("y", F.lit(0.0))))
    ea = emb.select(F.col("node_id").alias("src"), F.col("embedding").alias("_ea"))
    eb = emb.select(F.col("node_id").alias("dst"), F.col("embedding").alias("_eb"))
    feat = (ex.join(ea, "src").join(eb, "dst")
            .select("src", "dst", "y", _hadamard("_ea", "_eb").alias("x")))
    is_test = _u01(F.col("src"), F.col("dst"), F.lit(seed + 1)) < float(holdout)
    feat = feat.withColumn("_test", is_test).localCheckpoint(eager=True)
    train = feat.where(~F.col("_test"))
    test = feat.where(F.col("_test"))
    model = logreg_fit(train.select("x", "y"), embedding_dim, iterations,
                       learning_rate)
    preds = predict_proba(test.select("src", "dst", "y", "x"), model) \
        .drop("x")
    acc_row = preds.select(
        F.avg(((F.col("probability") >= 0.5).cast("double") == F.col("y"))
              .cast("double")).alias("acc")).first()
    # empty holdout → NaN, never a silent 0.0/1.0
    return LinkPredictionResult(
        model, preds,
        float("nan") if acc_row["acc"] is None else float(acc_row["acc"]))


@dataclass
class NodeClassificationResult:
    models: dict[int, LogRegModel]
    test_predictions: DataFrame  # (node_id, y, predicted)
    test_accuracy: float


def node_classification_pipeline(
    graph: Graph,
    labels: DataFrame,  # (node_id, label: long)
    embedding_dim: int = 16,
    iterations: int = 20,
    holdout: float = 0.25,
    seed: int = 42,
    classifier: str = "logistic_regression",
    classifier_params: dict | None = None,
) -> NodeClassificationResult:
    """fastRP features → classifier. ``classifier`` selects the model family
    the reference's pipelines offer: ``logistic_regression`` (one-vs-rest,
    this module), ``random_forest`` (ml/forest.py distributed-histogram
    trees), or ``mlp`` (ml/mlp.py one-hidden-layer softmax).
    ``classifier_params`` are forwarded to the underlying trainer (e.g.
    ``{"n_trees": 16, "max_depth": 6}`` for random_forest, ``{"hidden": 16,
    "learning_rate": 0.2}`` for mlp, ``{"learning_rate": 0.3, "l2": 1e-4}``
    for logistic_regression) — the pipeline's tuning surface, mirroring the
    reference's trainerConfig (pipeline/.../TunableTrainerConfig.java)."""
    params = dict(classifier_params or {})
    emb = fastrp(graph, embedding_dim=embedding_dim, seed=seed) \
        .localCheckpoint(eager=True)
    data = labels.join(emb, "node_id").select(
        "node_id", F.col("label").cast("long").alias("label"),
        F.col("embedding").alias("x"))
    data = data.withColumn(
        "_test", _u01(F.col("node_id"), F.lit(seed + 2)) < float(holdout)
    ).localCheckpoint(eager=True)
    train = data.where(~F.col("_test"))
    test = data.where(F.col("_test"))
    if classifier in ("random_forest", "mlp"):
        ex = train.select(F.col("node_id").alias("id"), "x",
                          F.col("label").cast("int").alias("y"))
        te = test.select(F.col("node_id").alias("id"), "x",
                         F.col("label").alias("y"))
        if classifier == "random_forest":
            from graph_data_science_spark.ml.forest import (
                random_forest_fit, random_forest_predict)
            model = random_forest_fit(ex, seed=seed, **params)
            preds = random_forest_predict(te, model)
        else:
            from graph_data_science_spark.ml.mlp import mlp_fit, mlp_predict
            params.setdefault("iterations", iterations)
            model = mlp_fit(ex, seed=seed, **params)
            preds = mlp_predict(te, model)
        preds = preds.select(F.col("id").alias("node_id"), "y",
                             F.col("predicted").cast("long").alias("predicted"))
        acc = preds.select(
            F.avg((F.col("predicted") == F.col("y")).cast("double")).alias("a")
        ).first()["a"]
        return NodeClassificationResult(
            {0: model}, preds,
            float("nan") if acc is None else float(acc))
    if classifier != "logistic_regression":
        raise ValueError(f"unknown classifier: {classifier}")
    classes = sorted(r[0] for r in train.select("label").distinct().collect())
    models: dict[int, LogRegModel] = {}
    scored = test.select("node_id", "label", "x")
    # classifier_params may override iterations (same contract as the mlp
    # branch above); the pipeline argument is the default
    params.setdefault("iterations", iterations)
    for c in classes:
        m = logreg_fit(
            train.select("x", (F.col("label") == int(c)).cast("double").alias("y")),
            embedding_dim, **params)
        models[int(c)] = m
        scored = predict_proba(scored, m, out=f"_p{c}")
    best = None
    for c in classes:
        col = F.struct(F.col(f"_p{c}").alias("p"), F.lit(int(c)).alias("c"))
        best = col if best is None else F.when(
            F.col(f"_p{c}") > best["p"], col).otherwise(best)
    preds = scored.withColumn("predicted", best["c"]) \
        .select("node_id", F.col("label").alias("y"), "predicted")
    acc = preds.select(
        F.avg((F.col("predicted") == F.col("y")).cast("double")).alias("a")
    ).first()["a"]
    return NodeClassificationResult(
        models, preds, float("nan") if acc is None else float(acc))
