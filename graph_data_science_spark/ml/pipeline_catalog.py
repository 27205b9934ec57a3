"""Named training-pipeline catalog — staged pipeline configs + train.

Reference: pipeline/src/main/java/org/neo4j/gds/ml/pipeline/
PipelineCatalog.java (set/get/exists/drop per user) with the staged builder
procs ``gds.beta.pipeline.{linkPrediction,nodeClassification}.create`` /
``addNodeProperty`` / ``addFeature`` / ``configureSplit`` /
``addLogisticRegression`` / ``addRandomForest`` (+ alpha ``addMLP``), the
lifecycle procs ``gds.pipeline.list`` / ``gds.pipeline.exists`` /
``gds.pipeline.drop`` (proc/pipeline-catalog/), and train-time model
selection over the candidate trainer configs
(pipeline/.../AutoTuningConfig.java + TunableTrainerConfig.java — the
reference trains every candidate and keeps the best by validation metric).

Design: a pipeline here is a CONFIG object (dict of staged settings), not a
computation — exactly the reference's split between PipelineCatalog
(configs) and ModelCatalog (trained artifacts). ``train`` dispatches to the
engine's pipeline functions (ml/pipelines.py), evaluates every candidate
trainer, selects the winner (accuracy for classifiers, RMSE for
regression), and registers the trained model in a
:class:`~graph_data_science_spark.ml.model_catalog.ModelCatalog` under the
requested model name — after which ``model_catalog.predict(name, ...)``
serves it, closing the create→train→predict-by-name loop.

Scale note: the catalog itself is O(#pipelines) driver-side dicts; all
heavy lifting stays in the pipeline functions' distributed plans. Training
k candidates costs k pipeline runs — same contract as the reference, which
also trains candidates sequentially per pipeline.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.ml.model_catalog import ModelCatalog, default_catalog

KINDS = ("linkPrediction", "nodeClassification", "nodeRegression")

#: featureType → supported? The engine's link features are hadamard over
#: fastRP embeddings (ml/pipelines.py link_prediction_pipeline); the
#: reference's other combiners (L2, cosine) share the same plan shape.
_LP_FEATURES = ("HADAMARD",)


class PipelineCatalog:
    """Staged pipeline-config store + train-with-model-selection."""

    def __init__(self, model_catalog: ModelCatalog | None = None):
        self._pipelines: dict[str, dict] = {}
        self.model_catalog = model_catalog or default_catalog

    # -- create / stage (gds.beta.pipeline.*.create + add*) -------------------
    def create(self, name: str, kind: str) -> dict:
        if kind not in KINDS:
            raise ValueError(f"unknown pipeline kind {kind!r} (have {KINDS})")
        if name in self._pipelines:
            raise ValueError(f"Pipeline with name `{name}` already exists.")
        self._pipelines[name] = {
            "name": name,
            "kind": kind,
            "nodePropertySteps": [],
            "features": [],
            "split": {"holdout": 0.25, "negative_ratio": 1.0},
            "trainerCandidates": [],
        }
        return self._pipelines[name]

    def _get(self, name: str) -> dict:
        if name not in self._pipelines:
            raise ValueError(f"Pipeline with name `{name}` does not exist.")
        return self._pipelines[name]

    def add_node_property(self, name: str, procedure: str,
                          config: dict | None = None) -> dict:
        """``addNodeProperty``: the feature-producing step. The engine's
        pipeline functions compute fastRP internally, so that is the one
        procedure accepted (config: embedding_dim, seed) — mirroring the
        reference's most common pipeline shape (fastRP → features)."""
        p = self._get(name)
        if procedure.lower() not in ("fastrp", "fast_rp"):
            raise ValueError(
                f"unsupported node-property step {procedure!r}: the engine's "
                "pipelines compute fastRP features (ml/pipelines.py)")
        p["nodePropertySteps"].append(
            {"procedure": "fastRP", "config": dict(config or {})})
        return p

    def add_feature(self, name: str, feature_type: str,
                    config: dict | None = None) -> dict:
        """``addFeature`` (link prediction only): link feature combiner."""
        p = self._get(name)
        if p["kind"] != "linkPrediction":
            raise ValueError("addFeature applies to linkPrediction pipelines")
        if feature_type.upper() not in _LP_FEATURES:
            raise ValueError(f"unsupported feature type {feature_type!r} "
                             f"(have {_LP_FEATURES})")
        p["features"].append(
            {"featureType": feature_type.upper(), "config": dict(config or {})})
        return p

    def configure_split(self, name: str, holdout: float | None = None,
                        negative_ratio: float | None = None) -> dict:
        p = self._get(name)
        if holdout is not None:
            if not (0.0 <= float(holdout) < 1.0):
                raise ValueError("holdout must be in [0, 1)")
            p["split"]["holdout"] = float(holdout)
        if negative_ratio is not None:
            p["split"]["negative_ratio"] = float(negative_ratio)
        return p

    def add_logistic_regression(self, name: str, **params) -> dict:
        return self._add_trainer(name, "logistic_regression", params)

    def add_random_forest(self, name: str, **params) -> dict:
        return self._add_trainer(name, "random_forest", params)

    def add_mlp(self, name: str, **params) -> dict:
        return self._add_trainer(name, "mlp", params)

    def add_linear_regression(self, name: str, **params) -> dict:
        return self._add_trainer(name, "linear_regression", params)

    def _add_trainer(self, name: str, method: str, params: dict) -> dict:
        p = self._get(name)
        ok = {
            "linkPrediction": ("logistic_regression",),
            "nodeClassification": ("logistic_regression", "random_forest",
                                   "mlp"),
            "nodeRegression": ("linear_regression",),
        }[p["kind"]]
        if method not in ok:
            raise ValueError(
                f"{p['kind']} pipelines accept trainers {ok}, not {method!r}")
        p["trainerCandidates"].append({"method": method,
                                       "params": dict(params)})
        return p

    # -- lifecycle (proc/pipeline-catalog/) ------------------------------------
    def exists(self, name: str) -> bool:
        return name in self._pipelines

    def list(self) -> list[dict]:
        return [
            {"pipelineName": n, "pipelineType": p["kind"],
             "nodePropertySteps": len(p["nodePropertySteps"]),
             "trainerCandidates": len(p["trainerCandidates"])}
            for n, p in sorted(self._pipelines.items())
        ]

    def drop(self, name: str, fail_if_missing: bool = True) -> None:
        if name not in self._pipelines:
            if fail_if_missing:
                raise ValueError(
                    f"Pipeline with name `{name}` does not exist.")
            return
        del self._pipelines[name]

    # -- train (model selection over candidates) -------------------------------
    def train(
        self,
        name: str,
        graph: Graph,
        model_name: str,
        targets: DataFrame | None = None,
        seed: int = 42,
    ) -> dict:
        """Train every candidate trainer, keep the winner, register it in the
        model catalog under ``model_name``. Returns the training report
        (winning method, metric per candidate) — the
        ``gds.beta.pipeline.*.train`` result row analog."""
        p = self._get(name)
        steps = p["nodePropertySteps"]
        emb_conf = steps[0]["config"] if steps else {}
        dim = int(emb_conf.get("embedding_dim", 16))
        split = p["split"]
        candidates = p["trainerCandidates"] or [
            {"method": {"linkPrediction": "logistic_regression",
                        "nodeClassification": "logistic_regression",
                        "nodeRegression": "linear_regression"}[p["kind"]],
             "params": {}}]

        reports: list[dict] = []
        best: tuple[float, Any, str] | None = None  # (key, result, method)
        for cand in candidates:
            method, params = cand["method"], dict(cand["params"])
            if p["kind"] == "linkPrediction":
                from graph_data_science_spark.ml.pipelines import (
                    link_prediction_pipeline)
                res = link_prediction_pipeline(
                    graph, embedding_dim=dim, seed=seed,
                    holdout=split["holdout"],
                    negative_ratio=split["negative_ratio"], **params)
                metric, key = res.test_accuracy, res.test_accuracy
                model, mtype = res.model, "logistic_regression"
            elif p["kind"] == "nodeClassification":
                from graph_data_science_spark.ml.pipelines import (
                    node_classification_pipeline)
                if targets is None:
                    raise ValueError(
                        "nodeClassification train needs targets (node_id, label)")
                res = node_classification_pipeline(
                    graph, targets, embedding_dim=dim, seed=seed,
                    holdout=split["holdout"], classifier=method,
                    classifier_params=params)
                metric, key = res.test_accuracy, res.test_accuracy
                if method == "logistic_regression":
                    # one-vs-rest: a dict of per-class models, typed
                    # distinctly so predict-by-name dispatches correctly
                    model, mtype = res.models, "logistic_regression_ovr"
                else:
                    model, mtype = res.models[0], method
            else:  # nodeRegression
                from graph_data_science_spark.ml.pipelines import (
                    node_regression_pipeline)
                if targets is None:
                    raise ValueError(
                        "nodeRegression train needs targets (node_id, target)")
                res = node_regression_pipeline(
                    graph, targets, embedding_dim=dim, seed=seed,
                    holdout=split["holdout"], **params)
                # lower RMSE is better → negate for the max-key comparison
                metric, key = res.test_rmse, -res.test_rmse
                model, mtype = res.model, "linear_regression"
            reports.append({"method": method, "params": params,
                            "metric": None if math.isnan(metric) else metric})
            if not math.isnan(key) and (best is None or key > best[0]):
                best = (key, (model, mtype, metric), method)

        if best is None:
            raise ValueError(
                f"pipeline {name!r}: no candidate produced an evaluable "
                "model (empty holdout on every run)")
        model, mtype, metric = best[1]
        self.model_catalog.set(
            model_name, mtype, model,
            metadata={"pipeline": name, "kind": p["kind"],
                      "winningMethod": best[2], "metric": metric},
            overwrite=True)
        return {
            "modelName": model_name,
            "winningMethod": best[2],
            "metric": metric,
            "candidates": reports,
        }


#: default process-wide pipeline catalog (pairs with model_catalog's)
default_pipeline_catalog = PipelineCatalog()
