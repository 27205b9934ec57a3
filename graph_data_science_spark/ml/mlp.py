"""MLP classifier: one-hidden-layer softmax network, distributed full-batch GD.

Reference analog: ml/ml-core/src/main/java/org/neo4j/gds/ml/models/mlp/
MLPClassifierTrainer.java — the third classifier the reference's pipelines
offer (next to logistic regression and random forest).

Spark-first training shape: each iteration computes the FULL-BATCH gradient
as a sum of per-partition partials — one ``mapInPandas`` pass (Arrow-batched
numpy GEMM, no per-row Python) emits one gradient row per partition, the
driver adds them and steps. Model size = h·(d+1) + C·(h+1) doubles — the
only driver state; examples never leave the executors. This is the same
distributed-GD contract as pipelines.logreg_fit, with the Python side
vectorized because backprop through the hidden layer isn't expressible as a
flat Catalyst array expression.

Determinism: input is hash-repartitioned by id; each partition concatenates
ALL of its Arrow batches and sorts the whole partition by id once (a
partition larger than arrow.maxRecordsPerBatch arrives as several batches
whose order depends on shuffle fetch order — per-batch sorting is not
enough); the driver sums partials in partition-id order — one fixed
floating-point summation tree at any parallelism. Weight init is
hash-seeded (same u01 discipline as the rest of the engine).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.operators.graphsage import _py_u01


@dataclass
class MLPModel:
    w1: list  # h × (d+1)  (bias-augmented)
    w2: list  # C × (h+1)
    history: list  # mean cross-entropy per iteration


def _init(rows: int, cols: int, tag: str, seed: int) -> np.ndarray:
    sc = 1.0 / np.sqrt(cols)
    return np.array([[(_py_u01("mlp", tag, r, c, seed) - 0.5) * sc
                      for c in range(cols)] for r in range(rows)])


def _forward(X: np.ndarray, W1: np.ndarray, W2: np.ndarray):
    Xb = np.hstack([X, np.ones((len(X), 1))])
    H = np.maximum(Xb @ W1.T, 0.0)  # relu
    Hb = np.hstack([H, np.ones((len(X), 1))])
    Z = Hb @ W2.T
    Z -= Z.max(axis=1, keepdims=True)
    P = np.exp(Z)
    P /= P.sum(axis=1, keepdims=True)
    return Xb, H, Hb, P


def mlp_fit(
    examples: DataFrame,  # (id, x array<double>, y int)
    hidden: int = 8,
    iterations: int = 30,
    learning_rate: float = 0.5,
    n_partitions: int | None = None,
    seed: int = 42,
) -> MLPModel:
    spark = examples.sparkSession
    ex = examples.select("id", "x", F.col("y").cast("int").alias("y"))
    d = len(ex.select("x").first()["x"])
    n_classes = int(ex.agg(F.max("y")).first()[0]) + 1
    P = n_partitions or max(2, spark.sparkContext.defaultParallelism)
    ex = ex.repartition(P, "id").localCheckpoint(eager=True)
    n = ex.count()
    h, C = int(hidden), n_classes

    W1 = _init(h, d + 1, "w1", seed)
    W2 = _init(C, h + 1, "w2", seed)
    glen = h * (d + 1) + C * (h + 1)
    history = []

    for _ in range(int(iterations)):
        b1, b2 = W1.copy(), W2.copy()

        def partial(batches):
            from pyspark import TaskContext
            import pandas as pd
            # determinism: a partition may arrive as MULTIPLE Arrow batches
            # whose composition/order depends on shuffle fetch order —
            # accumulate them all, then sort the WHOLE partition by id once,
            # so the float summation tree is fixed at any parallelism
            parts = [pdf for pdf in batches if len(pdf)]
            if not parts:
                return
            whole = pd.concat(parts, ignore_index=True).sort_values("id")
            X = np.stack(whole["x"].to_numpy())
            y = whole["y"].to_numpy().astype(int)
            Xb, H, Hb, Pr = _forward(X, b1, b2)
            Y = np.zeros_like(Pr)
            Y[np.arange(len(y)), y] = 1.0
            dZ = Pr - Y  # n × C
            g2 = dZ.T @ Hb  # C × (h+1)
            dH = (dZ @ b2[:, :-1]) * (H > 0)
            g1 = dH.T @ Xb  # h × (d+1)
            loss = float(-np.log(np.clip(
                Pr[np.arange(len(y)), y], 1e-12, None)).sum())
            flat = np.concatenate([g1.ravel(), g2.ravel()])
            yield pd.DataFrame({
                "pid": [TaskContext.get().partitionId()],
                "grad": [flat.tolist()], "loss": [loss],
                "cnt": [len(y)]})

        rows = ex.mapInPandas(
            partial,
            schema="pid int, grad array<double>, loss double, cnt long"
        ).collect()
        rows.sort(key=lambda r: r["pid"])
        flat = np.zeros(glen)
        loss = 0.0
        for r in rows:
            flat = flat + np.array(r["grad"])
            loss += r["loss"]
        g1 = flat[: h * (d + 1)].reshape(h, d + 1) / n
        g2 = flat[h * (d + 1):].reshape(C, h + 1) / n
        W1 = W1 - float(learning_rate) * g1
        W2 = W2 - float(learning_rate) * g2
        history.append(round(loss / n, 6))
    return MLPModel(W1.tolist(), W2.tolist(), history)


def mlp_predict(df: DataFrame, model: MLPModel,
                out: str = "predicted") -> DataFrame:
    """Score (.., x) rows — Arrow-batched forward pass, argmax class
    (tie → smaller class via numpy argmax)."""
    W1 = np.array(model.w1)
    W2 = np.array(model.w2)
    cols = df.columns

    def score(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["x"].to_numpy())
            _, _, _, Pr = _forward(X, W1, W2)
            res = pdf.drop(columns=["x"])
            res[out] = Pr.argmax(axis=1).astype("int32")
            yield res

    keep = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes if name != "x")
    return df.mapInPandas(score, schema=f"{keep}, {out} int")
