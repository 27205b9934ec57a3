"""GraphSAGE: inductive node embeddings (mean aggregator).

Reference analog: ``gds.beta.graphSage`` —
algo/src/main/java/org/neo4j/gds/embeddings/graphsage/GraphSage.java and
GraphSageModelTrainer.java (Hamilton, Ying & Leskovec, "Inductive
Representation Learning on Large Graphs", NeurIPS 2017).

Two phases, split the way GraphSAGE is actually deployed at scale (train on
a sample, infer everywhere — the inductive property is the whole point):

1. :func:`graphsage_predict` — the 100 TB path. K layers; layer k computes
   for every node v::

       h_N(v) = mean over sampled in-neighbors u of h_{k-1}(u)
       h_k(v) = l2_normalize( relu( W_self·h_{k-1}(v) + W_neigh·h_N(v) ) )

   entirely in Catalyst on LONG-format state ``(node_id, dim, value)``:
   neighbor sampling is a per-dst hash rank (row_number ≤ sample_size over
   ``u01(src, dst, layer, seed)`` — deterministic at any parallelism),
   the mean is one edges ⋈ state shuffle join + partial agg, and each
   matvec is a broadcast join against the tiny weight table followed by a
   per-(node, out-dim) partial-aggregated sum. Per layer: 2 shuffle aggs +
   1 shuffle join — no Python in the loop, no driver state beyond the
   weight matrices (d_out × d_in floats).

   Activation choice: the reference supports SIGMOID/RELU (defaults RELU
   for mean aggregation); this engine fixes RELU + the paper's per-layer L2
   normalization.

2. :func:`graphsage_train` — deterministic parity-mode trainer (same
   discipline as node2vec's single-group SGNS and label_propagation's
   ``batch_sequential``): the reference trains with multi-threaded Adam on
   sampled batches, whose result is concurrency-dependent; here the
   unsupervised GraphSAGE loss (σ(z_u·z_v) for 1-hop positives, hash-drawn
   negatives) is optimized with full-batch numpy gradient descent inside ONE
   ``applyInPandas`` group — bit-reproducible, valid while (n·d floats +
   edge list) fit one worker. Trained weights feed graphsage_predict for
   distributed inference over the full graph.

Determinism/portability: weight init is hash-seeded in PYTHON
(:func:`init_weights`, hashlib md5 — the same u01 discipline as
embeddings._u01) and the literal values are inlined into both the Spark
plan and the DuckDB oracle, so no hash needs to agree across engines.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.operators.embeddings import _u01
from graph_data_science_spark.operators.louvain import _Scratch


def _py_u01(*args) -> float:
    s = ":".join(str(a) for a in args)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / float(1 << 60)


def init_weights(layer_dims: list[int], seed: int = 42) -> list[dict]:
    """Hash-seeded deterministic weights: one layer per consecutive dim pair.

    layer k maps d_in = layer_dims[k] → d_out = layer_dims[k+1] with
    ``w[j][i] = (u01('gs', k, kind, j, i, seed) − 0.5) / sqrt(d_in)``
    (uniform ±0.5/√d_in — the standard fan-in scaling, reproducible
    anywhere). Returns ``[{"w_self": [[..]], "w_neigh": [[..]]}, ...]``.
    """
    layers = []
    for k in range(len(layer_dims) - 1):
        d_in, d_out = layer_dims[k], layer_dims[k + 1]
        sc = 1.0 / math.sqrt(d_in)
        layers.append({
            kind: [[round((_py_u01("gs", k, kind, j, i, seed) - 0.5) * sc, 6)
                    for i in range(d_in)] for j in range(d_out)]
            for kind in ("w_self", "w_neigh")
        })
    return layers


def degree_features(graph: Graph) -> DataFrame:
    """Default inductive features when none are supplied (the reference's
    degreeProperty / featureProperties fallback): per node
    ``[log1p(out_deg), log1p(in_deg), 1.0]``."""
    edges = graph.edges.select("src", "dst").distinct()
    outd = edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("_o"))
    ind = edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count(F.lit(1)).alias("_i"))
    return (graph.nodes.select("node_id")
            .join(outd, "node_id", "left").join(ind, "node_id", "left")
            .select("node_id", F.array(
                F.log1p(F.coalesce(F.col("_o"), F.lit(0)).cast("double")),
                F.log1p(F.coalesce(F.col("_i"), F.lit(0)).cast("double")),
                F.lit(1.0)).alias("features")))


def _weights_df(spark, layer: dict):
    """Tiny (j, i, ws, wn) DataFrame for one layer — broadcast side."""
    ws, wn = layer["w_self"], layer["w_neigh"]
    rows = [(j, i, float(ws[j][i]), float(wn[j][i]))
            for j in range(len(ws)) for i in range(len(ws[0]))]
    return spark.createDataFrame(rows, "j long, i long, ws double, wn double")


def graphsage_predict(
    graph: Graph,
    features: DataFrame,  # (node_id, features array<double>)
    weights: list[dict],
    sample_sizes: list[int | None] | None = None,
    seed: int = 42,
    long_format: bool = False,
) -> DataFrame:
    """Distributed GraphSAGE forward pass → (node_id, embedding) — or, with
    ``long_format``, (node_id, dim, value) rounded 6dp (the oracle shape).

    ``sample_sizes[k]`` bounds layer k's neighborhood (None = all
    in-neighbors); sampling is the hash rank described in the module
    docstring, so at 100 TB a hub's fan-in collapses to ``sample_size``
    messages deterministically — the skew guard is built into the operator.
    """
    from pyspark.sql import Window

    spark = graph.nodes.sparkSession
    if sample_sizes is None:
        sample_sizes = [None] * len(weights)
    if len(sample_sizes) != len(weights):
        raise ValueError("sample_sizes must match the number of layers")
    scratch = _Scratch(spark)
    try:
        edges = scratch.truncate(
            graph.edges.select("src", "dst").distinct(), "edges")
        state = features.select(
            "node_id", F.posexplode("features").alias("dim", "value")
        ).select("node_id", F.col("dim").cast("long").alias("dim"), "value")
        state = scratch.truncate(state, "state")
        for k, layer in enumerate(weights):
            s = sample_sizes[k]
            if s is None:
                sampled = edges
            else:
                rk = Window.partitionBy("dst").orderBy("_h", "src")
                sampled = (edges
                           .withColumn("_h", _u01(F.col("src"), F.col("dst"),
                                                  F.lit(k), F.lit(int(seed))))
                           .withColumn("_r", F.row_number().over(rk))
                           .where(F.col("_r") <= int(s))
                           .select("src", "dst"))
            nmean = (sampled.join(state.select(F.col("node_id").alias("src"),
                                               "dim", "value"), "src")
                     .groupBy(F.col("dst").alias("node_id"), "dim")
                     .agg(F.avg("value").alias("nval")))
            full = (state.join(nmean, ["node_id", "dim"], "left")
                    .select("node_id", F.col("dim").alias("i"),
                            F.col("value").alias("sval"),
                            F.coalesce("nval", F.lit(0.0)).alias("nval")))
            w = _weights_df(spark, layer)
            pre = (full.join(F.broadcast(w), "i")
                   .groupBy("node_id", F.col("j").alias("dim"))
                   .agg(F.sum(F.col("sval") * F.col("ws")
                              + F.col("nval") * F.col("wn")).alias("value"))
                   .select("node_id", "dim",
                           F.greatest(F.col("value"), F.lit(0.0)).alias("value")))
            norms = pre.groupBy("node_id").agg(
                F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("_n"))
            state = pre.join(norms, "node_id").select(
                "node_id", "dim",
                F.when(F.col("_n") > 0, F.col("value") / F.col("_n"))
                .otherwise(F.lit(0.0)).alias("value"))
            state = scratch.truncate(state, "state")
        out_long = state.select("node_id", "dim",
                                F.round("value", 6).alias("value"))
        if long_format:
            return out_long.localCheckpoint(eager=True)
        arr = out_long.groupBy("node_id").agg(
            F.array_sort(F.collect_list(F.struct("dim", "value"))).alias("_z"))
        return arr.select(
            "node_id",
            F.transform(F.col("_z"), lambda t: t["value"]).alias("embedding")
        ).localCheckpoint(eager=True)
    finally:
        scratch.cleanup()


def graphsage_train(
    graph: Graph,
    features: DataFrame,
    layer_dims: list[int],
    epochs: int = 5,
    learning_rate: float = 0.05,
    negative_samples: int = 2,
    seed: int = 42,
    return_history: bool = False,
) -> list[dict]:
    """Deterministic parity-mode trainer (see module docstring): full-batch
    GD on the unsupervised GraphSAGE loss over the FULL neighborhood mean
    (no sampling during training — removes the one nondeterminism the
    reference's sampled batches introduce). Returns weights for
    :func:`graphsage_predict`.
    """
    import numpy as np

    rows = features.select("node_id", "features").orderBy("node_id").collect()
    node_ids = [int(r["node_id"]) for r in rows]
    X = np.array([list(r["features"]) for r in rows], dtype=np.float64)
    pos = {v: i for i, v in enumerate(node_ids)}
    e_rows = (graph.edges.select("src", "dst").distinct()
              .orderBy("src", "dst").collect())
    pairs = [(pos[int(r["src"])], pos[int(r["dst"])]) for r in e_rows
             if int(r["src"]) in pos and int(r["dst"]) in pos]
    n = len(node_ids)
    if layer_dims[0] != X.shape[1]:
        raise ValueError("layer_dims[0] must equal the feature width")
    # sparse adjacency as edge-index arrays: O(E) memory, never an n×n
    # matrix (a 100k-node graph would need 80 GB dense). The neighbor-mean
    # operator A and its transpose are applied as vectorized gather +
    # np.add.at scatter over these arrays.
    e_src = np.array([s for s, _ in pairs], dtype=np.int64)
    e_dst = np.array([d for _, d in pairs], dtype=np.int64)
    m_edges = len(pairs)
    indeg = np.bincount(e_dst, minlength=n).astype(np.float64)[:, None]
    indeg_safe = np.where(indeg == 0, 1.0, indeg)

    def neigh_mean(h):
        """A @ h: per-dst mean of in-neighbor rows (gather + scatter-add)."""
        acc = np.zeros_like(h)
        np.add.at(acc, e_dst, h[e_src])
        return acc / indeg_safe

    def neigh_mean_t(m):
        """A.T @ m: scatter m[d]/indeg[d] back to each in-neighbor s."""
        out = np.zeros_like(m)
        np.add.at(out, e_src, m[e_dst] / indeg_safe[e_dst])
        return out

    init = init_weights(layer_dims, seed=seed)
    Ws = [np.array(l["w_self"]) for l in init]
    Wn = [np.array(l["w_neigh"]) for l in init]
    L = len(Ws)
    ns, lr = int(negative_samples), float(learning_rate)

    def forward(Ws, Wn):
        h = X
        cache = []
        for k in range(L):
            hn = neigh_mean(h)
            pre = h @ Ws[k].T + hn @ Wn[k].T
            act = np.maximum(pre, 0.0)
            nrm = np.linalg.norm(act, axis=1, keepdims=True)
            out = np.divide(act, np.where(nrm == 0, 1.0, nrm))
            cache.append((h, hn, pre, act, nrm, out))
            h = out
        return h, cache

    def backward(cache, dZ, Ws, Wn):
        gWs = [np.zeros_like(w) for w in Ws]
        gWn = [np.zeros_like(w) for w in Wn]
        for k in reversed(range(L)):
            h, hn, pre, act, nrm, out = cache[k]
            safe = np.where(nrm == 0, 1.0, nrm)
            # d l2-normalize: (dZ - out·(dZ·out per-row)) / nrm
            dot = (dZ * out).sum(axis=1, keepdims=True)
            dact = (dZ - out * dot) / safe
            dpre = dact * (pre > 0)
            gWs[k] = dpre.T @ h
            gWn[k] = dpre.T @ hn
            dh = dpre @ Ws[k] + neigh_mean_t(dpre @ Wn[k])
            dZ = dh
        return gWs, gWn

    # fixed hash-drawn negative set — the objective is then a single
    # deterministic full-batch function, so GD descends it (and the loss
    # history below is comparable across epochs)
    negs = np.array(
        [[int(_py_u01("gsneg", idx, t, seed) * n) for t in range(ns)]
         for idx in range(m_edges)], dtype=np.int64).reshape(m_edges, ns)

    def loss_and_grad(Z):
        """Vectorized unsupervised SAGE loss over all edges at once —
        O(E·d) gathers + deterministic np.add.at scatters (index order is
        fixed by the sorted edge list), no per-edge Python."""
        dZ = np.zeros_like(Z)
        zu, zv = Z[e_src], Z[e_dst]
        zp = np.clip((zu * zv).sum(axis=1), -30, 30)
        p = 1.0 / (1.0 + np.exp(-zp))
        tot = float(-np.log(np.clip(p, 1e-12, None)).sum())
        g = (p - 1.0)[:, None]  # positive pairs
        np.add.at(dZ, e_src, g * zv)
        np.add.at(dZ, e_dst, g * zu)
        for t in range(ns):
            w = negs[:, t]
            zw = Z[w]
            zng = np.clip((zu * zw).sum(axis=1), -30, 30)
            pneg = (1.0 / (1.0 + np.exp(-zng)))[:, None]
            tot += float(-np.log(np.clip(1.0 - pneg, 1e-12, None)).sum())
            np.add.at(dZ, e_src, pneg * zw)
            np.add.at(dZ, w, pneg * zu)
        m = max(1, m_edges)
        return tot / m, dZ / m

    history = []
    for _ in range(int(epochs)):
        Z, cache = forward(Ws, Wn)
        loss, dZ = loss_and_grad(Z)
        history.append(round(float(loss), 6))
        gWs, gWn = backward(cache, dZ, Ws, Wn)
        Ws = [w - lr * g for w, g in zip(Ws, gWs)]
        Wn = [w - lr * g for w, g in zip(Wn, gWn)]
    out = [{"w_self": Ws[k].tolist(), "w_neigh": Wn[k].tolist()}
           for k in range(L)]
    if return_history:
        return out, history
    return out
