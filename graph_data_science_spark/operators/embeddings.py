"""Node embeddings: FastRP + seeded uniform random walks (node2vec input).

Reference analogs (algo/src/main/java/org/neo4j/gds/):
- ``gds.fastRP`` — embeddings/fastrp/FastRP.java:55: very-sparse random
  projection init (Achlioptas/Li: ±√3 w.p. 1/6 each, else 0), then L
  iterations of neighbor averaging with per-iteration L2 normalization,
  final embedding = Σ iterationWeights[i] · e_i (+ nodeSelfInfluence · e_0).
- ``gds.randomWalk`` — traversal/RandomWalk.java:49: seeded walks; uniform
  next-hop when p = q = 1 (the default), full second-order node2vec
  (returnFactor 1/p, inOutFactor 1/q) weighted sampling otherwise — see
  :func:`random_walks`.

Determinism/portability: ALL randomness is a pure hash of
(entity, position, seed) — md5-based so the DuckDB oracle derives the SAME
u01 stream: Spark ``conv(substr(md5(s),1,15),16,10)`` equals DuckDB
``CAST('0x'||substr(md5(s),1,15) AS BIGINT)`` (60-bit, /2^60 → [0,1)).
No RNG state on executors, reproducible at any parallelism.

Layout: embeddings live in LONG format ``(node_id, dim, value)`` — the
iteration is then one edges ⋈ state shuffle join + a partial-aggregated
per-(dst, dim) mean, pure Catalyst; at 100 TB this is a d× blowup of the
message volume, the standard trade for staying in whole-stage codegen (a
CSR-block GEMM via mapInPandas is the alternative when d is large). The
final array form is assembled once at the end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph, UNDIRECTED
from graph_data_science_spark.operators.louvain import _Scratch

TWO60 = float(1 << 60)


def _u01(*cols) -> F.Column:
    """Portable hash-uniform in [0,1): md5 of ':'-joined args, top 60 bits."""
    s = F.concat_ws(":", *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("double") / F.lit(TWO60)


def fastrp(
    graph: Graph,
    embedding_dim: int = 8,
    iteration_weights: list[float] | None = None,
    node_self_influence: float = 0.0,
    seed: int = 42,
    long_format: bool = False,
) -> DataFrame:
    """``gds.fastRP`` analog → (node_id, embedding array<double>) — or, with
    ``long_format``, (node_id, dim, value) rounded 6dp (the oracle shape).

    Runs on the UNDIRECTED orientation like the reference (FastRP requires
    an undirected graph)."""
    if iteration_weights is None:
        iteration_weights = [0.0, 1.0, 1.0]
    spark = graph.nodes.sparkSession
    scratch = _Scratch(spark)
    try:
        g = graph.oriented(UNDIRECTED)
        edges = scratch.truncate(g.edges.select("src", "dst").distinct(), "edges")
        sqrt3 = math.sqrt(3.0)
        dims = spark.range(embedding_dim).select(F.col("id").cast("long").alias("dim"))
        u = _u01(F.col("node_id"), F.col("dim"), F.lit(int(seed)))
        state = graph.nodes.select("node_id").crossJoin(F.broadcast(dims)).select(
            "node_id", "dim",
            F.when(u < 1.0 / 6.0, F.lit(sqrt3))
            .when(u < 2.0 / 6.0, F.lit(-sqrt3))
            .otherwise(F.lit(0.0)).alias("value"),
        )
        state = scratch.truncate(state, "state")

        acc = None
        if node_self_influence:
            acc = state.select(
                "node_id", "dim",
                (F.col("value") * F.lit(float(node_self_influence))).alias("value"))
        for w in iteration_weights:
            # neighbor mean per (dst, dim)
            msgs = (
                edges.join(state.select(F.col("node_id").alias("src"),
                                        "dim", "value"), "src")
                .groupBy(F.col("dst").alias("node_id"), "dim")
                .agg(F.avg("value").alias("value"))
            )
            full = graph.nodes.select("node_id").crossJoin(F.broadcast(dims)) \
                .join(msgs, ["node_id", "dim"], "left") \
                .select("node_id", "dim", F.coalesce("value", F.lit(0.0)).alias("value"))
            norms = full.groupBy("node_id").agg(
                F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("_n"))
            state = full.join(norms, "node_id").select(
                "node_id", "dim",
                F.when(F.col("_n") > 0, F.col("value") / F.col("_n"))
                .otherwise(F.lit(0.0)).alias("value"))
            state = scratch.truncate(state, "state")
            if w:
                part = state.select("node_id", "dim",
                                    (F.col("value") * F.lit(float(w))).alias("value"))
                acc = part if acc is None else acc.unionByName(part)
                acc = scratch.truncate(acc, "acc")
        if acc is None:
            acc = state.select("node_id", "dim", F.lit(0.0).alias("value"))
        out_long = acc.groupBy("node_id", "dim").agg(
            F.round(F.sum("value"), 6).alias("value"))
        if long_format:
            return out_long.localCheckpoint(eager=True)
        arr = out_long.groupBy("node_id").agg(
            F.array_sort(F.collect_list(F.struct("dim", "value"))).alias("_z"))
        out = arr.select(
            "node_id",
            F.transform(F.col("_z"), lambda s: s["value"]).alias("embedding"))
        return out.localCheckpoint(eager=True)
    finally:
        scratch.cleanup()


def node2vec(
    graph: Graph,
    embedding_dim: int = 16,
    walk_length: int = 8,
    walks_per_node: int = 2,
    window_size: int = 3,
    negative_samples: int = 2,
    epochs: int = 1,
    learning_rate: float = 0.025,
    seed: int = 42,
    mode: str = "distributed",
    num_partitions: int | None = None,
) -> DataFrame:
    """``gds.node2vec`` analog → (node_id, embedding array<double>).

    Two phases, matching embeddings/node2vec/Node2Vec.java:32 (walks +
    skip-gram-negative-sampling training):

    1. WALKS — distributed, the :func:`random_walks` kernel (uniform
       p=q=1 defaults; the scale-bearing phase: walk volume is
       nodes × walks_per_node × walk_length).
    2. SGNS TRAINING — the reference trains with multi-threaded
       asynchronous SGD whose result is concurrency-dependent (its docs say
       so). Two deterministic modes here:

       ``mode="distributed"`` (default): synchronous full-batch gradient
       descent with partition-summed partials — the ml/mlp.py discipline.
       Per epoch: broadcast (w_in, w_out); every PAIR partition accumulates
       all its Arrow batches, sorts by (walk_id, s1, s2), computes the SGNS
       gradient VECTORIZED over all its pairs (negatives from a vectorized
       splitmix64 hash stream — per-pair-key-seeded, partition-layout
       independent) and emits per-node partial gradients tagged with its
       partition id; the driver sums partials in partition-id order — one
       fixed float summation tree at ANY parallelism — and applies the
       update. The PAIRS (the big side: n × walks × length × window rows)
       stay distributed; the model (2·n·d floats) is broadcast, the same
       state-fits-in-memory bound as mode="csr" PageRank. Full-batch GD
       descends a fixed objective, so the loss history is monotone-ish and
       testable.

       ``mode="parity"``: the round-2 single-group sequential-SGD mode —
       (center, context) pairs stream through ONE ``applyInPandas`` group
       in a fixed sort order, matching the reference's sequential
       trajectory shape. Valid while pairs fit one worker.

       For graphs where even n·d floats don't fit the driver, use
       :func:`fastrp` / :func:`hashgnn` (fully distributed models).
    """
    import numpy as np
    import pandas as pd

    spark = graph.nodes.sparkSession
    if mode not in ("distributed", "parity"):
        raise ValueError(f"unknown mode {mode!r}")
    walks = random_walks(graph, walk_length=walk_length,
                         walks_per_node=walks_per_node, seed=seed)
    # (center, context) skip-gram pairs within the window — distributed
    a = walks.select(F.col("walk_id"), F.col("step").alias("s1"),
                     F.col("node_id").alias("center"))
    b = walks.select(F.col("walk_id"), F.col("step").alias("s2"),
                     F.col("node_id").alias("context"))
    pairs = (a.join(b, "walk_id")
             .where((F.col("s1") != F.col("s2"))
                    & (F.abs(F.col("s1") - F.col("s2")) <= int(window_size)))
             .select("walk_id", "s1", "s2", "center", "context"))
    node_ids = [r[0] for r in graph.nodes.select("node_id")
                .orderBy("node_id").collect()]
    n, d = len(node_ids), int(embedding_dim)
    id_pos = {v: i for i, v in enumerate(node_ids)}
    ep, ns, lr0 = int(epochs), int(negative_samples), float(learning_rate)
    sd = int(seed)

    if mode == "distributed":
        return _node2vec_distributed(
            spark, pairs, node_ids, id_pos, n, d, ep, ns, lr0, sd,
            num_partitions)

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        rows = pdf.sort_values(["walk_id", "s1", "s2"]).reset_index(drop=True)
        # hash-seeded init, same very-sparse-free philosophy: uniform small
        rng_init = np.array([
            [int(hashlib.md5(f"{v}:{j}:{sd}".encode()).hexdigest()[:15], 16)
             / float(1 << 60) - 0.5 for j in range(d)] for v in node_ids
        ]) / d
        w_in = rng_init.copy()
        w_out = np.zeros((n, d))

        def u01(*args):
            s = ":".join(str(x) for x in args)
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / float(1 << 60)

        for e in range(ep):
            lr = lr0 * (1.0 - e / max(1, ep))
            for i, (wid, s1, s2, c, ctx) in enumerate(zip(
                    rows["walk_id"], rows["s1"], rows["s2"],
                    rows["center"], rows["context"])):
                ci, oi = id_pos[int(c)], id_pos[int(ctx)]
                targets = [(oi, 1.0)] + [
                    (id_pos[node_ids[int(u01("neg", e, i, k, sd) * n)]], 0.0)
                    for k in range(ns)]
                g_acc = np.zeros(d)
                for ti, label in targets:
                    z = float(w_in[ci] @ w_out[ti])
                    p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
                    g = lr * (label - p)
                    g_acc += g * w_out[ti]
                    w_out[ti] += g * w_in[ci]
                w_in[ci] += g_acc
        return pd.DataFrame({
            "node_id": node_ids,
            "embedding": [np.round(w_in[i], 6).tolist() for i in range(n)],
        })

    tagged = pairs.withColumn("_g", F.lit(0))
    return tagged.groupBy("_g").applyInPandas(
        train, schema="node_id long, embedding array<double>")


def _splitmix64(x):
    """Vectorized splitmix64 over uint64 numpy arrays — the deterministic,
    partition-layout-independent hash stream the distributed SGNS draws
    negatives from (no per-row Python, unlike the md5 u01 used where an
    oracle must reproduce the stream)."""
    import numpy as np
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def _node2vec_distributed(spark, pairs, node_ids, id_pos, n, d, ep, ns, lr0, sd,
                          num_partitions):
    """Synchronous full-batch SGNS: broadcast model, partition-summed
    gradients, driver update in partition-id order (see node2vec docstring)."""
    import hashlib

    import numpy as np
    import pandas as pd

    parts = int(num_partitions or spark.sparkContext.defaultParallelism)
    # deterministic layout: hash-partition by the pair key; each partition
    # re-sorts its full content, so the float summation tree depends only on
    # (key → partition) assignment = (key, parts), not on input order
    pair_df = (pairs.select("walk_id", "s1", "s2", "center", "context")
               .repartition(parts, "walk_id", "s1", "s2")
               .persist())
    m_pairs = max(1, pair_df.count())

    # hash-seeded init — identical philosophy (and constants) to parity mode
    w_in = np.array([
        [int(hashlib.md5(f"{v}:{j}:{sd}".encode()).hexdigest()[:15], 16)
         / float(1 << 60) - 0.5 for j in range(d)] for v in node_ids]) / d
    w_out = np.zeros((n, d))
    pos_of = id_pos

    sc = spark.sparkContext
    bc_pos = sc.broadcast(pos_of)
    history = []
    try:
        for e in range(ep):
            lr = lr0 * (1.0 - e / max(1, ep))
            bc_w = sc.broadcast((w_in, w_out))

            def partial(batches, _e=e):
                from pyspark import TaskContext
                wi, wo = bc_w.value
                pmap = bc_pos.value
                chunks = [pdf for pdf in batches if len(pdf)]
                if not chunks:
                    return
                whole = (pd.concat(chunks, ignore_index=True)
                         .sort_values(["walk_id", "s1", "s2"]))
                ci = np.array([pmap[int(v)] for v in whole["center"]],
                              dtype=np.int64)
                oi = np.array([pmap[int(v)] for v in whole["context"]],
                              dtype=np.int64)
                m = len(ci)
                # per-pair key (layout-independent): mix the pair identity
                key = _splitmix64(
                    whole["walk_id"].to_numpy(np.uint64)
                    ^ _splitmix64(whole["s1"].to_numpy(np.uint64)
                                  + np.uint64(0x1000 * (_e + 1)))
                    ^ _splitmix64(whole["s2"].to_numpy(np.uint64)
                                  + np.uint64(0x9E55 + sd)))
                g_in = np.zeros((n, d))
                g_out = np.zeros((n, d))
                loss = 0.0
                zu = wi[ci]
                # positive term
                z = np.clip((zu * wo[oi]).sum(axis=1), -30, 30)
                p = 1.0 / (1.0 + np.exp(-z))
                loss += float(-np.log(np.clip(p, 1e-12, None)).sum())
                g = (1.0 - p)[:, None]
                np.add.at(g_in, ci, g * wo[oi])
                np.add.at(g_out, oi, g * zu)
                # negative terms
                for k in range(ns):
                    wk = (_splitmix64(key + np.uint64(k + 1))
                          % np.uint64(n)).astype(np.int64)
                    zn = np.clip((zu * wo[wk]).sum(axis=1), -30, 30)
                    pn = 1.0 / (1.0 + np.exp(-zn))
                    loss += float(-np.log(np.clip(1.0 - pn, 1e-12, None)).sum())
                    gn = (-pn)[:, None]
                    np.add.at(g_in, ci, gn * wo[wk])
                    np.add.at(g_out, wk, gn * zu)
                touched = np.nonzero(
                    np.abs(g_in).sum(axis=1) + np.abs(g_out).sum(axis=1))[0]
                pid = TaskContext.get().partitionId()
                yield pd.DataFrame({
                    "pid": pid,
                    "pos": touched,
                    "gin": [g_in[t].tolist() for t in touched],
                    "gout": [g_out[t].tolist() for t in touched],
                    "loss": [loss] + [0.0] * (len(touched) - 1)
                    if len(touched) else [],
                })

            rows = pair_df.mapInPandas(
                partial,
                schema="pid int, pos long, gin array<double>, "
                       "gout array<double>, loss double",
            ).collect()
            # fixed summation tree: partials applied in (pid, pos) order
            rows.sort(key=lambda r: (r["pid"], r["pos"]))
            # MEAN gradient (sum / m): full-batch GD needs the classic
            # per-example scaling or the summed step diverges at any
            # reasonable lr; the scalar factor keeps bit-determinism
            scale = lr / m_pairs
            tot_loss = 0.0
            for r in rows:
                w_in[r["pos"]] += scale * np.asarray(r["gin"])
                w_out[r["pos"]] += scale * np.asarray(r["gout"])
                tot_loss += r["loss"]
            history.append(tot_loss / m_pairs)
            bc_w.unpersist()
    finally:
        pair_df.unpersist()

    out = spark.createDataFrame(pd.DataFrame({
        "node_id": node_ids,
        "embedding": [np.round(w_in[i], 6).tolist() for i in range(n)],
    }))
    out = out.localCheckpoint(eager=True)
    out.loss_history = history  # type: ignore[attr-defined]
    return out


def hashgnn(
    graph: Graph,
    feature_space: int = 64,
    density: float = 0.1,
    embedding_density: int = 8,
    iterations: int = 2,
    seed: int = 42,
) -> DataFrame:
    """``gds.hashgnn`` analog → (node_id, slot, feature) binary embeddings.

    HashGNN (embeddings/hashgnn/HashGNN.java; Tan et al. "Hashing-
    Accelerated Graph Neural Networks") replaces a GNN's float aggregation
    with min-hash sampling over binary features. Deterministic re-expression
    (the reference's neighborInfluence-weighted self/neighbor hash choice is
    collapsed to a single hash family — documented simplification):

    - init: node v holds feature f ∈ [0, feature_space) iff
      ``u01(v, f, seed) < density`` — the hash-seeded binary feature matrix.
    - iteration t, slot s ∈ [0, embedding_density): the new feature of v in
      slot s is ``argmin_{f ∈ F(v) ∪ ⋃_{u→v} F(u)} u01(t, s, f, seed)`` —
      one min-hash sample of the 1-hop feature union per slot; the new
      F(v) = the set of sampled features.

    Everything is min-aggregation over hashes — pure Catalyst (explode +
    partial-agg min per (node, slot)), fully SQL-oracle-checkable, and the
    scale shape is one edges ⋈ features join per iteration with message
    volume |E| · avg_features.
    """
    if int(iterations) < 1:
        raise ValueError("hashgnn requires iterations >= 1")
    spark = graph.nodes.sparkSession
    scratch = _Scratch(spark)
    try:
        edges = scratch.truncate(graph.edges.select("src", "dst").distinct(), "edges")
        feats = spark.range(int(feature_space)).select(
            F.col("id").cast("long").alias("feature"))
        init_u = _u01(F.col("node_id"), F.col("feature"), F.lit(int(seed)))
        state = (graph.nodes.select("node_id").crossJoin(F.broadcast(feats))
                 .where(init_u < float(density))
                 .select("node_id", "feature").distinct())
        state = scratch.truncate(state, "feat")
        slots = spark.range(int(embedding_density)).select(
            F.col("id").cast("long").alias("slot"))
        for t in range(int(iterations)):
            nbr = (edges.join(state.select(F.col("node_id").alias("src"),
                                           "feature"), "src")
                   .select(F.col("dst").alias("node_id"), "feature"))
            pool = state.unionByName(nbr).distinct()
            h = _u01(F.lit(t), F.col("slot"), F.col("feature"), F.lit(int(seed)))
            sampled = (pool.crossJoin(F.broadcast(slots))
                       .select("node_id", "slot", "feature", h.alias("_h"))
                       .groupBy("node_id", "slot")
                       .agg(F.min(F.struct(F.col("_h"), F.col("feature")))
                            .alias("_b"))
                       .select("node_id", "slot",
                               F.col("_b.feature").alias("feature")))
            sampled = scratch.truncate(sampled, "sampled")
            state = scratch.truncate(
                sampled.select("node_id", "feature").distinct(), "feat")
            last = sampled
        return last.localCheckpoint(eager=True)
    finally:
        scratch.cleanup()


def random_walks(
    graph: Graph,
    walk_length: int = 5,
    walks_per_node: int = 1,
    seed: int = 42,
    p: float = 1.0,
    q: float = 1.0,
    start_nodes: list[int] | None = None,
) -> DataFrame:
    """``gds.randomWalk`` analog → (walk_id, step, node_id).

    walk_id = node_id * walks_per_node + walk index. A walk ends early at a
    node with no out-neighbors (no further rows).

    Uniform kernel (p = q = 1, the GDS defaults): next hop = the
    ``floor(u01(walk_id, step, seed) · out_deg)``-th out-neighbor in
    (dst ascending) order — pure hash, reproducible anywhere.

    Biased second-order kernel (p ≠ 1 or q ≠ 1, node2vec Grover-Leskovec
    α-weights, traversal/RandomWalk.java:49 ``returnFactor``/``inOutFactor``):
    candidate x from t→v→x gets weight 1/p if x = t, 1 if edge t→x exists,
    else 1/q; the hop is the first candidate (dst ascending) whose running
    weight sum exceeds ``u01(walk_id, step, seed) · total_weight``. The
    running sum is an ORDER-DEFINED sequential window sum, so the DuckDB
    oracle reproduces it bit-for-bit; per step this is one neighbor join,
    one (prev, cand) edge-membership left join, and one per-walk window —
    walks are independent keys, so the window shuffle partitions cleanly.
    """
    from pyspark.sql import Window

    spark = graph.nodes.sparkSession
    scratch = _Scratch(spark)
    try:
        edges = graph.edges.select("src", "dst").distinct()
        w = Window.partitionBy("src").orderBy("dst")
        nbrs = edges.withColumn("idx", F.row_number().over(w) - 1)
        degs = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        nbrs = scratch.truncate(nbrs.join(degs, "src"), "nbrs")

        starts = graph.nodes.select("node_id") if start_nodes is None else \
            spark.createDataFrame([(int(s),) for s in start_nodes], "node_id long")
        wpn = int(walks_per_node)
        reps = spark.range(wpn).select(F.col("id").cast("long").alias("_r"))
        cur = starts.crossJoin(F.broadcast(reps)).select(
            (F.col("node_id") * wpn + F.col("_r")).alias("walk_id"),
            F.lit(0).cast("long").alias("step"),
            F.col("node_id"),
        )
        cur = scratch.truncate(cur, "cur")
        out = cur
        biased = not (p == 1.0 and q == 1.0)
        if not biased:
            for step in range(1, int(walk_length)):
                pick = F.floor(_u01(F.col("walk_id"), F.lit(step),
                                    F.lit(int(seed))) * F.col("deg")).cast("long")
                nxt = (cur.join(nbrs, cur.node_id == nbrs.src, "inner")
                       .where(F.col("idx") == pick)
                       .select("walk_id", F.lit(step).cast("long").alias("step"),
                               F.col("dst").alias("node_id")))
                nxt = scratch.truncate(nxt, "cur")
                if scratch._rows.get("cur", 0) == 0:  # count rode truncate
                    break
                out = scratch.truncate(out.unionByName(nxt), "out")
                cur = nxt
            return out.localCheckpoint(eager=True)

        # second-order (p, q) kernel — state carries the previous hop
        mark = edges.select(F.col("src").alias("_mt"), F.col("dst").alias("_mx"),
                            F.lit(True).alias("_isnbr"))
        cur2 = None  # (walk_id, prev, node_id)
        for step in range(1, int(walk_length)):
            if step == 1:
                pick = F.floor(_u01(F.col("walk_id"), F.lit(step),
                                    F.lit(int(seed))) * F.col("deg")).cast("long")
                nxt = (cur.join(nbrs, cur.node_id == nbrs.src, "inner")
                       .where(F.col("idx") == pick)
                       .select("walk_id", F.col("node_id").alias("prev"),
                               F.col("dst").alias("node_id")))
            else:
                cand = (cur2.join(nbrs.select(F.col("src"),
                                              F.col("dst").alias("cand")),
                                  cur2.node_id == F.col("src"), "inner")
                        .select("walk_id", "prev",
                                F.col("node_id").alias("cur"), "cand"))
                cand = cand.join(
                    mark, (cand.prev == mark._mt) & (cand.cand == mark._mx),
                    "left").drop("_mt", "_mx")
                wgt = (F.when(F.col("cand") == F.col("prev"), F.lit(1.0 / p))
                       .when(F.col("_isnbr").isNotNull(), F.lit(1.0))
                       .otherwise(F.lit(1.0 / q)))
                run = Window.partitionBy("walk_id").orderBy("cand") \
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                allw = Window.partitionBy("walk_id")
                thr = _u01(F.col("walk_id"), F.lit(step), F.lit(int(seed))) \
                    * F.sum("_w").over(allw)
                nxt = (cand.withColumn("_w", wgt)
                       .withColumn("_cum", F.sum("_w").over(run))
                       .withColumn("_thr", thr)
                       .where((F.col("_cum") > F.col("_thr"))
                              & (F.col("_cum") - F.col("_w") <= F.col("_thr")))
                       .select("walk_id", F.col("cur").alias("prev"),
                               F.col("cand").alias("node_id")))
            nxt = scratch.truncate(nxt, "cur2")
            if scratch._rows.get("cur2", 0) == 0:  # count rode truncate
                break
            out = scratch.truncate(out.unionByName(
                nxt.select("walk_id", F.lit(step).cast("long").alias("step"),
                           "node_id")), "out")
            cur2 = nxt
        return out.localCheckpoint(eager=True)
    finally:
        scratch.cleanup()
