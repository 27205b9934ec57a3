"""Node embeddings: FastRP + seeded uniform random walks (node2vec input).

Reference analogs (algo/src/main/java/org/neo4j/gds/):
- ``gds.fastRP`` — embeddings/fastrp/FastRP.java:55: very-sparse random
  projection init (Achlioptas/Li: ±√3 w.p. 1/6 each, else 0), then L
  iterations of neighbor averaging with per-iteration L2 normalization,
  final embedding = Σ iterationWeights[i] · e_i (+ nodeSelfInfluence · e_0).
- ``gds.randomWalk`` — traversal/RandomWalk.java:49: seeded walks, uniform
  next-hop when p = q = 1 (the default); the biased second-order (p, q)
  cases raise NotImplementedError here — the uniform kernel is the
  deterministic core and the node2vec input producer.

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
        deg = edges.groupBy(F.col("dst").alias("node_id")).agg(
            F.count(F.lit(1)).alias("deg"))
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


def random_walks(
    graph: Graph,
    walk_length: int = 5,
    walks_per_node: int = 1,
    seed: int = 42,
    p: float = 1.0,
    q: float = 1.0,
    start_nodes: list[int] | None = None,
) -> DataFrame:
    """``gds.randomWalk`` analog (uniform / p=q=1) → (walk_id, step, node_id).

    walk_id = node_id * walks_per_node + walk index. A walk ends early at a
    node with no out-neighbors (no further rows). Next hop = the
    ``floor(u01(walk_id, step, seed) · out_deg)``-th out-neighbor in
    (dst ascending) order — pure hash, reproducible anywhere."""
    if p != 1.0 or q != 1.0:
        raise NotImplementedError(
            "biased node2vec walks (p/q != 1) are not implemented; the uniform "
            "kernel (GDS defaults) is — see module docstring")
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
        for step in range(1, int(walk_length)):
            pick = F.floor(_u01(F.col("walk_id"), F.lit(step), F.lit(int(seed)))
                           * F.col("deg")).cast("long")
            nxt = (cur.join(nbrs, cur.node_id == nbrs.src, "inner")
                   .where(F.col("idx") == pick)
                   .select("walk_id", F.lit(step).cast("long").alias("step"),
                           F.col("dst").alias("node_id")))
            nxt = scratch.truncate(nxt, "cur")
            if nxt.isEmpty():
                break
            out = scratch.truncate(out.unionByName(nxt), "out")
            cur = nxt
        return out.localCheckpoint(eager=True)
    finally:
        scratch.cleanup()
