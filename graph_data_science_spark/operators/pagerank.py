"""PageRank / ArticleRank / Eigenvector — delta-push power iteration.

Reference semantics (algo/src/main/java/org/neo4j/gds/pagerank/
PageRankComputation.java:59-108), reproduced EXACTLY:

- init: ``rank = delta = 1 - dampingFactor`` (alpha) for all nodes — or only
  ``sourceNodes`` when personalized, others 0 (L65-74).
- superstep: ``new_delta = dampingFactor * sum(incoming messages)``;
  ``rank += new_delta`` (L81-88).
- a node sends ``delta / degree`` to out-neighbors iff ``delta > tolerance``
  or it is the initial superstep (L90-94). A node with out-degree 0 sends
  nothing — **dangling mass is NOT redistributed** and scores are NOT
  normalized (sink-only nodes converge to exactly ``1-d`` = 0.15).
- weighted: message × edge weight; the sending degree is the weighted degree
  summing only weights > 0 (algo/.../degree/DegreeCentrality.java:315-319;
  negative/zero weights ignored).
- messages merged by sum — the ReducingMessenger combiner
  (pregel/.../ReducingMessenger.java:42-100) = Spark's partial-aggregated
  ``groupBy(dst).sum`` (map-side combine is the combiner).
- converged when no node sends (all deltas ≤ tolerance) — vote-to-halt.

Config defaults mirror PageRankConfig.java:41-66: dampingFactor 0.85,
tolerance 1e-7, maxIterations 20, optional sourceNodes / weights / scaler.

Spark plan per superstep: one shuffle join (edges ⋈ active senders on src —
AQE skew-join splits hub sources) + one partial-aggregated shuffle sum on dst
(optionally salted two-level via ``skew_salt``) + one join back onto state.
State is persisted per superstep and lineage is broken periodically by the
Pregel driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.plans.partitioning import shuffle_hash, two_level_sum
from graph_data_science_spark.plans.pregel import ACTIVE_COL, Pregel
from graph_data_science_spark.operators.scale_properties import apply_scaler


@dataclass
class PageRankResult:
    scores: DataFrame  # (node_id, score)
    ran_iterations: int
    converged: bool
    metrics: list[dict]


def _prep_edges(graph: Graph, weighted: bool) -> DataFrame:
    if weighted:
        if not graph.has_weight():
            raise ValueError("weighted PageRank requires edges.weight")
        return graph.edges.select("src", "dst", "weight").where(F.col("weight") > 0.0)
    return graph.edges.select("src", "dst")


def pagerank(
    graph: Graph,
    damping_factor: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
    source_nodes: list[int] | None = None,
    scaler: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    skew_salt: int = 0,
    mode: str = "join",
) -> PageRankResult:
    """GDS ``gds.pageRank`` analog. Returns (node_id, score) + run stats.

    ``mode="join"`` (default): shuffle-join superstep — the 10^12-edge
    cluster path. ``mode="csr"``: Arrow gather-scatter with NumPy vertex
    state (plans/csr.py) — the single-node-class fast path, valid while
    state fits in memory (same bound as the shared-memory reference);
    checkpoint/resume is a join-mode feature.
    """
    if mode == "csr":
        if checkpoint_dir or resume:
            raise ValueError("checkpoint/resume requires mode='join'")
        from graph_data_science_spark.plans.csr import pagerank_csr

        scores, ran, converged, metrics = pagerank_csr(
            graph, damping_factor, tolerance, max_iterations, weighted, source_nodes)
        if scaler:
            scores = apply_scaler(scores, "score", scaler)
        return PageRankResult(scores, ran, converged, metrics)
    return _delta_push(
        graph, damping_factor, tolerance, max_iterations, weighted, source_nodes,
        scaler, checkpoint_dir, resume, skew_salt, degree_shift=0.0, mode=mode,
    )


def article_rank(
    graph: Graph,
    damping_factor: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
    source_nodes: list[int] | None = None,
    scaler: str | None = None,
    checkpoint_dir: str | None = None,
) -> PageRankResult:
    """``gds.articleRank``: PageRank variant dividing by (degree + avgDegree)
    (algo/.../pagerank/ArticleRankComputation.java; avg degree from
    PageRankAlgorithmFactory.java:51-60)."""
    deg = graph.degrees("out", weighted=weighted)
    avg_degree = (
        deg.agg(F.avg("degree")).first()[0] or 0.0
    )
    return _delta_push(
        graph, damping_factor, tolerance, max_iterations, weighted, source_nodes,
        scaler, checkpoint_dir, False, 0, degree_shift=float(avg_degree), mode="join",
    )


def pagerank_incremental(
    graph: Graph,
    prev_scores: DataFrame,
    damping_factor: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
) -> PageRankResult:
    """Warm-start PageRank on an UPDATED graph from the previous run's
    converged ``(node_id, score)`` — the companion to streaming ingestion
    (streaming/ingest.py emits edge deltas; this re-solves only the
    perturbed region instead of the whole graph).

    Push-residual formulation: the delta-push kernel maintains the
    invariant *rank + pending-push mass = fixpoint*. Seeding
    ``rank = prev`` and ``delta = r`` with the fixpoint residual on the
    NEW graph

        r_v = α + d · Σ_in prev_u / deg'_u − prev_v

    restores that invariant exactly, so the unchanged superstep converges
    to the same fixpoint a from-scratch run reaches — but the initial
    frontier is only nodes whose residual exceeds the tolerance, i.e. the
    nodes actually touched by the edge delta (new nodes enter with
    prev = 0 → residual α + inflow). Edge DELETIONS make residuals
    negative, so activity and convergence test ``|delta|`` — a strict
    superset of the reference kernel's positive-delta condition
    (PageRankComputation.java:90, which never sees negative deltas
    because from-scratch pushes are monotone).

    At 100 TB this is the difference between re-running 20 supersteps of
    full message volume per ingest batch and pushing a frontier
    proportional to the batch's blast radius; the plan per superstep is
    identical to :func:`pagerank` (one shuffle join + one partial-agg sum
    + state join)."""
    spark = graph.nodes.sparkSession
    alpha = 1.0 - damping_factor
    edges = _prep_edges(graph, weighted).persist()

    deg = graph.degrees("out", weighted=weighted)
    prev = prev_scores.select(
        F.col("node_id").alias("_pn"), F.col("score").alias("_prev"))
    base = (deg.join(prev, deg.node_id == F.col("_pn"), "left")
            .select("node_id", "degree",
                    F.coalesce("_prev", F.lit(0.0)).alias("rank")))

    # one superstep-shaped job computes the residual on the new topology
    senders0 = shuffle_hash(
        base.where((F.col("rank") != 0.0) & (F.col("degree") > 0.0))
        .select("node_id", F.col("rank").alias("_r"), "degree"))
    m0 = F.col("_r") / F.col("degree")
    if weighted:
        m0 = m0 * F.col("weight")
    inflow = (edges.join(senders0, edges.src == senders0.node_id, "inner")
              .select(F.col("dst"), m0.alias("m"))
              .groupBy("dst").agg(F.sum("m").alias("inflow")))
    # rank absorbs the residual immediately (x* = prev + Σ_{k≥0}(dP^T)^k r,
    # and the superstep only accumulates the k≥1 terms) — exactly the
    # from-scratch pattern rank = delta = α, which this reduces to when
    # prev ≡ 0
    state = (base.join(shuffle_hash(inflow),
                       base.node_id == inflow.dst, "left")
             .select(
                 base.node_id, base.degree,
                 (F.lit(alpha)
                  + F.lit(damping_factor) * F.coalesce("inflow", F.lit(0.0))
                  - F.col("rank")).alias("delta"),
                 F.col("rank"))
             .select(
                 "node_id", "degree",
                 (F.col("rank") + F.col("delta")).alias("rank"), "delta",
                 (F.abs(F.col("delta")) > F.lit(tolerance))
                 .cast("int").alias(ACTIVE_COL)))

    msg_val = F.col("delta") / F.col("degree")
    if weighted:
        msg_val = msg_val * F.col("weight")

    def step(st: DataFrame, superstep: int) -> DataFrame:
        senders = shuffle_hash(
            st.where(F.col(ACTIVE_COL) == 1)
            .select("node_id", "delta", "degree"))
        raw = edges.join(senders, edges.src == senders.node_id,
                         "inner").select(F.col("dst"), msg_val.alias("m"))
        msgs = raw.groupBy("dst").agg(F.sum("m").alias("msg"))
        joined = st.join(shuffle_hash(msgs), st.node_id == msgs.dst, "left")
        new_delta = F.coalesce(
            F.lit(damping_factor) * F.col("msg"), F.lit(0.0))
        return joined.select(
            st.node_id,
            st.degree,
            (F.col("rank") + new_delta).alias("rank"),
            new_delta.alias("delta"),
            (F.abs(new_delta) > F.lit(tolerance)).cast("int").alias(ACTIVE_COL),
        )

    driver = Pregel(
        spark,
        max_iterations=max(0, max_iterations - 1),
        extra_metrics={"delta_max": F.max(F.abs(F.col("delta"))),
                       "rank_sum": F.sum("rank")},
    )
    res = driver.run(state, step)
    edges.unpersist()
    return PageRankResult(
        res.state.select("node_id", F.col("rank").alias("score")),
        res.ran_iterations + 1, res.converged, res.metrics)


def _delta_push(
    graph: Graph,
    damping_factor: float,
    tolerance: float,
    max_iterations: int,
    weighted: bool,
    source_nodes: list[int] | None,
    scaler: str | None,
    checkpoint_dir: str | None,
    resume: bool,
    skew_salt: int,
    degree_shift: float,
    mode: str,
) -> PageRankResult:
    spark = graph.nodes.sparkSession
    alpha = 1.0 - damping_factor
    edges = _prep_edges(graph, weighted).persist()

    deg = graph.degrees("out", weighted=weighted)
    if source_nodes is not None:
        init_rank = F.when(F.col("node_id").isin([int(s) for s in source_nodes]),
                           F.lit(alpha)).otherwise(F.lit(0.0))
    else:
        init_rank = F.lit(alpha)
    state = deg.select(
        "node_id",
        (F.col("degree") + F.lit(degree_shift)).alias("degree"),
        init_rank.alias("rank"),
        init_rank.alias("delta"),
        # initial superstep sends regardless of tolerance (PageRankComputation
        # L90: `delta > tolerance || isInitialSuperstep`); zero-delta nodes
        # would send zeros — skip them, which is message-equivalent.
        (init_rank > 0.0).cast("int").alias(ACTIVE_COL),
    )

    msg_val = F.col("delta") / F.col("degree")
    if weighted:
        msg_val = msg_val * F.col("weight")

    def step(st: DataFrame, superstep: int) -> DataFrame:
        senders = shuffle_hash(
            st.where(F.col(ACTIVE_COL) == 1).select("node_id", "delta", "degree"))
        raw = edges.join(senders, edges.src == senders.node_id, "inner").select(
            F.col("dst"), msg_val.alias("m")
        )
        if skew_salt and skew_salt > 1:
            msgs = two_level_sum(raw, "dst", "m", "msg", salt_buckets=skew_salt)
        else:
            msgs = raw.groupBy("dst").agg(F.sum("m").alias("msg"))
        joined = st.join(shuffle_hash(msgs), st.node_id == msgs.dst, "left")
        new_delta = F.coalesce(F.lit(damping_factor) * F.col("msg"), F.lit(0.0))
        return joined.select(
            st.node_id,
            st.degree,
            (F.col("rank") + new_delta).alias("rank"),
            new_delta.alias("delta"),
            (new_delta > F.lit(tolerance)).cast("int").alias(ACTIVE_COL),
        )

    # GDS counts the send-only initial superstep in maxIterations
    # (Pregel.java:172-210 runs maxIterations supersteps, the first of which
    # only sends) — so the number of message exchanges is maxIterations - 1.
    driver = Pregel(
        spark,
        max_iterations=max(0, max_iterations - 1),
        checkpoint_dir=checkpoint_dir,
        extra_metrics={"delta_max": F.max("delta"), "rank_sum": F.sum("rank")},
        manifest={"algorithm": "pagerank", "damping_factor": damping_factor,
                  "tolerance": tolerance, "weighted": weighted,
                  "source_nodes": source_nodes, "degree_shift": degree_shift},
    )
    res = driver.run(state, step, resume=resume)
    edges.unpersist()
    scores = res.state.select("node_id", F.col("rank").alias("score"))
    if scaler:
        scores = apply_scaler(scores, "score", scaler)
    return PageRankResult(scores, res.ran_iterations + 1, res.converged, res.metrics)


def eigenvector(
    graph: Graph,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
) -> PageRankResult:
    """``gds.eigenvector``: no damping; per-superstep global L2 normalization
    + max-diff convergence in masterCompute
    (algo/.../pagerank/EigenvectorComputation.java:115-156)."""
    spark = graph.nodes.sparkSession
    edges = _prep_edges(graph, weighted).persist()
    n = graph.node_count()
    init = 1.0 / (n ** 0.5) if n else 0.0
    state = graph.nodes.select(
        "node_id", F.lit(init).alias("rank"), F.lit(1).cast("int").alias(ACTIVE_COL)
    )

    mval = F.col("rank") * F.col("weight") if weighted else F.col("rank")

    def step(st: DataFrame, superstep: int) -> DataFrame:
        senders = shuffle_hash(st.select("node_id", "rank"))
        msgs = (
            edges.join(senders, edges.src == senders.node_id, "inner")
            .select(F.col("dst"), mval.alias("m"))
            .groupBy("dst").agg(F.sum("m").alias("msg"))
        )
        joined = st.join(msgs, st.node_id == msgs.dst, "left").select(
            st.node_id, st.rank.alias("old_rank"),
            F.coalesce(F.col("msg"), F.lit(0.0)).alias("unnorm"),
        )
        norm = joined.agg(
            F.sqrt(F.sum(F.col("unnorm") * F.col("unnorm"))).alias("_norm"))
        return (
            joined.crossJoin(F.broadcast(norm))
            .select(
                "node_id",
                F.when(F.col("_norm") > 0, F.col("unnorm") / F.col("_norm"))
                .otherwise(F.lit(0.0)).alias("rank"),
                "old_rank",
            )
            .select(
                "node_id", "rank",
                (F.abs(F.col("rank") - F.col("old_rank")) > tolerance).cast("int").alias(ACTIVE_COL),
            )
        )

    driver = Pregel(spark, max_iterations=max_iterations, checkpoint_dir=checkpoint_dir)
    res = driver.run(state, step)
    edges.unpersist()
    return PageRankResult(
        res.state.select("node_id", F.col("rank").alias("score")),
        res.ran_iterations, res.converged, res.metrics,
    )
