"""``gds.alpha.linkprediction.*`` topological pair scorers.

Reference analog: ``alpha/alpha-proc/.../linkprediction/LinkPredictionFunc.java:39-122``
(+ ``NeighborsFinder.java``): per-node-pair functions adamicAdar /
resourceAllocation / commonNeighbors / preferentialAttachment /
totalNeighbors / sameCommunity.

The reference evaluates one pair at a time against the transactional store.
Spark-first, the unit of work is a PAIR TABLE: ``link_prediction_scores``
takes a DataFrame of ``(src, dst)`` candidate pairs and computes all scores
set-at-a-time — two shuffle-hash joins against the neighbor table plus one
broadcast-able degree join, so scoring 10^9 candidate pairs is the same plan
as scoring one. No per-pair lookups, no UDFs.

Semantic parity (NeighborsFinder.java):
- ``N(v)`` = distinct other-endpoints of v's relationships in ``direction``
  (``both`` | ``out`` | ``in``), self excluded (``!endNode.equals(node)``).
- commonNeighbors(a,b) = N_dir(a) ∩ {w : w —flip(dir)→ b}; for the default
  ``both`` this is N(a) ∩ N(b); a == b → 0 (``findCommonNeighbors`` returns
  the empty set for identical nodes).
- adamicAdar = Σ_c 1/ln(deg(c)), resourceAllocation = Σ_c 1/deg(c) over the
  common neighbors c, where deg is the RELATIONSHIP-count degree in
  ``direction`` (node.getDegree — parallel edges count, self-loops count
  once for ``both``).
- totalNeighbors = |N(a) ∪ N(b)| (same-direction sets on both sides).
- preferentialAttachment = deg(a) · deg(b).
- sameCommunity = 1.0 iff both nodes carry the community property and the
  values are equal (missing property → 0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph


def _neighbors(g: Graph, direction: str) -> DataFrame:
    """Distinct ``(node, nbr)`` pairs in ``direction``; self-loops dropped."""
    e = g.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    out = e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    inn = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    if direction == "out":
        n = out
    elif direction == "in":
        n = inn
    elif direction == "both":
        n = out.unionByName(inn)
    else:
        raise ValueError(f"unknown direction {direction!r}")
    return n.distinct()


def _rel_degree(g: Graph, direction: str) -> DataFrame:
    """Relationship-count degree ``(node, deg)`` — Node.getDegree parity:
    parallel edges count; for ``both`` a self-loop counts ONCE (Neo4j
    counts the loop relationship, not both of its endpoints)."""
    e = g.edges
    out = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("_o"))
    inn = e.where(F.col("src") != F.col("dst")).groupBy(
        F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("_i"))
    if direction == "out":
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg"))
    elif direction == "in":
        deg = e.groupBy(F.col("dst").alias("node")).agg(
            F.count(F.lit(1)).alias("deg"))
    else:
        deg = (out.join(inn, "node", "full")
               .select("node",
                       (F.coalesce("_o", F.lit(0))
                        + F.coalesce("_i", F.lit(0))).alias("deg")))
    return deg


def link_prediction_scores(
    g: Graph,
    pairs: DataFrame,
    direction: str = "both",
    community_col: str | None = None,
) -> DataFrame:
    """Score every ``(src, dst)`` pair with the six reference functions.

    Returns ``(src, dst, common_neighbors, adamic_adar,
    resource_allocation, preferential_attachment, total_neighbors
    [, same_community])`` — ``same_community`` only when ``community_col``
    names a column on ``g.nodes``.

    Plan shape: the pair table joins the neighbor table once per endpoint
    (the common-neighbor wedge join — the only edge-sized shuffle), the
    common-neighbor aggregate folds count/AA/RA in ONE partial agg keyed by
    the pair, and the per-endpoint degree/neighbor-size tables are
    node-sized (broadcast-able at dimension scale). Hub skew in the wedge
    join is bounded by the pair table's own degree profile, the same
    exposure as the reference's per-pair neighborhood scan.
    """
    flip = {"out": "in", "in": "out", "both": "both"}[direction]
    nbrs = _neighbors(g, direction)
    deg = _rel_degree(g, direction)
    p = pairs.select("src", "dst").distinct()

    # wedge join: src's neighbors (direction) that also reach dst via
    # flip(direction) — NeighborsFinder.findCommonNeighbors
    a = nbrs.select(F.col("node").alias("src"), F.col("nbr").alias("_c"))
    b = _neighbors(g, flip).select(
        F.col("node").alias("dst"), F.col("nbr").alias("_c"))
    common = (
        p.where(F.col("src") != F.col("dst"))
        .join(a, "src")
        .join(b, ["dst", "_c"])
        .join(deg.select(F.col("node").alias("_c"),
                         F.col("deg").alias("_cdeg")), "_c")
        .groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("_cdeg"))).alias("adamic_adar"),
            F.sum(F.lit(1.0) / F.col("_cdeg")).alias("resource_allocation"),
        )
    )

    # |N(a) ∩ N(b)| over SAME-direction sets (totalNeighbors' union term).
    # For the default ``both`` this is exactly the common-neighbor count
    # (flip(both) == both), so reuse that aggregate instead of paying a
    # second edge-sized wedge join; directed cases compute it honestly.
    if direction == "both":
        inter = common.select(
            "src", "dst", F.col("common_neighbors").alias("_inter"))
    else:
        a2 = nbrs.select(F.col("node").alias("dst"), F.col("nbr").alias("_c"))
        inter = (
            p.where(F.col("src") != F.col("dst"))
            .join(a, "src").join(a2, ["dst", "_c"])
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("double").alias("_inter"))
        )

    nsize = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("_n"))
    sdeg = deg.select(F.col("node").alias("src"), F.col("deg").alias("_sd"))
    ddeg = deg.select(F.col("node").alias("dst"), F.col("deg").alias("_dd"))
    ssz = nsize.select(F.col("node").alias("src"), F.col("_n").alias("_sn"))
    dsz = nsize.select(F.col("node").alias("dst"), F.col("_n").alias("_dn"))

    out = (
        p.join(common, ["src", "dst"], "left")
        .join(inter, ["src", "dst"], "left")
        .join(sdeg, "src", "left").join(ddeg, "dst", "left")
        .join(ssz, "src", "left").join(dsz, "dst", "left")
        .select(
            "src", "dst",
            F.coalesce("common_neighbors", F.lit(0.0)).alias(
                "common_neighbors"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0)).alias(
                "resource_allocation"),
            (F.coalesce("_sd", F.lit(0)) * F.coalesce("_dd", F.lit(0)))
            .cast("double").alias("preferential_attachment"),
            # |N(a) ∪ N(b)| = |N(a)| + |N(b)| − |N(a) ∩ N(b)|; for a == b
            # the union is just N(a)
            F.when(F.col("src") == F.col("dst"),
                   F.coalesce("_sn", F.lit(0)).cast("double"))
            .otherwise(
                (F.coalesce("_sn", F.lit(0)) + F.coalesce("_dn", F.lit(0))
                 ).cast("double") - F.coalesce("_inter", F.lit(0.0)))
            .alias("total_neighbors"),
        )
    )

    if community_col is not None:
        comm = g.nodes.select("node_id", community_col)
        out = (
            out.join(comm.select(F.col("node_id").alias("src"),
                                 F.col(community_col).alias("_sc")),
                     "src", "left")
            .join(comm.select(F.col("node_id").alias("dst"),
                              F.col(community_col).alias("_dc")),
                  "dst", "left")
            .withColumn(
                "same_community",
                F.when(F.col("_sc").isNotNull() & F.col("_dc").isNotNull()
                       & (F.col("_sc") == F.col("_dc")),
                       F.lit(1.0)).otherwise(F.lit(0.0)))
            .drop("_sc", "_dc")
        )
    return out
