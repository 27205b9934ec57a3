"""K-core decomposition — ``gds.kcore`` analog.

Reference: algo/src/main/java/org/neo4j/gds/kcore/KCoreDecomposition.java —
iterative peeling on the undirected graph: repeatedly remove nodes of
degree < k; a node's core value is the largest k for which it survives.

Spark formulation:
- :func:`k_core` (membership for one k): peel as a superstep loop — each
  round drops nodes whose current degree < k and recounts; converges when
  no node is dropped. One partial-aggregated degree count + one semi-join
  per round.
- :func:`coreness`: peel with the CURRENT minimum degree as k (the
  reference's scanning approach): every round removes the min-degree
  shell and assigns it that core value. Rounds = number of distinct
  shells encountered, independent of node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph


def _undirected_simple(graph: Graph) -> DataFrame:
    e = graph.canonical_undirected_edges()
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def k_core(graph: Graph, k: int, max_iterations: int = 100) -> DataFrame:
    """Nodes of the k-core → ``(node_id, in_core: boolean)`` over all nodes."""
    spark = graph.nodes.sparkSession
    edges = _undirected_simple(graph).persist()
    alive = edges.select(F.col("src").alias("node_id")).distinct()
    for _ in range(max_iterations):
        cur = (
            edges.join(alive.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
        )
        deg = cur.groupBy(F.col("src").alias("node_id")).agg(F.count(F.lit(1)).alias("_d"))
        nxt = deg.where(F.col("_d") >= int(k)).select("node_id")
        nxt = nxt.localCheckpoint(eager=True)
        before = alive.count()
        after = nxt.count()
        alive = nxt
        if after == before or after == 0:
            break
    edges.unpersist()
    return graph.nodes.select("node_id").join(
        alive.withColumn("in_core", F.lit(True)), "node_id", "left"
    ).select("node_id", F.coalesce("in_core", F.lit(False)).alias("in_core"))


def coreness(graph: Graph, max_core: int = 10_000) -> DataFrame:
    """Core value per node → ``(node_id, core: long)``; isolated nodes = 0.

    For k = 1, 2, …: cascade-remove every node whose degree in the remaining
    subgraph is < k (their core value is the last k they survived), then
    stamp the survivors with core = k. Driver rounds = max core value ×
    cascade depth; each round is one partial-aggregated degree count + two
    semi-joins, state checkpointed to keep plans flat.
    """
    edges = _undirected_simple(graph).localCheckpoint(eager=True)
    result = graph.nodes.select("node_id", F.lit(0).cast("long").alias("core"))

    for k in range(1, max_core + 1):
        # cascade: peel nodes with degree < k until none remain
        while True:
            if edges.isEmpty():
                return result
            deg = edges.groupBy(F.col("src").alias("node_id")).agg(
                F.count(F.lit(1)).alias("_d"))
            low_count = deg.where(F.col("_d") < k).count()
            if low_count == 0:
                break
            keep = deg.where(F.col("_d") >= k).select("node_id")
            keep = keep.localCheckpoint(eager=True)
            edges = (
                edges.join(keep.withColumnRenamed("node_id", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
        # everyone left has degree ≥ k in the k-core subgraph
        survivors = edges.select(F.col("src").alias("node_id")).distinct()
        survivors = survivors.localCheckpoint(eager=True)
        result = result.join(
            survivors.withColumn("_s", F.lit(1)), "node_id", "left"
        ).select(
            "node_id",
            F.when(F.col("_s").isNotNull(), F.lit(k)).otherwise(F.col("core"))
            .cast("long").alias("core"),
        ).localCheckpoint(eager=True)
    return result
