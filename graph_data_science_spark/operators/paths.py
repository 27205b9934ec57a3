"""Path/traversal algorithms: BFS, single-source shortest path, DAG levels.

Reference analogs (algo/src/main/java/org/neo4j/gds/):
- ``gds.bfs`` (traversal/Bfs.java) → :func:`bfs` — hop distance from a
  source; the streaming order the reference emits is a traversal artifact,
  the deterministic result is the distance map.
- ``gds.bellmanFord`` / ``gds.allShortestPaths.delta`` (paths/delta/
  DeltaStepping.java) → :func:`shortest_paths` — iterative relaxation over
  the frontier; Spark's shuffle-join superstep IS delta-stepping with one
  bucket; non-negative weights converge in ≤ longest-shortest-path hops.
- ``gds.dag.topologicalSort`` / ``gds.dag.longestPath`` (dag/) →
  :func:`dag_levels` — longest-path-from-roots level per node, the
  deterministic core of both procs (a valid topological order = sort by
  level; longestPath = the level itself when weights are 1).

All three share the Pregel frontier pattern: per superstep one edges ⋈
active-frontier join + one partial-aggregated min/max + one state join.
Frontier shrinks as distances settle (vote-to-halt), so late supersteps
touch a small fraction of the graph.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.plans.partitioning import shuffle_hash
from graph_data_science_spark.plans.pregel import ACTIVE_COL, Pregel

_INF = float("inf")


@dataclass
class PathResult:
    distances: DataFrame  # (node_id, distance) — unreachable = Infinity
    ran_iterations: int
    converged: bool


def _frontier_min(graph: Graph, init_dist, relax_expr, max_iterations: int,
                  weighted: bool) -> PathResult:
    spark = graph.nodes.sparkSession
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    edges = graph.edges.select(*cols).persist()

    state = graph.nodes.select(
        "node_id",
        init_dist.alias("dist"),
        (init_dist < F.lit(_INF)).cast("int").alias(ACTIVE_COL),
    )

    def step(st: DataFrame, superstep: int) -> DataFrame:
        frontier = shuffle_hash(st.where(F.col(ACTIVE_COL) == 1).select(
            F.col("node_id").alias("_n"), F.col("dist").alias("_d")
        ))
        cand = edges.join(frontier, edges.src == F.col("_n"), "inner").select(
            F.col("dst"), relax_expr.alias("_cand")
        ).groupBy("dst").agg(F.min("_cand").alias("_best"))
        joined = st.join(shuffle_hash(cand), st.node_id == cand.dst, "left")
        new_dist = F.least(F.col("dist"), F.coalesce(F.col("_best"), F.col("dist")))
        return joined.select(
            st.node_id,
            new_dist.alias("dist"),
            (new_dist < F.col("dist")).cast("int").alias(ACTIVE_COL),
        )

    driver = Pregel(spark, max_iterations=max_iterations)
    res = driver.run(state, step)
    edges.unpersist()
    return PathResult(
        res.state.select("node_id", F.col("dist").alias("distance")),
        res.ran_iterations, res.converged,
    )


def bfs(graph: Graph, source: int, max_iterations: int = 100) -> PathResult:
    """Hop distance from ``source`` → (node_id, distance); unreachable = inf."""
    init = F.when(F.col("node_id") == int(source), F.lit(0.0)).otherwise(F.lit(_INF))
    return _frontier_min(
        graph, init, F.col("_d") + F.lit(1.0), max_iterations, weighted=False)


def shortest_paths(graph: Graph, source: int, weighted: bool = True,
                   max_iterations: int = 100) -> PathResult:
    """Single-source shortest paths (Bellman-Ford relaxation; delta-stepping
    with one bucket). Non-negative weights assumed; raises after
    ``max_iterations`` without convergence (negative-cycle guard)."""
    if weighted and not graph.has_weight():
        raise ValueError("weighted shortest paths require edges.weight")
    init = F.when(F.col("node_id") == int(source), F.lit(0.0)).otherwise(F.lit(_INF))
    relax = F.col("_d") + (F.col("weight") if weighted else F.lit(1.0))
    return _frontier_min(graph, init, relax, max_iterations, weighted=weighted)


def dag_levels(graph: Graph, max_iterations: int = 100) -> DataFrame:
    """Longest-path-from-roots level per node → (node_id, level).

    Level 0 = nodes with no in-edges; level(v) = 1 + max(level(u)) over
    in-neighbors. Any sort by (level, node_id) is a valid topological order.
    Diverges (hits max_iterations) on cyclic graphs — the DAG validation the
    reference performs up front.
    """
    spark = graph.nodes.sparkSession
    edges = graph.edges.select("src", "dst").persist()

    state = graph.nodes.select(
        "node_id", F.lit(0).cast("long").alias("level"),
        F.lit(1).cast("int").alias(ACTIVE_COL),
    )

    def step(st: DataFrame, superstep: int) -> DataFrame:
        frontier = shuffle_hash(st.where(F.col(ACTIVE_COL) == 1).select(
            F.col("node_id").alias("_n"), F.col("level").alias("_l")
        ))
        cand = edges.join(frontier, edges.src == F.col("_n"), "inner").select(
            F.col("dst"), (F.col("_l") + 1).alias("_cand")
        ).groupBy("dst").agg(F.max("_cand").alias("_best"))
        joined = st.join(shuffle_hash(cand), st.node_id == cand.dst, "left")
        new_level = F.greatest(F.col("level"), F.coalesce(F.col("_best"), F.col("level")))
        return joined.select(
            st.node_id,
            new_level.alias("level"),
            (new_level > F.col("level")).cast("int").alias(ACTIVE_COL),
        )

    driver = Pregel(spark, max_iterations=max_iterations)
    res = driver.run(state, step)
    edges.unpersist()
    if not res.converged:
        raise ValueError(
            f"dag_levels did not converge in {max_iterations} iterations — graph has a cycle")
    return res.state.select("node_id", "level")
