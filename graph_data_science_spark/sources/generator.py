"""Seeded random graph generator — ``gds.graph.generate`` analog.

Reference: core/src/main/java/org/neo4j/gds/beta/generator/
RandomGraphGenerator.java:63 with RelationshipDistribution.java:34-59
(UNIFORM / RANDOM / POWER_LAW out-degree distributions, seeded).

Spark-first determinism: no RNG object is threaded through executors —
every random draw is a pure function ``xxhash64(node, slot, seed)`` of its
coordinates, so generation is embarrassingly parallel, reproducible at any
partitioning, and works unchanged at 10^12 nodes (``spark.range`` is a
synthetic distributed source with no input files). This is also the fixture
source for the skew tests: POWER_LAW plants the hub vertices the salting
path needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

UNIFORM = "UNIFORM"
RANDOM = "RANDOM"
POWER_LAW = "POWER_LAW"


def _u01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from coordinate hash (53-bit mantissa)."""
    h = F.xxhash64(*cols)
    return (F.pmod(h, F.lit(1 << 53)).cast("double")) / float(1 << 53)


def random_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: int = 4,
    distribution: str = UNIFORM,
    seed: int = 42,
    power_law_gamma: float = 2.5,
    max_degree: int | None = None,
    allow_self_loops: bool = False,
) -> DataFrame:
    """Edge DataFrame ``(src, dst)`` with the requested degree distribution.

    UNIFORM: every node has exactly ``average_degree`` out-edges.
    RANDOM: degree ~ Uniform[0, 2*average_degree] (mean = average_degree).
    POWER_LAW: degree ~ Pareto tail ``x_min * U^(-1/(gamma-1))`` clipped to
    ``max_degree`` (default node_count/2) — plants genuine hubs.
    Targets are uniform over nodes; parallel edges possible (dedup with
    ``distinct()`` if the algorithm needs a simple graph), matching the
    reference's multigraph-by-default generation.
    """
    nodes = spark.range(node_count).select(F.col("id").alias("src"))
    s = F.lit(int(seed))
    if distribution == UNIFORM:
        deg = F.lit(int(average_degree))
    elif distribution == RANDOM:
        deg = (F.floor(_u01(F.col("src"), F.lit(-1), s) * (2 * average_degree + 1))).cast("int")
    elif distribution == POWER_LAW:
        cap = max_degree if max_degree is not None else max(4, node_count // 2)
        x_min = max(1.0, average_degree * (power_law_gamma - 2) / (power_law_gamma - 1))
        u = _u01(F.col("src"), F.lit(-1), s)
        deg = F.least(
            F.floor(F.lit(x_min) * F.pow(F.lit(1.0) - u, F.lit(-1.0 / (power_law_gamma - 1)))),
            F.lit(cap),
        ).cast("int")
    else:
        raise ValueError(f"unknown distribution {distribution!r}")

    with_deg = nodes.select("src", deg.alias("_deg")).where(F.col("_deg") > 0)
    slots = with_deg.select(
        "src", F.explode(F.sequence(F.lit(0), F.col("_deg") - 1)).alias("_j")
    )
    dst = F.pmod(F.xxhash64(F.col("src"), F.col("_j"), s), F.lit(node_count))
    edges = slots.select("src", dst.alias("dst"))
    if not allow_self_loops:
        # re-draw self-loops once, then drop any residual
        redraw = F.pmod(F.xxhash64(F.col("src"), F.col("_j") + 1_000_003, s), F.lit(node_count))
        edges = slots.select(
            "src",
            F.when(dst == F.col("src"), redraw).otherwise(dst).alias("dst"),
        ).where(F.col("dst") != F.col("src"))
    return edges
