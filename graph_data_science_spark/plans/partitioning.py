"""Partitioning & skew helpers.

Reference analog: degree partitioning of node batches
(core/src/main/java/org/neo4j/gds/core/partition/PartitionUtils.java:49,125)
— GDS balances thread batches by edge count. In Spark the equivalent hazards
are (a) aggregation skew on hub destinations and (b) join skew on hub
sources. Spark's hash aggregate already does map-side partial aggregation
(the combiner), and AQE splits skewed join partitions; the explicit salted
two-level aggregation below is for the residual case — a reduce key so hot
that even the partial-aggregated slices land on one reducer (the north rule's
"salted repartitioning and two-level aggregation").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def shuffle_hash(df: DataFrame) -> DataFrame:
    """Hint the vertex-state side of a superstep join to SHUFFLE_HASH.

    Without it, AQE re-BROADCASTS the multi-million-row vertex state every
    superstep (measured 2× superstep cost at 14M edges) — and a broadcast of
    per-vertex state is impossible at 10^12 nodes. With the hint, the cached
    edge table's ``HashPartitioning(src)`` is reused and only the small
    (state) side shuffles."""
    return df.hint("shuffle_hash")


def two_level_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    out: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """``SELECT key, sum(value)`` resistant to a single ultra-hot key.

    Level 1 groups by (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; level 2 sums the ≤``salt_buckets`` partials per
    key. For a 10^9-in-degree hub this caps any one reducer's share at
    1/salt_buckets of the hub's traffic.
    """
    value = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.col(key).cast("string")) + F.spark_partition_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def degree_stats(edges: DataFrame, key: str = "dst") -> dict:
    """Degree distribution summary — drives the salt/no-salt decision the way
    ImportSizing drives the reference's buffer layout
    (core/.../loading/ImportSizing.java:29)."""
    deg = edges.groupBy(key).agg(F.count(F.lit(1)).alias("d"))
    row = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.max("d").alias("max_degree"),
        F.avg("d").alias("avg_degree"),
        F.expr("percentile_approx(d, 0.99)").alias("p99_degree"),
    ).first()
    return {k: (float(v) if v is not None else 0.0) for k, v in row.asDict().items()}


def repartition_edges(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Hash-partition the edge table by ``src`` — the engine's canonical
    physical layout (SURVEY §4: persisted once, reused across supersteps)."""
    if num_partitions is None:
        num_partitions = edges.sparkSession.sparkContext.defaultParallelism
    return edges.repartition(num_partitions, "src")
