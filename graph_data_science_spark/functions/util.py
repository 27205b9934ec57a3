"""``gds.util.*`` / ``gds.version`` function parity.

Reference: proc/common/src/main/java/org/neo4j/gds/functions/
IsFiniteFunc.java:27-49 (isFinite/isInfinite/infinity/NaN — note
``isInfinite`` is the exact complement of ``isFinite``, so NULL →
true), AsNodeFunc.java (asNode/asNodes — node row for an internal id,
null/empty when absent), NodePropertyFunc.java (property value from a
named catalog graph), proc/sysinfo/.../VersionFunc.java.

The scalar predicates are pure Column expressions (codegen, no UDF);
the node-materializing functions are DataFrame joins — Spark's analog
of "return the node object" is attaching the node row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from graph_data_science_spark.graph import Graph

VERSION = "0.3.0"  # round-3 engine


def version() -> str:
    """``gds.version()`` analog."""
    return VERSION


def is_finite(col: Column | str) -> Column:
    """``gds.util.isFinite``: true iff finite (not ±Inf, NaN, or NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    return (d.isNotNull() & ~F.isnan(d)
            & (d != F.lit(float("inf"))) & (d != F.lit(float("-inf"))))


def is_infinite(col: Column | str) -> Column:
    """``gds.util.isInfinite``: the exact complement of ``isFinite``
    (IsFiniteFunc.java:36 — NULL and NaN are 'infinite' too)."""
    return ~is_finite(col)


def infinity() -> Column:
    """``gds.util.infinity()``."""
    return F.lit(float("inf"))


def nan() -> Column:
    """``gds.util.NaN()``."""
    return F.lit(float("nan"))


def as_node(graph: Graph, df: DataFrame, id_col: str = "node_id",
            prefix: str = "node_") -> DataFrame:
    """``gds.util.asNode``: attach the node row for each id in
    ``df[id_col]`` — node property columns arrive prefixed with
    ``prefix``; ids with no node leave them NULL (AsNodeFunc.java:
    'or null if none exists')."""
    props = [c for c in graph.nodes.columns if c != "node_id"]
    nodes = graph.nodes.select(
        F.col("node_id").alias(id_col),
        *[F.col(c).alias(f"{prefix}{c}") for c in props])
    return df.join(nodes, id_col, "left")


def as_nodes(graph: Graph, df: DataFrame, ids_col: str,
             out_col: str = "nodes") -> DataFrame:
    """``gds.util.asNodes``: for an ``array<long>`` column of ids, attach
    an array of node-row structs in the same order (ids without a node
    are dropped, matching the reference's 'empty list if none exists'
    degenerate case). One posexplode + join + ordered re-assembly — no
    per-row Python."""
    props = [c for c in graph.nodes.columns if c != "node_id"]
    other = [c for c in df.columns]
    # Re-assembly key is a per-row surrogate, NOT the payload columns:
    # the reference asNodes is strictly per-row, so duplicate rows must
    # stay duplicates and a df whose only column is ids_col must not
    # collapse to one group.
    pos = (df.withColumn("_rowkey", F.monotonically_increasing_id())
             .select("_rowkey", *other,
                     F.posexplode_outer(ids_col).alias("_pos", "_id")))
    nodes = graph.nodes.select(
        F.col("node_id").alias("_id"),
        F.struct(F.col("node_id"), *props).alias("_node"))
    joined = pos.join(nodes, "_id", "left")
    return (
        joined.groupBy("_rowkey")
        .agg(
            *[F.first(c).alias(c) for c in other],
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(
                        F.struct("_pos", "_node"))),
                    lambda x: x["_node"].isNotNull()),
                lambda x: x["_node"]).alias(out_col),
        )
        .drop("_rowkey")
    )


def node_property(graph: Graph, node_id: int, prop: str):
    """``gds.util.nodeProperty``: one property value for one node of a
    (catalog) graph; None when the node or property is absent
    (NodePropertyFunc.java)."""
    if prop not in graph.nodes.columns:
        raise ValueError(f"unknown node property {prop!r}")
    row = graph.nodes.where(F.col("node_id") == int(node_id)) \
        .select(prop).first()
    return None if row is None else row[0]
