"""The Graph data model: a (nodes, edges) DataFrame pair.

Reference analog: ``org.neo4j.gds.api.Graph`` / ``GraphStore``
(core/src/main/java/org/neo4j/gds/api/GraphStore.java:46,
 core/src/main/java/org/neo4j/gds/core/huge/HugeGraph.java:97).
The reference stores an in-memory CSR; here the canonical representation is
relational — an ``edges`` DataFrame hash-partitioned by ``src`` — and CSR
packing happens per-partition inside Arrow UDFs only where an algorithm
kernel wants it.

Schema conventions
------------------
- ``nodes``:  ``node_id: long`` (dense internal id, the IdMap output) plus
  any number of property columns (long/double/string/array — the reference's
  ValueType surface, graph-projection-api/.../ValueType.java:25-152).
- ``edges``:  ``src: long, dst: long`` plus optional ``weight: double`` and
  ``rel_type: string``.

Orientation (graph-projection-api/.../Orientation.java:29-41):
NATURAL keeps edges as loaded; REVERSE swaps; UNDIRECTED materializes both
directions (the reference does the same in its CSR).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, functions as F

NATURAL = "NATURAL"
REVERSE = "REVERSE"
UNDIRECTED = "UNDIRECTED"

#: Parallel-edge aggregation modes at load
#: (graph-projection-api/.../core/Aggregation.java:31-85).
AGGREGATIONS = ("NONE", "SINGLE", "SUM", "MIN", "MAX", "COUNT")


def _agg_weight(agg: str):
    return {
        "SINGLE": F.first("weight"),
        "SUM": F.sum("weight"),
        "MIN": F.min("weight"),
        "MAX": F.max("weight"),
        "COUNT": F.count(F.lit(1)).cast("double"),
    }[agg]


@dataclass
class Graph:
    """Immutable algorithm-facing graph view (nodes + edges DataFrames)."""

    nodes: DataFrame
    edges: DataFrame
    directed: bool = True
    name: str = "graph"
    #: filled lazily; ``node_count()`` / ``edge_count()`` populate these.
    _node_count: int | None = field(default=None, repr=False)
    _edge_count: int | None = field(default=None, repr=False)
    #: materialized inverse adjacency (``index_inverse()``), or None.
    _inverse_edges: DataFrame | None = field(default=None, repr=False)

    # -- basic accessors ---------------------------------------------------
    def node_count(self) -> int:
        if self._node_count is None:
            object.__setattr__(self, "_node_count", self.nodes.count())
        return self._node_count

    def edge_count(self) -> int:
        if self._edge_count is None:
            object.__setattr__(self, "_edge_count", self.edges.count())
        return self._edge_count

    def has_weight(self) -> bool:
        return "weight" in self.edges.columns

    # -- orientation / transforms -----------------------------------------
    def oriented(self, orientation: str = NATURAL) -> "Graph":
        """Return a graph with the requested edge orientation.

        UNDIRECTED mirrors every edge (both directions present), matching the
        reference's undirected CSR materialization
        (core/.../loading/AdjacencyBuffer.java + Orientation.UNDIRECTED).
        """
        if orientation == NATURAL:
            return self
        e = self.edges
        extra = [c for c in e.columns if c not in ("src", "dst")]
        if orientation == REVERSE:
            if self._inverse_edges is not None:
                # the derived graph's edge set is no longer the one the
                # index mirrors — detach it (it stays valid on `self`)
                return replace(self, edges=self._inverse_edges,
                               _inverse_edges=None)
            rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *extra)
            return replace(self, edges=rev, _inverse_edges=None)
        if orientation == UNDIRECTED:
            rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *extra)
            return replace(self, edges=e.select("src", "dst", *extra).unionByName(rev),
                           directed=False, _inverse_edges=None, _edge_count=None)
        raise ValueError(f"unknown orientation {orientation!r}")

    def index_inverse(self, partitions: int | None = None) -> "Graph":
        """``gds.graph.relationships.indexInverse`` analog
        (algo/.../indexInverse/InverseRelationships.java — builds the
        incoming-adjacency CSR so REVERSE traversals don't rescan).

        Spark-first: an "inverse index" IS a physical layout — the reversed
        edge table hash-partitioned on its traversal key (the new ``src``,
        i.e. the original ``dst``) and persisted, so every subsequent
        REVERSE-orientation join/groupBy starts from a co-located cached
        scan instead of re-shuffling the natural-orientation table. At
        cluster scale this is the difference between one shuffle at index
        time and one shuffle per consuming superstep. Eagerly materialized,
        like the reference's index build task."""
        e = self.edges
        extra = [c for c in e.columns if c not in ("src", "dst")]
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *extra)
        rev = (rev.repartition(partitions, "src") if partitions
               else rev.repartition("src")).persist()
        rev.count()
        return replace(self, _inverse_edges=rev)

    def drop_inverse_index(self) -> "Graph":
        """Release the materialized inverse index (unpersist + detach)."""
        if self._inverse_edges is not None:
            self._inverse_edges.unpersist()
        return replace(self, _inverse_edges=None)

    def to_undirected(self, aggregation: str = "SINGLE") -> "Graph":
        """``gds.beta.graph.relationships.toUndirected`` analog
        (algo/.../undirected/ToUndirected.java:48): mirror + dedup, with the
        reference's parallel-edge aggregation semantics."""
        g = self.oriented(UNDIRECTED)
        e = g.edges
        if "weight" in e.columns:
            e = e.groupBy("src", "dst").agg(_agg_weight(aggregation).alias("weight"))
        else:
            e = e.select("src", "dst").distinct()
        return replace(g, edges=e, directed=False, _inverse_edges=None,
                       _edge_count=None)

    def canonical_undirected_edges(self) -> DataFrame:
        """Distinct edges canonicalized to ``src < dst`` (self-loops dropped).

        The triangle kernel's required input — mirrors the reference's
        A<B<C ordered emission (algo/.../triangle/intersect/GraphIntersect.java:52-170).
        """
        e = self.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).where(F.col("src") != F.col("dst"))
        return e.distinct()

    # -- degrees -----------------------------------------------------------
    def degrees(self, direction: str = "out", weighted: bool = False) -> DataFrame:
        """Per-node degree DataFrame ``(node_id, degree: double)``.

        Weighted degree sums only weights > 0, matching
        algo/.../degree/DegreeCentrality.java:315-319 (negative weights
        ignored). Nodes with no edges get degree 0.
        """
        key = "src" if direction == "out" else "dst"
        e = self.edges
        if weighted:
            if "weight" not in e.columns:
                raise ValueError("weighted degree requires a 'weight' column")
            deg = (
                e.where(F.col("weight") > 0.0)
                .groupBy(F.col(key).alias("node_id"))
                .agg(F.sum("weight").cast("double").alias("degree"))
            )
        else:
            deg = e.groupBy(F.col(key).alias("node_id")).agg(
                F.count(F.lit(1)).cast("double").alias("degree")
            )
        return (
            self.nodes.select("node_id")
            .join(deg, "node_id", "left")
            .select("node_id", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    # -- filtering (gds.graph.filter analog) --------------------------------
    def subgraph(self, node_filter: str = "true", rel_filter: str = "true") -> "Graph":
        """``gds.graph.filter`` analog — predicate-expression subgraph
        (subgraph-filtering/.../GraphStoreFilter.java). Catalyst IS the
        expression engine: filters are SQL expressions over node/edge columns;
        surviving edges are semi-joined on surviving endpoints."""
        nodes = self.nodes.filter(F.expr(node_filter))
        ids = nodes.select("node_id")
        edges = (
            self.edges.filter(F.expr(rel_filter))
            .join(ids.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
        )
        return replace(self, nodes=nodes, edges=edges, _node_count=None,
                       _edge_count=None, _inverse_edges=None)

    def with_node_property(self, values: DataFrame, column: str) -> "Graph":
        """MUTATE-mode analog: attach an algorithm result ``(node_id, column)``
        as a node property (ExecutionMode.MUTATE,
        executor/.../ExecutionMode.java:27-28)."""
        nodes = self.nodes.join(values.select("node_id", column), "node_id", "left")
        return replace(self, nodes=nodes)


def edges_from_tuples(spark, tuples, weighted: bool = False) -> DataFrame:
    """Tiny fixture builder — the GDL-string analog
    (test-utils/.../gdl/GdlFactory.java:77)."""
    if weighted:
        return spark.createDataFrame(tuples, "src long, dst long, weight double")
    return spark.createDataFrame(tuples, "src long, dst long")


def graph_from_edges(spark, edges: DataFrame, nodes: DataFrame | None = None,
                     directed: bool = True, name: str = "graph") -> Graph:
    """Build a Graph from an edge DataFrame; node set inferred if absent."""
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node_id"))
            .unionByName(edges.select(F.col("dst").alias("node_id")))
            .distinct()
        )
    return Graph(nodes=nodes, edges=edges, directed=directed, name=name)
