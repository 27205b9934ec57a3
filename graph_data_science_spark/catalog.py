"""Named-graph catalog — analog of the reference's GraphStoreCatalog
(core/src/main/java/org/neo4j/gds/core/loading/GraphStoreCatalog.java:46:
``get`` L70, ``set`` L166, ``exists`` L205) and the ``gds.graph.*`` catalog
procedures (proc/catalog/).

A catalog entry is a :class:`~graph_data_science_spark.graph.Graph` — a pair
of DataFrames. ``project`` is the ``gds.graph.project`` analog: it normalizes
parallel edges per the requested aggregation, applies orientation, optionally
persists (cache or parquet path = our Iceberg-snapshot stand-in), and
registers under a name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_data_science_spark.graph import (
    AGGREGATIONS,
    NATURAL,
    Graph,
    _agg_weight,
    graph_from_edges,
)


class GraphCatalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._graphs: dict[str, Graph] = {}
        #: graph-store-level scalar properties, keyed by graph name
        self._graph_props: dict[str, dict] = {}

    # -- gds.graph.project analog -------------------------------------------
    def project(
        self,
        name: str,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        orientation: str = NATURAL,
        aggregation: str = "NONE",
        cache: bool = True,
    ) -> Graph:
        """Register a named graph from node/edge DataFrames.

        ``aggregation`` collapses parallel edges (Aggregation.java:31-85):
        NONE keeps them; SINGLE/SUM/MIN/MAX/COUNT group by (src, dst).
        """
        if aggregation not in ("NONE",) + AGGREGATIONS:
            raise ValueError(f"unknown aggregation {aggregation!r}")
        if aggregation != "NONE":
            if "weight" in edges.columns:
                edges = edges.groupBy("src", "dst").agg(_agg_weight(aggregation).alias("weight"))
            else:
                edges = edges.select("src", "dst").distinct()
        g = graph_from_edges(self.spark, edges, nodes, name=name).oriented(orientation)
        if cache:
            g.nodes.cache()
            g.edges.cache()
        self._graphs[name] = g
        return g

    def project_sql(self, name: str, node_query: str, edge_query: str, **kw) -> Graph:
        """``gds.graph.project.cypher`` analog (core/.../loading/CypherFactory.java):
        two user queries define the graph — here arbitrary Spark SQL producing
        ``nodes(node_id, ...)`` and ``edges(src, dst, ...)``."""
        nodes = self.spark.sql(node_query)
        edges = self.spark.sql(edge_query)
        return self.project(name, edges, nodes, **kw)

    # -- lifecycle ----------------------------------------------------------
    def get(self, name: str) -> Graph:
        if name not in self._graphs:
            raise KeyError(f"graph {name!r} not in catalog (have {sorted(self._graphs)})")
        return self._graphs[name]

    def exists(self, name: str) -> bool:
        return name in self._graphs

    def drop(self, name: str) -> None:
        g = self._graphs.pop(name, None)
        self._graph_props.pop(name, None)
        if g is not None:
            for df in (g.nodes, g.edges):
                try:
                    df.unpersist()
                except Exception:
                    pass

    def list(self) -> list[str]:
        return sorted(self._graphs)

    def list_detail(self, name: str, exact: bool = False) -> dict:
        """``gds.graph.list`` row analog: node/relationship counts plus the
        ``degreeDistribution`` histogram GDS computes per catalog entry
        (proc/catalog/.../GraphInfoWithHistogram.java) — min/mean/max and
        p50–p99 over out-degrees. ``exact=False`` (default) uses the
        bounded-memory percentile sketch, matching the reference's
        HdrHistogram posture; counts are exact either way."""
        from graph_data_science_spark.operators.result_stats import (
            centrality_distribution,
        )

        g = self.get(name)
        dist = centrality_distribution(
            g.degrees("out"), col="degree", exact=exact
        ).collect()[0].asDict()
        return {
            "graphName": name,
            "nodeCount": g.nodes.count(),
            "relationshipCount": g.edges.count(),
            "directed": g.directed,
            "degreeDistribution": dist,
        }

    # -- relationship lifecycle (gds.graph.relationships.*) ------------------
    def stream_relationships(
        self, name: str, rel_types: list[str] | None = None
    ) -> DataFrame:
        """``gds.graph.relationships.stream`` analog
        (proc/catalog/.../GraphStreamRelationshipsProc.java): the topology as
        ``(src, dst, rel_type)``. Untyped graphs stream the reference's
        catch-all ``__ALL__`` type. Pure projection + pushed filter — at any
        scale this is a parquet scan, never a collect."""
        g = self.get(name)
        e = g.edges
        if "rel_type" not in e.columns:
            e = e.withColumn("rel_type", F.lit("__ALL__"))
        if rel_types is not None:
            e = e.where(F.col("rel_type").isin(list(rel_types)))
        return e.select("src", "dst", "rel_type")

    def stream_relationship_properties(
        self, name: str, properties: list[str],
        rel_types: list[str] | None = None,
    ) -> DataFrame:
        """``gds.graph.relationshipProperties.stream`` analog
        (GraphStreamRelationshipPropertiesProc.java): LONG format — one row
        per (edge, property): ``(src, dst, rel_type, relationship_property,
        property_value)``. The unpivot is a ``stack``-style explode of a
        struct array, one pass, no shuffle."""
        g = self.get(name)
        e = g.edges
        missing = [p for p in properties if p not in e.columns]
        if missing:
            raise KeyError(f"relationship properties {missing} not in graph "
                           f"{name!r} (have {e.columns})")
        if "rel_type" not in e.columns:
            e = e.withColumn("rel_type", F.lit("__ALL__"))
        if rel_types is not None:
            e = e.where(F.col("rel_type").isin(list(rel_types)))
        pairs = F.array(*[
            F.struct(F.lit(p).alias("relationship_property"),
                     F.col(p).cast("double").alias("property_value"))
            for p in properties
        ])
        return (
            e.select("src", "dst", "rel_type", F.explode(pairs).alias("_kv"))
            .select("src", "dst", "rel_type",
                    "_kv.relationship_property", "_kv.property_value")
        )

    def write_relationships(
        self, name: str, path: str, rel_type: str | None = None,
        property: str | None = None,
    ) -> None:
        """``gds.graph.relationship.write`` analog
        (GraphWriteRelationshipProc.java): persist ONE relationship type's
        topology (+ optionally one property) to the sink — here a parquet
        table, the engine's write-back surface."""
        g = self.get(name)
        e = g.edges
        if rel_type is not None and "rel_type" in e.columns:
            e = e.where(F.col("rel_type") == rel_type)
        cols = ["src", "dst"] + ([property] if property else [])
        e.select(*cols).write.mode("overwrite").parquet(path)

    def drop_relationships(self, name: str, rel_type: str) -> Graph:
        """``gds.graph.relationships.drop`` analog
        (GraphDropRelationshipProc.java): remove one relationship type (and
        its properties) from the catalog entry. Like the reference, refuses
        to drop the LAST type — a graph with no relationships is invalid."""
        from dataclasses import replace

        g = self.get(name)
        if "rel_type" not in g.edges.columns:
            raise ValueError(
                f"graph {name!r} has no rel_type column; nothing to drop")
        remaining = [
            r["rel_type"]
            for r in g.edges.select("rel_type").distinct().collect()
        ]
        if rel_type not in remaining:
            raise KeyError(f"relationship type {rel_type!r} not in graph "
                           f"{name!r} (have {sorted(remaining)})")
        if len(remaining) == 1:
            raise ValueError(
                f"cannot drop the last relationship type {rel_type!r} "
                f"of graph {name!r} (reference parity: "
                "DeleteRelationshipsConfig requires a remaining type)")
        g = replace(g, edges=g.edges.where(F.col("rel_type") != rel_type),
                    _edge_count=None)
        self._graphs[name] = g
        return g

    # -- node label lifecycle (gds.graph.nodeLabel.*) -------------------------
    def mutate_node_label(self, name: str, label: str,
                          node_filter: str) -> Graph:
        """``gds.graph.nodeLabel.mutate`` analog
        (GraphMutateNodeLabelProc.java): add ``label`` to every node matching
        the SQL ``node_filter`` predicate. Labels live in a ``labels``
        array<string> column (absent = no labels yet); idempotent via
        array_union. One projection, no shuffle."""
        from dataclasses import replace

        g = self.get(name)
        nodes = g.nodes
        if "labels" not in nodes.columns:
            nodes = nodes.withColumn(
                "labels", F.array().cast("array<string>"))
        matched = F.expr(node_filter)
        nodes = nodes.withColumn(
            "labels",
            F.when(matched, F.array_union(
                F.coalesce(F.col("labels"),
                           F.array().cast("array<string>")),
                F.array(F.lit(label)))).otherwise(F.col("labels")),
        )
        g = replace(g, nodes=nodes)
        self._graphs[name] = g
        return g

    def write_node_label(self, name: str, path: str, label: str,
                         node_filter: str) -> None:
        """``gds.graph.nodeLabel.write`` analog (GraphWriteNodeLabelProc):
        persist the matched node ids + label to the sink table."""
        g = self.get(name)
        (g.nodes.where(F.expr(node_filter))
         .select("node_id", F.lit(label).alias("label"))
         .write.mode("overwrite").parquet(path))

    # -- graph-level properties (gds.graph.graphProperty.*) -------------------
    def set_graph_property(self, name: str, key: str, value) -> None:
        """Graph-store-level scalar property (the reference's
        GraphStore.addGraphProperty surface, written by e.g. sampling procs)."""
        self.get(name)  # existence check
        self._graph_props.setdefault(name, {})[key] = value

    def stream_graph_properties(self, name: str,
                                keys: list[str] | None = None) -> list[dict]:
        """``gds.graph.graphProperty.stream`` analog
        (GraphStreamGraphPropertiesProc.java). Graph properties are O(1)
        scalars; a driver-side list is the honest shape."""
        self.get(name)
        props = self._graph_props.get(name, {})
        ks = sorted(props) if keys is None else list(keys)
        missing = [k for k in ks if k not in props]
        if missing:
            raise KeyError(f"graph properties {missing} not on {name!r}")
        return [{"propertyName": k, "propertyValue": props[k]} for k in ks]

    def drop_graph_properties(self, name: str, keys: list[str]) -> None:
        """``gds.graph.graphProperties.drop`` analog
        (GraphDropGraphPropertiesProc.java)."""
        self.get(name)
        props = self._graph_props.get(name, {})
        missing = [k for k in keys if k not in props]
        if missing:
            raise KeyError(f"graph properties {missing} not on {name!r}")
        for k in keys:
            del props[k]

    # -- sysinfo (gds.graph.memoryUsage / ListProgress) -----------------------
    def memory_usage(self, name: str,
                     executor_memory_bytes: int = 4 << 30) -> dict:
        """``gds.internal.graph.memoryUsage`` analog
        (GraphMemoryUsageProc.java): bytes the projected graph occupies,
        derived from the SAME width model the ``.estimate`` surface uses
        (operators/estimate.py) — schema-width × row counts, split by table,
        plus the executor-admission verdict at current shuffle settings."""
        from graph_data_science_spark.operators.estimate import (
            fits_executors,
            table_bytes,
        )

        g = self.get(name)
        n_bytes = table_bytes(g.node_count(), g.nodes.schema)
        e_bytes = table_bytes(g.edge_count(), g.edges.schema)
        parts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        return {
            "graphName": name,
            "nodeCount": g.node_count(),
            "relationshipCount": g.edge_count(),
            "nodeBytes": n_bytes,
            "relationshipBytes": e_bytes,
            "totalBytes": n_bytes + e_bytes,
            "fitsExecutors": fits_executors(
                n_bytes + e_bytes, parts, executor_memory_bytes),
        }

    def list_progress(self, checkpoint_root: str) -> list[dict]:
        """``gds.listProgress`` analog (ListProgressProc.java): one row per
        Pregel run under ``checkpoint_root`` — the algorithm manifest plus
        the latest superstep from metrics.jsonl (the driver appends one line
        per superstep, so progress is readable WHILE a run is executing,
        which is the proc's point)."""
        import json
        import os

        rows = []
        if not os.path.isdir(checkpoint_root):
            return rows
        for entry in sorted(os.listdir(checkpoint_root)):
            run_dir = os.path.join(checkpoint_root, entry)
            manifest_path = os.path.join(run_dir, "manifest.json")
            if not os.path.isfile(manifest_path):
                continue
            with open(manifest_path) as fh:
                manifest = json.load(fh)
            last = None
            metrics_path = os.path.join(run_dir, "metrics.jsonl")
            if os.path.isfile(metrics_path):
                with open(metrics_path) as fh:
                    for line in fh:
                        if line.strip():
                            last = json.loads(line)
            rows.append({
                "runDir": entry,
                "manifest": manifest,
                "lastSuperstep": last,
            })
        return rows

    # -- mutate / property lifecycle (gds.graph.nodeProperties.*) ------------
    def mutate(self, name: str, values: DataFrame, column: str) -> Graph:
        g = self.get(name).with_node_property(values, column)
        self._graphs[name] = g
        return g

    def stream_node_properties(self, name: str, properties: list[str]) -> DataFrame:
        """gds.graph.nodeProperties.stream analog."""
        return self.get(name).nodes.select("node_id", *properties)

    def drop_node_properties(self, name: str, properties: list[str]) -> Graph:
        g = self.get(name)
        keep = [c for c in g.nodes.columns if c not in properties]
        from dataclasses import replace

        g = replace(g, nodes=g.nodes.select(*keep))
        self._graphs[name] = g
        return g

    # -- WRITE-mode analog: persist results --------------------------------
    def export(self, name: str, target: str, table_format=None) -> None:
        """gds.graph.export analog through the table-format seam
        (sources/table_format.py; io/csv/.../GraphStoreToCsvExporter.java:39):
        nodes and edges each become one table at ``<target>/nodes`` and
        ``<target>/edges`` (a path prefix for parquet, a table-identifier
        prefix for Iceberg). Default format is parquet — the sandbox has
        no Iceberg runtime; pass ``IcebergFormat()`` on a cluster that
        does and the same call becomes two Iceberg table commits."""
        if table_format is None:
            from graph_data_science_spark.sources.table_format import (
                DEFAULT_FORMAT)
            table_format = DEFAULT_FORMAT
        g = self.get(name)
        table_format.write(g.nodes, table_format.child(target, "nodes"))
        table_format.write(g.edges, table_format.child(target, "edges"))

    def write_parquet(self, name: str, path: str) -> None:
        """Back-compat alias for :meth:`export` with the parquet format."""
        self.export(name, path)

    def read_parquet(self, name: str, path: str, directed: bool = True,
                     table_format=None) -> Graph:
        if table_format is None:
            from graph_data_science_spark.sources.table_format import (
                DEFAULT_FORMAT)
            table_format = DEFAULT_FORMAT
        nodes = table_format.read(self.spark, table_format.child(path, "nodes"))
        edges = table_format.read(self.spark, table_format.child(path, "edges"))
        g = Graph(nodes=nodes, edges=edges, directed=directed, name=name)
        self._graphs[name] = g
        return g

    def write_csv(self, name: str, path: str) -> None:
        """``gds.graph.export.csv`` analog (io/csv/.../GraphStoreToCsvExporter.java:39):
        typed CSV + sidecar schema files, so a re-import restores exact types
        (the reference's *-header.csv scheme)."""
        import json
        import os

        g = self.get(name)
        for which, df in (("nodes", g.nodes), ("edges", g.edges)):
            df.write.mode("overwrite").option("header", True).csv(f"{path}/{which}")
            os.makedirs(path, exist_ok=True)
            with open(f"{path}/{which}.schema.json", "w") as fh:
                fh.write(json.dumps(json.loads(df.schema.json())))

    def read_csv(self, name: str, path: str, directed: bool = True) -> Graph:
        """``CsvToGraphStoreImporter`` analog — reads the sidecar schema, so
        the round trip is type-exact."""
        import json

        from pyspark.sql.types import StructType

        dfs = {}
        for which in ("nodes", "edges"):
            with open(f"{path}/{which}.schema.json") as fh:
                schema = StructType.fromJson(json.loads(fh.read()))
            dfs[which] = self.spark.read.option("header", True).schema(schema).csv(
                f"{path}/{which}")
        g = Graph(nodes=dfs["nodes"], edges=dfs["edges"], directed=directed, name=name)
        self._graphs[name] = g
        return g
