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
    def write_parquet(self, name: str, path: str) -> None:
        """gds.graph.export analog — persist both tables as parquet
        (our stand-in for Iceberg table writes; io/csv/.../GraphStoreToCsvExporter.java:39)."""
        g = self.get(name)
        g.nodes.write.mode("overwrite").parquet(f"{path}/nodes")
        g.edges.write.mode("overwrite").parquet(f"{path}/edges")

    def read_parquet(self, name: str, path: str, directed: bool = True) -> Graph:
        nodes = self.spark.read.parquet(f"{path}/nodes")
        edges = self.spark.read.parquet(f"{path}/edges")
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
