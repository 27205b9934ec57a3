"""graph_data_science_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the capabilities of the Neo4j Graph Data
Science library (reference: /root/reference, GPLv3 Java sources) expressed
Spark-first: the graph is a pair of DataFrames (nodes, edges), algorithms are
declarative DataFrame plans driven by a superstep loop (``plans.pregel``),
and the slow path uses Arrow-vectorized pandas UDFs — never per-row Python.

Key entry points
----------------
- :class:`graph_data_science_spark.graph.Graph` — the (nodes, edges) pair.
- :class:`graph_data_science_spark.catalog.GraphCatalog` — named-graph
  registry (analog of ``gds.graph.project`` / ``GraphStoreCatalog``,
  reference: core/src/main/java/org/neo4j/gds/core/loading/GraphStoreCatalog.java:46).
- :mod:`graph_data_science_spark.operators` — PageRank, WCC, label
  propagation, triangle count, degree, similarity, …
- :mod:`graph_data_science_spark.sources` — source-code repo table
  synthesis + import/include edge extraction, random graph generator,
  CSV import/export.
"""

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.catalog import GraphCatalog

__version__ = "0.1.0"

__all__ = ["Graph", "GraphCatalog", "__version__"]
