"""Derived link graph over the driver's TPC-H-ish parquet tables.

The engine's production input is a source-code repo table (sources/repo_source
+ edge_extraction); the driver's correctness gate runs on its own star-schema
parquet (TESTDATA.md). This module derives a deterministic link graph from
those tables so every graph operator has a DuckDB-checkable oracle: the edge
derivation below is expressed twice — once as DataFrame ops (here) and once
as the ANSI-SQL ``EDGES_SQL`` WITH-clause body (used verbatim inside every
oracle in ``__spark_entry__.py``) — and both must stay in lockstep.

Node id encoding (disjoint ranges, deterministic):
- customer  c_custkey                → id = c_custkey
- supplier  s_suppkey                → id = 1_000_000 + s_suppkey
- nation    n_nationkey              → id = 2_000_000 + n_nationkey

Edges (directed, weighted):
- customer → supplier: one edge per distinct (o_custkey, l_suppkey) pair via
  orders ⋈ lineitem, weight = number of lineitems between the pair
  (the reference's Aggregation.COUNT at projection,
  core/.../loading/AdjacencyPreAggregation.java:26)
- customer → nation: weight 1.0
- supplier → nation: weight 1.0

Nations act as high-in-degree hubs (every customer/supplier points at one of
25 nations) — the degree-skew shape the north rule's salting targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_data_science_spark.graph import Graph

SUPP_BASE = 1_000_000
NATION_BASE = 2_000_000

# Kept textually identical in semantics to the DataFrame derivation below.
# Used as the WITH-clause body of every graph-operator oracle (DuckDB-only:
# MATERIALIZED stops CTE inlining — the unrolled iterative oracles reference
# each step's CTE twice, which would otherwise expand exponentially).
EDGES_SQL = """
edges AS MATERIALIZED (
    SELECT o_custkey AS src,
           {supp_base} + l_suppkey AS dst,
           CAST(count(*) AS DOUBLE) AS weight
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey, l_suppkey
    UNION ALL
    SELECT c_custkey AS src, {nation_base} + c_nationkey AS dst, 1.0 AS weight
    FROM customer
    UNION ALL
    SELECT {supp_base} + s_suppkey AS src,
           {nation_base} + s_nationkey AS dst, 1.0 AS weight
    FROM supplier
),
nodes AS MATERIALIZED (
    SELECT c_custkey AS node_id FROM customer
    UNION ALL
    SELECT {supp_base} + s_suppkey FROM supplier
    UNION ALL
    SELECT {nation_base} + n_nationkey FROM nation
)
""".format(supp_base=SUPP_BASE, nation_base=NATION_BASE)


def load_tables(spark: SparkSession, sf_dir: str, names=("customer", "supplier", "nation", "orders", "lineitem")) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def build_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """The canonical derived graph: nodes + weighted directed edges."""
    t = load_tables(spark, sf_dir)
    cust_supp = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPP_BASE) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    cust_nation = t["customer"].select(
        F.col("c_custkey").alias("src"),
        (F.lit(NATION_BASE) + F.col("c_nationkey")).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    supp_nation = t["supplier"].select(
        (F.lit(SUPP_BASE) + F.col("s_suppkey")).alias("src"),
        (F.lit(NATION_BASE) + F.col("s_nationkey")).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    edges = cust_supp.unionByName(cust_nation).unionByName(supp_nation)
    nodes = (
        t["customer"].select(F.col("c_custkey").alias("node_id"))
        .unionByName(t["supplier"].select((F.lit(SUPP_BASE) + F.col("s_suppkey")).alias("node_id")))
        .unionByName(t["nation"].select((F.lit(NATION_BASE) + F.col("n_nationkey")).alias("node_id")))
    )
    return Graph(nodes=nodes, edges=edges, directed=True, name="tpch-link")
