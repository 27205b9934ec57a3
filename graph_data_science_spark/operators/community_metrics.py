"""Community quality metrics: modularity and conductance.

Reference analogs:
- ``gds.modularity`` (algo/src/main/java/org/neo4j/gds/modularity/
  ModularityCalculator.java): per-community modularity of a given
  assignment on the UNDIRECTED weighted graph —
  ``M_c = e_c / m  -  (K_c / 2m)^2`` where e_c = intra-community edge
  weight (each undirected edge counted once), K_c = total degree-weight of
  the community's nodes, m = total edge weight. Total modularity = Σ M_c.
- ``gds.conductance`` (algo/.../conductance/Conductance.java):
  ``φ(c) = cut(c) / min(vol(c), vol(V \\ c))`` per community.

Both are pure aggregates over (edges ⋈ community-of-src ⋈ community-of-dst)
— two hash joins + partial-aggregated sums, no iteration, fully
SQL-expressible (the DuckDB oracle mirrors them verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph


def _edges_with_communities(graph: Graph, communities: DataFrame,
                            community_col: str, weighted: bool) -> DataFrame:
    w = F.col("weight") if (weighted and graph.has_weight()) else F.lit(1.0)
    e = graph.edges.select("src", "dst", w.alias("w"))
    cs = communities.select(F.col("node_id").alias("src"), F.col(community_col).alias("c_src"))
    cd = communities.select(F.col("node_id").alias("dst"), F.col(community_col).alias("c_dst"))
    return e.join(cs, "src").join(cd, "dst")


def modularity(graph: Graph, communities: DataFrame,
               community_col: str = "community", weighted: bool = False) -> DataFrame:
    """Per-community modularity → (community, modularity); the directed edge
    table is treated as the undirected graph it projects (each stored edge =
    one undirected edge, degree counts both endpoints)."""
    ec = _edges_with_communities(graph, communities, community_col, weighted)
    m = ec.agg(F.sum("w")).first()[0] or 0.0
    if m == 0:
        return communities.select(F.col(community_col).alias("community")).distinct() \
            .select("community", F.lit(0.0).alias("modularity"))

    intra = (
        ec.where(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.sum("w").alias("e_c"))
    )
    # degree-weight per node = Σ incident weight (both endpoints)
    deg = (
        ec.select(F.col("c_src").alias("community"), F.col("w"))
        .unionByName(ec.select(F.col("c_dst").alias("community"), F.col("w")))
        .groupBy("community").agg(F.sum("w").alias("k_c"))
    )
    return (
        deg.join(intra, "community", "left")
        .select(
            "community",
            (F.coalesce(F.col("e_c"), F.lit(0.0)) / F.lit(float(m))
             - (F.col("k_c") / (2.0 * float(m))) * (F.col("k_c") / (2.0 * float(m)))
             ).alias("modularity"),
        )
    )


def total_modularity(graph: Graph, communities: DataFrame,
                     community_col: str = "community", weighted: bool = False) -> float:
    df = modularity(graph, communities, community_col, weighted)
    return float(df.agg(F.sum("modularity")).first()[0] or 0.0)


def conductance(graph: Graph, communities: DataFrame,
                community_col: str = "community", weighted: bool = False) -> DataFrame:
    """Per-community conductance → (community, conductance).

    cut(c) = weight of edges with exactly one endpoint in c; vol(c) = total
    degree-weight of c's nodes; φ = cut / min(vol(c), vol_total - vol(c)).
    Communities with zero min-volume get null (reference skips them).
    """
    ec = _edges_with_communities(graph, communities, community_col, weighted)
    vol = (
        ec.select(F.col("c_src").alias("community"), F.col("w"))
        .unionByName(ec.select(F.col("c_dst").alias("community"), F.col("w")))
        .groupBy("community").agg(F.sum("w").alias("vol"))
    )
    total_vol = ec.agg(F.sum("w") * 2).first()[0] or 0.0
    cut = (
        ec.where(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("community"), F.col("w"))
        .unionByName(
            ec.where(F.col("c_src") != F.col("c_dst"))
            .select(F.col("c_dst").alias("community"), F.col("w")))
        .groupBy("community").agg(F.sum("w").alias("cut"))
    )
    denom = F.least(F.col("vol"), F.lit(float(total_vol)) - F.col("vol"))
    return (
        vol.join(cut, "community", "left")
        .select(
            "community",
            F.when(denom > 0,
                   F.coalesce(F.col("cut"), F.lit(0.0)) / denom).alias("conductance"),
        )
    )
