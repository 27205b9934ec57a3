"""Triangle count + local clustering coefficient — ordered two-hop join.

Reference semantics (algo/src/main/java/org/neo4j/gds/triangle/):
- requires an UNDIRECTED projection (TriangleCountBaseConfig.java:55-67);
  parallel edges and self-loops are deduped/ignored
  (GraphIntersect.java:78-80,165).
- each triangle is found once in id order A < B < C via sorted-adjacency
  merge-intersection (intersect/GraphIntersect.java:52-170); every corner's
  count += 1 (IntersectingTriangleCount.java:156-163); global = #triangles.
- optional ``maxDegree``: nodes above it are excluded from triangle formation
  and report count **-1** (IntersectingTriangleCount.java:56,145-150).
- LCC (LocalClusteringCoefficient.java:121-131):
  ``C(v) = 2*T(v) / (deg(v) * (deg(v)-1))``; 0 when deg < 2; NaN for
  nodes excluded by maxDegree.

Spark plan (SURVEY §2.4 "ordered two-hop self-join", degree-oriented —
the compact-forward algorithm):
1. canonicalize undirected edges to ``src < dst``, distinct (dedup =
   the reference's parallel-edge guard).
2. **degree orientation**: re-orient every edge to point from the
   lower-(degree, id) endpoint to the higher one. Wedge enumeration then
   happens only at each triangle's MIN-degree corner, so a hub of degree D
   contributes O(choose(out_deg, 2)) with out_deg ≤ ~sqrt(|E|) instead of
   O(D^2) — the standard shuffle-volume reducer for skewed graphs (the
   reference's analog is the A<B<C cursor order + skipUntil,
   GraphIntersect.java:63-66,141-147).
3. wedges = oriented ⋈ oriented on the common low corner, spoke pair (b, c)
   ordered by the same (degree, id) key; probe the canonical edge set for
   (min(b,c), max(b,c)) with a left_semi join (broadcast when small; AQE
   picks SMJ at scale).
4. per-node counts: explode the 3 corners, partial-aggregated count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.graph import Graph


@dataclass
class TriangleCountResult:
    per_node: DataFrame  # (node_id, triangles)
    global_count: int
    triangles: DataFrame  # (a, b, c) with a < b < c


def _canonical_edges(graph: Graph) -> DataFrame:
    return graph.canonical_undirected_edges()


def triangles(graph: Graph, max_degree: int | None = None) -> DataFrame:
    """Stream of distinct triangles ``(a, b, c)``, a < b < c — the
    ``gds.triangles`` analog (algo/.../triangle/TriangleStream.java:52).

    The returned DataFrame is materialized (single localCheckpoint) and the
    intermediate caches are unpersisted before returning — no block leaks
    across repeated calls, and consumers reuse the materialized triangle
    stream instead of recomputing the wedge join."""
    tri, handles = _build_triangles(graph, max_degree)
    out = tri.localCheckpoint(eager=True)
    for h in handles:
        h.unpersist()
    return out


def _build_triangles(graph: Graph, max_degree: int | None = None):
    """(lazy triangle stream, [persisted handles to unpersist after
    materialization])."""
    edges = _canonical_edges(graph)

    # undirected degree on the deduped simple graph
    deg = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    if max_degree is not None:
        keep = deg.where(F.col("deg") <= int(max_degree)).select("n")
        edges = (
            edges.join(keep.withColumnRenamed("n", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("n", "dst"), "dst", "left_semi")
        )
        # degrees for orientation are recomputed on the surviving subgraph
        deg = (
            edges.select(F.col("src").alias("n"))
            .unionByName(edges.select(F.col("dst").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
        )

    # lazy persist (materialized by the wedge join's first pass, reused by
    # the closing semi-join); the caller unpersists after checkpointing the
    # triangle stream — fixes round 1's never-unpersisted leak without the
    # cost of eagerly materializing two intermediates
    edges = edges.persist()

    # orientation key: (degree, id) — total order, hub-avoiding
    dsrc = deg.select(F.col("n").alias("src"), F.col("deg").alias("_ds"))
    ddst = deg.select(F.col("n").alias("dst"), F.col("deg").alias("_dd"))
    keyed = edges.join(dsrc, "src").join(ddst, "dst")
    lower_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(lower_first, F.col("_dd")).otherwise(F.col("_ds")).alias("hi_deg"),
    ).persist()

    # wedges at the low corner; spokes ordered by the orientation key so each
    # triangle is generated exactly once
    e1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("hi_deg").alias("bd")
    )
    e2 = oriented.select(
        F.col("lo").alias("a2"), F.col("hi").alias("c"), F.col("hi_deg").alias("cd")
    )
    wedge_order = (F.col("bd") < F.col("cd")) | (
        (F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c"))
    )
    wedges = e1.join(e2, (F.col("a") == F.col("a2")) & wedge_order).select("a", "b", "c")

    closing = edges.select(
        F.col("src").alias("_x"), F.col("dst").alias("_y")
    )
    tri = wedges.join(
        closing,
        (F.least("b", "c") == F.col("_x")) & (F.greatest("b", "c") == F.col("_y")),
        "left_semi",
    )
    # emit in id order a < b < c like the reference's ordered stream
    out = tri.select(
        F.least(F.least("a", "b"), "c").alias("a"),
        F.expr("greatest(least(a,b), least(greatest(a,b),c))").alias("b"),
        F.greatest(F.greatest("a", "b"), "c").alias("c"),
    )
    return out, [edges, oriented]


def triangle_count(graph: Graph, max_degree: int | None = None) -> TriangleCountResult:
    """``gds.triangleCount`` analog: per-node + global triangle counts.

    Excluded (degree > max_degree) nodes report -1, like the reference.
    """
    tri = triangles(graph, max_degree=max_degree)  # checkpointed, leak-free
    corners = (
        tri.select(F.col("a").alias("node_id"))
        .unionByName(tri.select(F.col("b").alias("node_id")))
        .unionByName(tri.select(F.col("c").alias("node_id")))
    )
    counts = corners.groupBy("node_id").agg(F.count(F.lit(1)).alias("triangles"))
    global_count = tri.count()

    base = graph.nodes.select("node_id")
    if max_degree is not None:
        edges = _canonical_edges(graph)
        deg = (
            edges.select(F.col("src").alias("node_id"))
            .unionByName(edges.select(F.col("dst").alias("node_id")))
            .groupBy("node_id").agg(F.count(F.lit(1)).alias("_deg"))
        )
        base = base.join(deg, "node_id", "left").select(
            "node_id",
            (F.coalesce("_deg", F.lit(0)) > int(max_degree)).alias("_excluded"),
        )
    else:
        base = base.withColumn("_excluded", F.lit(False))

    per_node = base.join(counts, "node_id", "left").select(
        "node_id",
        F.when(F.col("_excluded"), F.lit(-1))
        .otherwise(F.coalesce("triangles", F.lit(0)))
        .cast("long")
        .alias("triangles"),
    )
    return TriangleCountResult(per_node, int(global_count), tri)


def local_clustering_coefficient(
    graph: Graph, max_degree: int | None = None
) -> DataFrame:
    """``gds.localClusteringCoefficient`` analog → (node_id, lcc: double).

    ``2T/(d(d-1))``, 0 when d < 2, NaN when excluded by maxDegree
    (LocalClusteringCoefficient.java:121-131).
    """
    tc = triangle_count(graph, max_degree=max_degree)
    edges = _canonical_edges(graph)
    deg = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .groupBy("node_id").agg(F.count(F.lit(1)).cast("double").alias("_deg"))
    )
    joined = tc.per_node.join(deg, "node_id", "left").select(
        "node_id",
        F.col("triangles"),
        F.coalesce("_deg", F.lit(0.0)).alias("_deg"),
    )
    return joined.select(
        "node_id",
        F.when(F.col("triangles") == -1, F.lit(float("nan")))
        .when(F.col("_deg") < 2, F.lit(0.0))
        .otherwise(
            2.0 * F.col("triangles") / (F.col("_deg") * (F.col("_deg") - 1.0))
        )
        .alias("lcc"),
    )


def canonicalize_batch(edges: DataFrame) -> DataFrame:
    """Raw (src, dst) rows → distinct canonical ``src < dst`` simple edges."""
    return (edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"))
            .where(F.col("src") != F.col("dst")).distinct())


def triangle_count_delta(old_edges: DataFrame, batch_edges: DataFrame) -> int:
    """Number of triangles CREATED by ``batch_edges`` arriving on top of the
    simple graph ``old_edges`` — the incremental-maintenance twin of
    :func:`triangle_count` (reference semantics per
    IntersectingTriangleCount.java; the reference recomputes, this counts
    only the delta).

    ``old_edges`` must be canonical (``src < dst``, distinct — the
    accumulated state the streaming maintainer keeps); ``batch_edges`` is
    raw and is canonicalized + deduped against the old set here.

    Counting discipline: each new triangle is charged to its LARGEST new
    edge under the (src, dst) lexicographic order — for new edge e=(u,v),
    count common neighbors w whose two closing edges (u,w), (v,w) are
    either old or new-with-smaller-key. A triangle with 1, 2 or 3 new
    edges is therefore counted exactly once, and
    ``triangle_count(old ∪ batch) == triangle_count(old) + delta``.

    Plan: the (small) batch is broadcast into the adjacency of old ∪ new;
    the wedge set is O(Σ_{(u,v)∈batch} deg(u)), closed by ONE
    shuffle-hash join keyed (endpoint, wedge corner) — per-batch cost is
    the batch's blast radius, never the graph. No driver-side iteration;
    the single scalar crosses to the driver.
    """
    new_e = (canonicalize_batch(batch_edges)
             .join(old_edges, ["src", "dst"], "left_anti")
             .localCheckpoint(eager=True))

    key = F.struct(F.col("src").alias("s"), F.col("dst").alias("d"))
    tagged = (old_edges.select("src", "dst", F.lit(0).alias("tag"))
              .unionByName(new_e.select("src", "dst", F.lit(1).alias("tag"))))
    # adjacency in both directions: (x, w) with the closing edge's tag/key
    adj = (tagged.select(F.col("src").alias("x"), F.col("dst").alias("w"),
                         "tag", key.alias("k"))
           .unionByName(
               tagged.select(F.col("dst").alias("x"), F.col("src").alias("w"),
                             "tag", key.alias("k"))))

    e1 = new_e.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                      key.alias("k0"))
    older = lambda k, k0: (F.col(f"{k}.tag") == 0) | (
        (F.col(f"{k}.k.s") < F.col(f"{k0}.s"))
        | ((F.col(f"{k}.k.s") == F.col(f"{k0}.s"))
           & (F.col(f"{k}.k.d") < F.col(f"{k0}.d"))))
    a1 = adj.select(F.col("x").alias("u"), "w",
                    F.struct("tag", "k").alias("e_uw"))
    a2 = adj.select(F.col("x").alias("v2"), F.col("w").alias("w2"),
                    F.struct("tag", "k").alias("e_vw"))
    wedges = (a1.join(F.broadcast(e1), "u")
              .where((F.col("w") != F.col("v")) & older("e_uw", "k0")))
    closed = (wedges.join(a2.hint("shuffle_hash"),
                          (F.col("v") == F.col("v2"))
                          & (F.col("w") == F.col("w2")))
              .where(older("e_vw", "k0")))
    n = closed.count()
    return int(n)
