"""``gds.alpha.ml.splitRelationships`` — link-prediction holdout splitting.

Reference analog: ``ml/ml-algo/.../splitting/SplitRelationships.java`` +
``DirectedEdgeSplitter`` / ``UndirectedEdgeSplitter`` /
``RandomNegativeSampler``: partition a graph's relationships into a HOLDOUT
set (fraction ``holdout_fraction``, labeled positive 1.0) plus
``negative_sampling_ratio × |holdout|`` sampled NON-edges (labeled 0.0),
and the REMAINING relationships used for feature computation — the split
every link-prediction pipeline trains on.

Spark-first decisions:

- The reference draws per-edge randoms from a seeded generator whose
  assignment depends on partition traversal order. Here selection is
  ``u01 = md5(src:dst:'holdout':seed)`` — a pure function of the edge, so
  the split is identical at any parallelism, under re-runs, and under data
  relayout (the same append-stability contract as ``hash_split`` for
  documents), and it is expressible in ANSI SQL for the DuckDB oracle.
  Counts are binomial around the fraction, exactly like the reference's
  per-edge Bernoulli draw.
- Negative sampling is a generate → anti-join: a deterministic hash stream
  proposes candidate pairs over the node set (id-indexed via one
  ``row_number`` over ``node_id`` — the IdMap), the master edge set
  anti-joins out true edges and self-pairs, and the first ``n_negative``
  survivors in hash order are kept. Fully distributed: candidate volume is
  O(n_negative × overgen), never O(V²); the anti-join shuffles on the edge
  key like any other edge join. The reference's RandomNegativeSampler does
  the same rejection loop node-at-a-time (``RandomNegativeSampler.java``).
- Undirected mode canonicalizes (min,max) BEFORE the draw, so the two
  directions of one undirected relationship always land in the same split
  (UndirectedEdgeSplitter splits per relationship, not per direction).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from graph_data_science_spark.graph import Graph
from graph_data_science_spark.operators.embeddings import _u01


@dataclass
class RelationshipSplit:
    #: (src, dst, label) — holdout positives (1.0) + sampled negatives (0.0)
    selected: DataFrame
    #: (src, dst[, weight]) — the feature/training graph's edges
    remaining: DataFrame
    n_holdout: int
    n_negative: int


def split_relationships(
    g: Graph,
    holdout_fraction: float = 0.2,
    negative_sampling_ratio: float = 1.0,
    seed: int = 42,
    undirected: bool = False,
    overgen: int = 4,
) -> RelationshipSplit:
    """Split ``g.edges`` into (selected, remaining) — see module doc."""
    if not 0.0 < holdout_fraction < 1.0:
        raise ValueError("holdout_fraction must be in (0, 1)")
    edges = g.edges
    key_src, key_dst = F.col("src"), F.col("dst")
    if undirected:
        key_src, key_dst = F.least("src", "dst"), F.greatest("src", "dst")
    u = _u01(key_src, key_dst, F.lit("holdout"), F.lit(int(seed)))
    tagged = edges.withColumn("_hold", u < float(holdout_fraction))

    holdout = tagged.where(F.col("_hold")).select(
        "src", "dst", F.lit(1.0).alias("label"))
    remaining = tagged.where(~F.col("_hold")).drop("_hold")
    n_holdout = holdout.count()
    n_negative = int(round(n_holdout * float(negative_sampling_ratio)))

    if n_negative == 0:
        spark = edges.sparkSession
        negatives = spark.createDataFrame(
            [], "src long, dst long, label double")
    else:
        # IdMap: dense index over the node set (one node-sized shuffle)
        idx = g.nodes.select("node_id").withColumn(
            "_i", F.row_number().over(Window.orderBy("node_id")) - 1)
        n = idx.count()
        spark = edges.sparkSession
        cand = (
            spark.range(n_negative * max(2, int(overgen)))
            .select(
                F.col("id").alias("_k"),
                F.pmod(F.xxhash64(F.col("id"), F.lit("nsrc"),
                                  F.lit(int(seed))), F.lit(n)).alias("_si"),
                F.pmod(F.xxhash64(F.col("id"), F.lit("ndst"),
                                  F.lit(int(seed))), F.lit(n)).alias("_di"),
            )
            .where(F.col("_si") != F.col("_di"))
            .join(idx.select(F.col("_i").alias("_si"),
                             F.col("node_id").alias("src")), "_si")
            .join(idx.select(F.col("_i").alias("_di"),
                             F.col("node_id").alias("dst")), "_di")
            .dropDuplicates(["src", "dst"])
        )
        # reject true edges of the MASTER graph (both directions — a
        # negative must be a non-edge regardless of orientation,
        # RandomNegativeSampler checks the master graph's adjacency)
        master = edges.select("src", "dst")
        master_rev = master.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))
        negatives = (
            cand.join(master, ["src", "dst"], "left_anti")
            .join(master_rev, ["src", "dst"], "left_anti")
            .orderBy("_k")
            .limit(n_negative)
            .select("src", "dst", F.lit(0.0).alias("label"))
        )
        # a dense master graph can reject more candidates than `overgen`
        # budgeted — report the count actually produced (the reference's
        # sampler loops until exact; here the candidate stream is fixed so
        # the split stays a pure function of (edges, nodes, seed))
        n_negative = negatives.count()

    selected = holdout.unionByName(negatives)
    return RelationshipSplit(
        selected=selected,
        remaining=remaining,
        n_holdout=n_holdout,
        n_negative=n_negative,
    )
