"""Similarity: GDS nodeSimilarity analog + embedding ANN for training data.

Node similarity (reference: algo/src/main/java/org/neo4j/gds/similarity/
nodesim/NodeSimilarity.java) compares nodes by their OUT-neighbor sets with
Jaccard / Overlap / Cosine, keeping top-k per node above a cutoff; the
reference streams pairs both directions for undirected-style output —
here we emit each scored pair once per source node (node1, node2, similarity).

Embedding similarity over the ``embeddings`` table (vec_id, embedding
array<float/double>, label):
- ``cosine_topk``: exact brute-force top-k. The scale path broadcasts the
  (small) query-side matrix and runs a NumPy blocked matmul inside
  ``mapInPandas`` — Arrow batches in, one BLAS GEMM per batch, no per-row
  Python. For corpus×corpus self-join at 100 TB you'd tile both sides;
  the kernel is written per-batch so tiling = repartitioning.
- ``cosine_topk_ivf``: IVF-style approximate variant — deterministic
  centroids (the first ``n_clusters`` vectors by id), assign every vector to
  its nearest centroid, search only within the query's ``n_probe`` closest
  clusters. Same GEMM kernel per (cluster, batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# GDS nodeSimilarity analog
# ---------------------------------------------------------------------------

def node_similarity(
    graph,
    top_k: int = 10,
    similarity_cutoff: float = 1e-42,
    degree_cutoff: int = 1,
    metric: str = "JACCARD",
    max_neighbor_frequency: int | None = None,
    source_node_filter=None,
    target_node_filter=None,
) -> DataFrame:
    """``gds.nodeSimilarity`` analog → (node1, node2, similarity).

    metric ∈ {JACCARD, OVERLAP, COSINE(unweighted)}; similarity rounded 6dp.
    Only node pairs sharing ≥1 out-neighbor are scored (the reference's
    inverted-index pruning); top_k per node1 by (similarity DESC, node2 ASC).

    Skew control: the self-join on ``dst`` generates O(d²) candidate pairs
    for a shared neighbor of in-degree d — a 10^6-in-degree hub alone emits
    10^12 pairs. ``max_neighbor_frequency`` (the ``max_shingle_freq`` pattern
    from dedup.py) EXCLUDES shared neighbors hotter than the cap from pair
    generation; intersection counts for pairs that also share such hubs are
    undercounted, which only LOWERS their similarity — a documented
    approximation matching the reference's degree-bound pruning intent
    (nodesim/NodeSimilarity.java upper-bound cutoffs). None = exact.

    ``source_node_filter`` / ``target_node_filter``: the filtered-variant
    surface (``gds.nodeSimilarity.filtered``) — SQL predicate strings over
    ``node_id`` applied to node1/node2 respectively, e.g. ``"node_id < 100"``.
    """
    nbrs = graph.edges.select("src", "dst").distinct()
    sizes = nbrs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ok = sizes.where(F.col("deg") >= int(degree_cutoff))
    nbrs = nbrs.join(ok.select("src"), "src", "left_semi")

    pair_nbrs = nbrs
    if max_neighbor_frequency is not None:
        freq = nbrs.groupBy("dst").agg(F.count(F.lit(1)).alias("_f"))
        cool = freq.where(F.col("_f") <= int(max_neighbor_frequency)).select("dst")
        pair_nbrs = nbrs.join(cool, "dst", "left_semi")

    inter = (
        pair_nbrs.alias("x")
        .join(pair_nbrs.alias("y"), "dst")
        .where(F.col("x.src") != F.col("y.src"))
        .groupBy(F.col("x.src").alias("node1"), F.col("y.src").alias("node2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    for flt, col in ((source_node_filter, "node1"), (target_node_filter, "node2")):
        if flt is not None:
            inter = (inter.withColumn("node_id", F.col(col))
                     .where(F.expr(flt)).drop("node_id"))
    withs = (
        inter.join(ok.select(F.col("src").alias("node1"), F.col("deg").alias("d1")), "node1")
        .join(ok.select(F.col("src").alias("node2"), F.col("deg").alias("d2")), "node2")
    )
    m = metric.upper()
    if m == "JACCARD":
        sim = F.col("inter") / (F.col("d1") + F.col("d2") - F.col("inter"))
    elif m == "OVERLAP":
        sim = F.col("inter") / F.least("d1", "d2")
    elif m == "COSINE":
        sim = F.col("inter") / F.sqrt(F.col("d1") * F.col("d2"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = withs.select("node1", "node2", F.round(sim, 6).alias("similarity")).where(
        F.col("similarity") >= similarity_cutoff
    )
    w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(top_k))
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Embedding ANN
# ---------------------------------------------------------------------------

def _collect_matrix(vecs: DataFrame, id_col: str, vec_col: str):
    pdf = vecs.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy("int64")
    mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat, norms


def _pack_side(vecs: DataFrame, id_col: str, vec_col: str, n_blocks: int,
               block_col: str) -> DataFrame:
    """Group vectors into ``n_blocks`` deterministic blocks (pmod on id) and
    pack each block into ONE row carrying (ids int64, row-normalized matrix
    float64, both pickled). Block payloads stay on executors — this is the
    distributed replacement for collecting an index matrix to the driver."""
    import pickle

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy("int64")
        mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        return pd.DataFrame({
            block_col: [int(pdf[block_col].iloc[0])],
            "_ids": [pickle.dumps(ids)],
            "_mat": [pickle.dumps(mat)],
        })

    blocked = vecs.select(
        F.pmod(F.col(id_col), F.lit(int(n_blocks))).cast("long").alias(block_col),
        id_col, vec_col,
    )
    return blocked.groupBy(block_col).applyInPandas(
        pack, schema=f"{block_col} long, _ids binary, _mat binary")


def _cosine_topk_tiled(vecs, k, id_col, vec_col, queries,
                       index_shards, query_blocks) -> DataFrame:
    import pickle

    spark = vecs.sparkSession
    par = spark.sparkContext.defaultParallelism
    n_shards = int(index_shards or par)
    n_qblocks = int(query_blocks or par)
    kk = int(k)

    index_packed = _pack_side(vecs, id_col, vec_col, n_shards, "_shard").select(
        "_shard", F.col("_ids").alias("_iids"), F.col("_mat").alias("_imat"))
    q = queries if queries is not None else vecs
    query_packed = _pack_side(q, id_col, vec_col, n_qblocks, "_qblock").select(
        "_qblock", F.col("_ids").alias("_qids"), F.col("_mat").alias("_qmat"))

    # every (query block × index shard) tile: Q×S small rows; payloads move
    # executor→executor once, the driver never sees a matrix
    tiles = query_packed.crossJoin(index_packed).repartition(
        max(n_shards, par), "_qblock", "_shard")

    def gemm_tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for r in range(len(pdf)):
                row_r = pdf.iloc[r]
                qids = pickle.loads(row_r["_qids"])
                qmat = pickle.loads(row_r["_qmat"])
                iids = pickle.loads(row_r["_iids"])
                imat = pickle.loads(row_r["_imat"])
                sims = np.round(qmat @ imat.T, 6)  # (q_rows, i_rows); 1 GEMM
                out_q, out_i, out_c = [], [], []
                for qi in range(sims.shape[0]):
                    srow = sims[qi]
                    self_mask = iids == qids[qi]
                    srow = np.where(self_mask, -np.inf, srow)
                    take = min(kk, srow.size - int(self_mask.sum()))
                    if take <= 0:
                        continue
                    idx = np.lexsort((iids, -srow))[:take]  # shard-local top-k
                    out_q.append(np.repeat(qids[qi], take))
                    out_i.append(iids[idx])
                    out_c.append(srow[idx])
                if out_q:
                    yield pd.DataFrame({
                        "vec_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_i),
                        "cosine": np.concatenate(out_c),
                    })

    partial = tiles.mapInPandas(
        gemm_tiles, schema="vec_id long, neighbor_id long, cosine double")
    # global top-k over ≤ k × n_shards partials per query — rank on the same
    # rounded cosine / smaller-neighbor tie order as the shard-local pass
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= kk)
        .drop("_rn")
    )


def cosine_topk(
    vecs: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    strategy: str = "tiled",
    index_shards: int | None = None,
    query_blocks: int | None = None,
) -> DataFrame:
    """Exact cosine top-k self-join → (vec_id, neighbor_id, cosine), self
    excluded, ranked (cosine DESC, neighbor_id ASC), rounded 6dp.

    ``strategy="tiled"`` (default, the 100 TB path): both sides are packed
    into executor-resident matrix blocks — index into ``index_shards``
    shards, queries into ``query_blocks`` blocks (deterministic pmod on id)
    — then every (query block × index shard) tile runs one BLAS GEMM inside
    ``mapInPandas`` and emits a per-shard partial top-k; a final window takes
    the global top-k per query. Nothing is collected to the driver, and tile
    size is bounded by (rows/blocks × dim × 8 B) regardless of corpus size.
    Block counts default to the session parallelism; at scale size them so a
    tile fits executor memory (e.g. 64 MB blocks).

    ``strategy="broadcast"`` (small-index fast path): the round-1 kernel —
    index collected to a driver NumPy matrix and broadcast; query side
    streams through as Arrow batches. Valid only while the index fits the
    driver; kept for small dimension tables.

    Both strategies rank on the 6dp-ROUNDED cosine (ties → smaller neighbor
    id) so any engine recomputing with different summation order ranks
    identically — the cross-engine contract.
    """
    if strategy == "tiled":
        return _cosine_topk_tiled(vecs, k, id_col, vec_col, queries,
                                  index_shards, query_blocks)
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy {strategy!r}")
    spark = vecs.sparkSession
    ids, mat, norms = _collect_matrix(vecs, id_col, vec_col)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat / norms[:, None])
    kk = int(k)

    q = queries if queries is not None else vecs

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index_ids = b_ids.value
        index = b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf[id_col].to_numpy("int64")
            qm = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            sims = (qm / qn[:, None]) @ index.T  # (batch, n_index)
            for r in range(sims.shape[0]):
                row = sims[r]
                self_mask = index_ids == qids[r]
                row = np.where(self_mask, -np.inf, row)
                take = min(kk, row.size - int(self_mask.sum()))
                if take <= 0:
                    continue
                # rank on the ROUNDED similarity (ties → smaller id) so any
                # engine recomputing with different summation order ranks
                # identically — the 6dp round is the cross-engine contract
                rounded = np.round(row, 6)
                order = np.lexsort((index_ids, -rounded))[:take]
                yield pd.DataFrame({
                    "vec_id": np.repeat(qids[r], take),
                    "neighbor_id": index_ids[order],
                    "cosine": rounded[order],
                })

    return q.select(id_col, vec_col).mapInPandas(
        gemm, schema="vec_id long, neighbor_id long, cosine double"
    )


def knn(
    graph,
    node_properties: list[str] | str,
    top_k: int = 10,
    similarity_cutoff: float = 0.0,
    source_node_filter: str | None = None,
    target_node_filter: str | None = None,
) -> DataFrame:
    """``gds.knn`` analog: k nearest neighbors by node-property similarity
    → (node1, node2, similarity).

    Scalar properties are assembled into a vector; an array property is used
    as-is; similarity = cosine. Runs on the exact TILED GEMM kernel
    (:func:`cosine_topk` default strategy — executor-resident matrix blocks,
    nothing on the driver) — the reference's NN-Descent approximation is a
    convergence optimization, not a semantic; its output contract (top-k
    above cutoff) is what we reproduce, exactly.
    """
    if isinstance(node_properties, str):
        node_properties = [node_properties]
    nodes = graph.nodes
    from pyspark.sql.types import ArrayType

    if len(node_properties) == 1 and isinstance(
        nodes.schema[node_properties[0]].dataType, ArrayType
    ):
        vec = F.col(node_properties[0]).cast("array<double>")
    else:
        vec = F.array(*[F.col(p).cast("double") for p in node_properties])
    vecs = nodes.select(F.col("node_id").alias("vec_id"), vec.alias("embedding"))
    # filtered variant (gds.knn.filtered): sourceNodeFilter restricts the
    # query side, targetNodeFilter restricts the candidate INDEX before
    # ranking (top-k is taken among allowed targets, matching the reference)
    index_df = vecs
    queries_df = vecs
    if target_node_filter is not None:
        index_df = vecs.join(
            nodes.where(F.expr(target_node_filter)).select(
                F.col("node_id").alias("vec_id")), "vec_id", "left_semi")
    if source_node_filter is not None:
        queries_df = vecs.join(
            nodes.where(F.expr(source_node_filter)).select(
                F.col("node_id").alias("vec_id")), "vec_id", "left_semi")
    out = cosine_topk(index_df, k=top_k, queries=queries_df)
    return out.select(
        F.col("vec_id").alias("node1"),
        F.col("neighbor_id").alias("node2"),
        F.col("cosine").alias("similarity"),
    ).where(F.col("similarity") >= similarity_cutoff)


def cosine_topk_ivf(
    vecs: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed approximate cosine top-k (same output schema as
    :func:`cosine_topk`). Deterministic centroids: the ``n_clusters``
    lowest-id vectors. Recall < 1 by construction; tested against the
    exact kernel for recall ≥ threshold, not equality."""
    spark = vecs.sparkSession
    cents = vecs.orderBy(id_col).limit(int(n_clusters))
    c_ids, c_mat, c_norms = _collect_matrix(cents, id_col, vec_col)
    b_cent = spark.sparkContext.broadcast(c_mat / c_norms[:, None])
    probe = int(n_probe)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cmat = b_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            sims = (m / n[:, None]) @ cmat.T
            # own cluster for the index side; n_probe closest for query side
            own = np.argmax(sims, axis=1)
            probes = np.argsort(-sims, axis=1)[:, :probe]
            out = pd.DataFrame({
                id_col: pdf[id_col].to_numpy("int64"),
                "own_cluster": own.astype("int64"),
            })
            out["probe_clusters"] = [p.astype("int64").tolist() for p in probes]
            yield out

    clusters = vecs.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, own_cluster long, probe_clusters array<long>"
    )
    enriched = vecs.join(clusters, id_col)

    # index side grouped by own cluster; query probes its n_probe clusters
    index_side = enriched.select(
        F.col("own_cluster").alias("cluster"), F.col(id_col).alias("_iid"),
        F.col(vec_col).alias("_ivec"),
    )
    query_side = enriched.select(
        F.col(id_col), F.col(vec_col), F.explode("probe_clusters").alias("cluster")
    )
    joined = query_side.join(index_side, "cluster").where(F.col(id_col) != F.col("_iid"))

    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_ivec"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nq = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    ni = F.sqrt(F.aggregate(F.transform(F.col("_ivec"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    scored = joined.select(
        F.col(id_col).alias("vec_id"),
        F.col("_iid").alias("neighbor_id"),
        F.round(dot / (nq * ni), 6).alias("cosine"),
    ).dropDuplicates(["vec_id", "neighbor_id"])
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .drop("_rn")
    )
