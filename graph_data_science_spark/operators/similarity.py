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
) -> DataFrame:
    """``gds.nodeSimilarity`` analog → (node1, node2, similarity).

    metric ∈ {JACCARD, OVERLAP, COSINE(unweighted)}; similarity rounded 6dp.
    Only node pairs sharing ≥1 out-neighbor are scored (the reference's
    inverted-index pruning); top_k per node1 by (similarity DESC, node2 ASC).
    """
    nbrs = graph.edges.select("src", "dst").distinct()
    sizes = nbrs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ok = sizes.where(F.col("deg") >= int(degree_cutoff))
    nbrs = nbrs.join(ok.select("src"), "src", "left_semi")

    inter = (
        nbrs.alias("x")
        .join(nbrs.alias("y"), "dst")
        .where(F.col("x.src") != F.col("y.src"))
        .groupBy(F.col("x.src").alias("node1"), F.col("y.src").alias("node2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
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


def cosine_topk(
    vecs: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k self-join → (vec_id, neighbor_id, cosine), self
    excluded, ranked (cosine DESC, neighbor_id ASC), rounded 6dp.

    The index side (``vecs``) is collected to a broadcast NumPy matrix —
    valid while the index fits the driver (embedding dims × rows; for a
    100 TB corpus you shard the index side and union the per-shard top-k,
    which is exactly re-invoking this function per shard + a final
    window). The query side streams through ``mapInPandas`` as Arrow
    batches: one GEMM per batch.
    """
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
) -> DataFrame:
    """``gds.knn`` analog: k nearest neighbors by node-property similarity
    → (node1, node2, similarity).

    Scalar properties are assembled into a vector; an array property is used
    as-is; similarity = cosine. Runs on the exact GEMM kernel
    (:func:`cosine_topk`) — the reference's NN-Descent approximation is a
    convergence optimization, not a semantic; its `.estimate`-documented
    output contract (top-k above cutoff) is what we reproduce.
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
    out = cosine_topk(vecs, k=top_k)
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
