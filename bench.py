#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Primary metric (BASELINE.md): edges/sec per superstep across the iterative
graph suite (PageRank to 1e-7 convergence, WCC, label propagation) plus
wall times for triangle count and the training-data ops. ``value`` is the
total wall seconds over all headline queries.

Scaling protocol (north rule, sandbox proxy): run this file twice —
SPARK_GRAFT_CPUS=8 and SPARK_GRAFT_CPUS=32 — on the same SF dir; efficiency
= (T8/T32)/4. ``scripts/scaling_bench.py`` automates that and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from graph_data_science_spark.operators.dedup import minhash_lsh_pairs
from graph_data_science_spark.operators.label_propagation import label_propagation
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.operators.similarity import cosine_topk
from graph_data_science_spark.operators.text import quality_score, token_count
from graph_data_science_spark.operators.triangle import triangle_count
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.session import get_spark
from graph_data_science_spark.sources.tpch_graph import build_graph


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # parse the scale factor up front — an unparsable dir name must not
    # crash AFTER the whole bench has run (the JSON line is the output)
    tail = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(tail)
    except ValueError:
        sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]  # label, not a number

    spark = get_spark(app_name=f"gds-bench-sf{sf}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    graph = build_graph(spark, sf_dir)
    graph.edges.persist()
    n_edges = graph.edge_count()
    n_nodes = graph.node_count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    t0 = time.monotonic()
    pr = pagerank(graph)
    pr.scores.agg(F.sum("score")).first()
    timings["pagerank"] = time.monotonic() - t0
    extras["pagerank_supersteps"] = pr.ran_iterations
    extras["pagerank_edges_per_sec_per_superstep"] = (
        n_edges * pr.ran_iterations / timings["pagerank"])

    t0 = time.monotonic()
    prc = pagerank(graph, mode="csr")
    prc.scores.agg(F.sum("score")).first()
    timings["pagerank_csr"] = time.monotonic() - t0
    extras["pagerank_csr_edges_per_sec_per_superstep"] = (
        n_edges * prc.ran_iterations / timings["pagerank_csr"])

    t0 = time.monotonic()
    w = wcc(graph)
    w.components.agg(F.countDistinct("component")).first()
    timings["wcc"] = time.monotonic() - t0
    extras["wcc_supersteps"] = w.ran_iterations
    extras["wcc_edges_per_sec_per_superstep"] = (
        2 * n_edges * max(1, w.ran_iterations) / timings["wcc"])

    t0 = time.monotonic()
    lp = label_propagation(graph, max_iterations=10)
    lp.labels.agg(F.countDistinct("label")).first()
    timings["label_propagation"] = time.monotonic() - t0
    extras["lpa_supersteps"] = lp.ran_iterations

    t0 = time.monotonic()
    tc = triangle_count(graph)
    timings["triangle_count"] = time.monotonic() - t0
    extras["n_triangles"] = tc.global_count
    extras["triangle_edges_per_sec"] = n_edges / timings["triangle_count"]

    # round-2 headline additions: community detection + batched centrality
    from graph_data_science_spark.operators.centrality import betweenness
    from graph_data_science_spark.operators.louvain import louvain

    t0 = time.monotonic()
    lv = louvain(graph, max_levels=2, max_iterations=4)
    lv.communities.agg(F.countDistinct("community")).first()
    timings["louvain"] = time.monotonic() - t0
    extras["louvain_modularity"] = round(lv.modularity, 6)

    t0 = time.monotonic()
    # sampled Brandes: 256 deterministic sources — the scale posture
    srcs = [r[0] for r in graph.nodes.select("node_id")
            .orderBy("node_id").limit(256).collect()]
    betweenness(graph, sources=srcs).agg(F.sum("score")).first()
    timings["betweenness_256"] = time.monotonic() - t0

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    minhash_lsh_pairs(docs, num_hashes=8, bands=4).count()
    timings["minhash_lsh"] = time.monotonic() - t0

    # round-3 headline addition: the end-to-end dedup DECISION
    # (LSH pairs -> WCC over the pair graph -> keep/drop table)
    from graph_data_science_spark.operators.pipeline_ops import (
        near_duplicate_clusters)
    t0 = time.monotonic()
    (near_duplicate_clusters(docs, num_hashes=8, bands=4)
     .agg(F.sum(F.col("is_duplicate").cast("long"))).first())
    timings["near_dup_clusters"] = time.monotonic() - t0

    t0 = time.monotonic()
    token_count(docs).agg(F.sum("n_tokens")).first()
    quality_score(docs).agg(F.avg("quality")).first()
    timings["text_stats"] = time.monotonic() - t0

    # session-8 headline addition: the CCNet-style LM quality filter
    # (self-trained Stupid-Backoff trigram, integer micro-nat scoring)
    from graph_data_science_spark.operators.lm import ngram_lm_score
    t0 = time.monotonic()
    ngram_lm_score(docs).agg(F.avg("lm_score")).first()
    timings["lm_score"] = time.monotonic() - t0

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    t0 = time.monotonic()
    cosine_topk(embs, k=10).count()
    timings["embedding_topk"] = time.monotonic() - t0

    total = sum(timings.values())
    print(json.dumps({
        "metric": "edges/sec per superstep (PageRank 1e-7 + WCC + LPA) over derived link graph",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": cpus,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        **{k: (round(v, 1) if isinstance(v, float) else v) for k, v in extras.items()},
    }))


if __name__ == "__main__":
    main()
