#!/usr/bin/env python
"""One scaling-run measurement: the iterative graph suite on a pre-generated
synthetic power-law graph, at the parallelism given by SPARK_GRAFT_CPUS.

Invoked by scaling_bench.py in its own JVM per parallelism level. Fixed
superstep counts (tolerance 0, fixed iterations) so both levels execute
identical work. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.graph import graph_from_edges
from graph_data_science_spark.operators.label_propagation import label_propagation
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.operators.triangle import triangle_count
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.session import get_spark


def main() -> None:
    path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pr_iters = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "6"))
    # partition count is a property of the DATA layout, not the cluster
    # size: a real N → 4N executor scale-up keeps the same partitioning and
    # spreads it over more slots. Fixing it across parallelism levels is
    # therefore the faithful cluster proxy (and measured: partitions=cpus
    # at low core counts under-decomposes the shuffle and understates the
    # low-end, inflating apparent efficiency loss — BENCH/BASELINE.md).
    # constant default (NOT a function of cpus): direct runs and
    # scaling_bench runs must measure the same data layout
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "32"))

    spark = get_spark(app_name=f"gds-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=parts)
    edges = spark.read.parquet(path).repartition(parts, "src").persist()
    n_edges = edges.count()
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct().persist()
    )
    n_nodes = nodes.count()
    g = graph_from_edges(spark, edges, nodes)

    out: dict = {"cpus": cpus, "parts": parts, "n_nodes": n_nodes,
                 "n_edges": n_edges}
    # optional subset for quick probes (scripts/eff_probe.py); the headline
    # scaling_bench run leaves this unset and measures the full suite
    algos = set(os.environ.get(
        "SPARK_GRAFT_ALGOS", "pagerank,pagerank_csr,wcc,lpa,tc").split(","))

    if "pagerank" in algos:
        t0 = time.monotonic()
        pr = pagerank(g, tolerance=0.0, max_iterations=pr_iters)
        pr.scores.agg(F.sum("score")).first()
        out["pagerank_s"] = round(time.monotonic() - t0, 3)
        out["pagerank_supersteps"] = pr.ran_iterations
        out["pagerank_eps"] = round(n_edges * pr.ran_iterations / out["pagerank_s"], 1)
        out["pagerank_block_ms"] = [round(m["wall_ms"]) for m in pr.metrics]

    if "pagerank_csr" in algos:
        t0 = time.monotonic()
        prc = pagerank(g, tolerance=0.0, max_iterations=pr_iters, mode="csr")
        prc.scores.agg(F.sum("score")).first()
        out["pagerank_csr_s"] = round(time.monotonic() - t0, 3)
        out["pagerank_csr_eps"] = round(n_edges * prc.ran_iterations / out["pagerank_csr_s"], 1)
        out["pagerank_csr_phase_ms"] = [
            {k: m[k] for k in ("phase", "superstep", "wall_ms") if k in m}
            for m in prc.metrics]

    if "wcc" in algos:
        t0 = time.monotonic()
        w = wcc(g)
        w.components.agg(F.countDistinct("component")).first()
        out["wcc_s"] = round(time.monotonic() - t0, 3)
        out["wcc_supersteps"] = w.ran_iterations
        out["wcc_eps"] = round(2 * n_edges * max(1, w.ran_iterations) / out["wcc_s"], 1)
        out["wcc_block_ms"] = [round(m["wall_ms"]) for m in w.metrics]

    if "lpa" in algos:
        t0 = time.monotonic()
        lp = label_propagation(g, max_iterations=5)
        lp.labels.agg(F.countDistinct("label")).first()
        out["lpa_s"] = round(time.monotonic() - t0, 3)
        out["lpa_supersteps"] = lp.ran_iterations
        out["lpa_block_ms"] = [round(m["wall_ms"]) for m in lp.metrics]

    if "tc" in algos:
        t0 = time.monotonic()
        tc = triangle_count(g)
        out["tc_s"] = round(time.monotonic() - t0, 3)
        out["n_triangles"] = tc.global_count
        out["tc_eps"] = round(n_edges / out["tc_s"], 1)

    if "betweenness" in algos:
        # round-5 changed-kernel solo probe: sampled Brandes over the
        # rewritten MSBFS (per-level scratch streams + exact-count
        # broadcast gating). Deterministic source set = the k smallest
        # node ids; work identical at every parallelism level.
        from graph_data_science_spark.operators.centrality import betweenness
        k_src = int(os.environ.get("SPARK_GRAFT_BC_SOURCES", "4"))
        srcs = [r[0] for r in nodes.orderBy("node_id").limit(k_src).collect()]
        t0 = time.monotonic()
        bc = betweenness(g, sources=srcs, max_iterations=30)
        bc.agg(F.sum("score")).first()
        out["betweenness_s"] = round(time.monotonic() - t0, 3)
        out["bc_sources"] = k_src

    print(json.dumps(out))


if __name__ == "__main__":
    main()
