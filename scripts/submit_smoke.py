#!/usr/bin/env python
"""spark-submit smoke job: the full north-rule path from a zipped engine.

Launched as::

    spark-submit --master local[2] --py-files dist/engine.zip \
        scripts/submit_smoke.py

Unlike every other script in ``scripts/``, this one does NOT put the repo
on ``sys.path``: the engine package must resolve from the ``--py-files``
archive (zipimport), exactly as it would on a real multi-executor cluster
where the repo checkout doesn't exist on the workers. The session comes
from ``SparkSession.builder.getOrCreate()`` so master/conf are whatever
spark-submit provided — the job script owns the plan, not the deployment.

Pipeline (the BASELINE.json north-rule path end-to-end):
  deterministic edge list → synthesize source-repo table (repo, path,
  commit, lang, content) → per-row sha256 invariant → parse import/include
  references into the file link graph → PageRank + WCC.

Prints ONE JSON line with the package provenance (proof it imported from
the zip) and invariant checks; exits nonzero on any failure.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

import graph_data_science_spark
from graph_data_science_spark.graph import graph_from_edges
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.sources.edge_extraction import build_link_graph
from graph_data_science_spark.sources.repo_source import (
    synthesize_repo_table,
    verify_content_sha,
)

N_FILES = 120


def main() -> int:
    spark = SparkSession.builder.appName("gds-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # deterministic planted topology: a ring plus a skip-7 chord per node —
    # one weak component, every node referenced, no RNG
    ids = spark.range(N_FILES)
    planted = (
        ids.select(F.col("id").alias("src"), ((F.col("id") + 1) % N_FILES).alias("dst"))
        .unionByName(
            ids.select(F.col("id").alias("src"),
                       ((F.col("id") * 7 + 3) % N_FILES).alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    repos = synthesize_repo_table(spark, planted, n_files=N_FILES).persist()
    recorded = repos.select("repo", "path", "commit", "content_sha256")
    sha_mismatches = verify_content_sha(repos.drop("content_sha256"), recorded)

    id_map, nodes, edges = build_link_graph(repos.drop("content_sha256"))
    n_edges = edges.count()
    g = graph_from_edges(spark, edges.select("src", "dst", "weight"),
                         nodes.select("node_id"))

    pr = pagerank(g, tolerance=1e-7)
    agg = pr.scores.agg(F.sum("score").alias("s"), F.min("score").alias("mn"),
                        F.count("*").alias("n")).collect()[0]
    pr_sum, pr_min, pr_n = float(agg["s"]), float(agg["mn"]), int(agg["n"])
    comps = wcc(g).components.agg(
        F.countDistinct("component").alias("c")).collect()[0]["c"]

    result = {
        "package_file": graph_data_science_spark.__file__,
        "imported_from_zip": ".zip" in (graph_data_science_spark.__file__ or ""),
        "master": spark.sparkContext.master,
        "n_files": N_FILES,
        "n_edges": n_edges,
        "sha_mismatches": sha_mismatches,
        "pagerank_sum": round(pr_sum, 6),
        "pagerank_min": round(pr_min, 6),
        "n_components": comps,
    }
    print(json.dumps(result))

    ok = (
        result["imported_from_zip"]
        and sha_mismatches == 0
        # planted: ring (N) + skip-7 chords minus self-loop collisions,
        # deduped — the parse must recover exactly the planted edge count
        and n_edges == planted.count()
        and comps == 1
        and pr_n == N_FILES
        # GDS semantics: unnormalized scores, floor 1-d per node; with no
        # dangling nodes the fixpoint total is N, approached from below
        and pr_min >= 0.15 - 1e-9
        and 0.8 * N_FILES < pr_sum <= N_FILES + 1e-6
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
