#!/usr/bin/env python
"""Two-parallelism scaling evidence for the CORPUS pipeline ops
(companion to scaling_bench.py, same protocol): generate a deterministic
synthetic document corpus once, run corpus_scale_job.py at local[N] and
local[4N] in separate JVMs with the SAME fixed partition layout, report
per-op efficiency = (T_N / T_4N) / 4.

Corpus shape (pure Catalyst generation, seed-free determinism): docs in
groups of 8 — positions 0-5 unique, position 6 an EXACT copy of position
5, position 7 a NEAR duplicate of position 5 (last 3 of 20 tokens
differ) — so exact dedup and MinHash LSH both find real work (12.5%
exact dups, 12.5% near dups), languages round-robin over 5 values.

Usage: python scripts/corpus_scaling_bench.py [n_small] [n_big] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys

from _common import REPO, clean_env, last_json, run_cmd

INPUT = "/tmp/gds_corpus_scaling/docs.parquet"

# The corpus ops are allocation-heavy (string md5 per shingle-hash), so GC
# is a large work fraction — and ParallelGC defaults its thread pool to the
# HOST's 32 cores at BOTH parallelism levels, handing the 2-slot run ~20
# free cores of collection and deflating measured efficiency (the inverse
# of the round-2 lazy-heap artifact). A real N-core executor collects with
# N-proportional threads, so the faithful proxy pins ParallelGCThreads to
# the level's core count; the pre-touched fixed heap mirrors SCALE_GC in
# scaling_bench.py.
GEN_GC = ("-XX:+UseParallelGC -Xms24g -XX:+AlwaysPreTouch"
          " -XX:ParallelGCThreads={cpus}")


def generate(n_docs: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from graph_data_science_spark.session import get_spark
    spark = get_spark(app_name="gds-corpus-gen", master="local[8]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pos = F.pmod(F.col("doc_id"), F.lit(8))
    # content seed: pos 6 copies pos 5's seed; pos 7 shares it but salts
    # its last tokens
    seed = F.when(pos >= 6, F.col("doc_id") - (pos - 5)) \
        .otherwise(F.col("doc_id"))
    is_near = (pos == 7).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda j: F.substring(F.md5(F.concat_ws(
            ":", seed.cast("string"), j.cast("string"),
            F.when((j >= 17) & (is_near == 1), F.lit("x"))
            .otherwise(F.lit("")))), 1, 6))
    langs = F.array(*[F.lit(x) for x in ["py", "java", "c", "en", "de"]])
    out = df.select(
        "doc_id",
        F.array_join(tokens, " ").alias("text"),
        F.element_at(langs, (F.pmod(F.col("doc_id"), F.lit(5)) + 1)
                     .cast("int")).alias("lang"))
    out = out.withColumn("n_chars", F.length("text"))
    out.repartition(32, "doc_id").write.mode("overwrite").parquet(INPUT)
    n = spark.read.parquet(INPUT).count()
    print(f"generated {n} docs at {INPUT}")
    spark.stop()


def run_level(cpus: int) -> dict:
    env = clean_env(SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_PARTS=32)
    env.setdefault("SPARK_DRIVER_MEMORY", "24g")
    env.setdefault("SPARK_GRAFT_GC", GEN_GC.format(cpus=cpus))
    return last_json(run_cmd(
        [sys.executable,
         os.path.join(REPO, "scripts", "corpus_scale_job.py"), INPUT],
        env))


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    if not os.path.exists(INPUT):
        generate(n_docs)
    lo = run_level(n_small)
    hi = run_level(n_big)
    factor = n_big / n_small
    eff = {}
    for k in lo:
        if k.endswith("_s") and k in hi and hi[k] > 0:
            eff[k[:-2]] = round((lo[k] / hi[k]) / factor, 3)
    print(json.dumps({"lo": lo, "hi": hi, "factor": factor,
                      "efficiency": eff}))


if __name__ == "__main__":
    main()
