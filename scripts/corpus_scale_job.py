#!/usr/bin/env python
"""One corpus-ops scaling run at SPARK_GRAFT_CPUS (companion to
scale_job.py, same protocol: fixed partition layout across parallelism
levels, one JVM per level, prints ONE JSON line).

Ops measured — the training-data pipeline core over a synthetic document
corpus (generated once by corpus_scaling_bench.py):

  text_stats    token_count + quality_score scan (stateless, the scan floor)
  minhash_lsh   MinHash signatures -> banded LSH candidate pairs (count)
  exact_dedup   hash-groupBy duplicate decision (count of drops)
  hll           per-lang HLL registers + distinct estimate
  pq_encode     PQ codebook train on a 1% hash sample + full-corpus encode
                over the hashed-feature vectors

Usage: python scripts/corpus_scale_job.py <docs_parquet>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.session import get_spark


def main() -> None:
    path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    # layout is a property of the DATA (scale_job.py protocol note)
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "32"))

    spark = get_spark(app_name=f"gds-corpus-scale-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(path).repartition(parts, "doc_id").persist()
    n_docs = docs.count()
    res: dict = {"cpus": cpus, "parts": parts, "n_docs": n_docs}

    from graph_data_science_spark.operators.dedup import (
        exact_duplicates, minhash_lsh_pairs)
    from graph_data_science_spark.operators.sketches import hll_distinct
    from graph_data_science_spark.operators.text import (
        quality_score, token_count)

    t0 = time.monotonic()
    n_tokens = (token_count(docs).agg(F.sum("n_tokens")).first()[0] or 0)
    qrows = quality_score(docs).where(F.col("quality") > 0.5).count()
    res["text_stats_s"] = round(time.monotonic() - t0, 3)
    res["n_tokens"] = int(n_tokens)
    res["quality_keep"] = int(qrows)

    t0 = time.monotonic()
    pairs = minhash_lsh_pairs(docs).count()
    res["minhash_lsh_s"] = round(time.monotonic() - t0, 3)
    res["lsh_pairs"] = int(pairs)

    t0 = time.monotonic()
    drops = exact_duplicates(docs).where(
        F.col("doc_id") != F.col("canonical_id")).count()
    res["exact_dedup_s"] = round(time.monotonic() - t0, 3)
    res["exact_drops"] = int(drops)

    t0 = time.monotonic()
    est = {r["group"]: r["approx_distinct"]
           for r in hll_distinct(docs, "lang", "text", p=9).collect()}
    res["hll_s"] = round(time.monotonic() - t0, 3)
    res["hll_groups"] = len(est)

    from graph_data_science_spark.operators.pipeline_ops import (
        hashed_ngram_features)
    from graph_data_science_spark.operators.pq import pq_encode, pq_train

    t0 = time.monotonic()
    feats = hashed_ngram_features(docs, dim=64, long_format=False) \
        .persist()
    model = pq_train(feats, m=4, k=16, max_iterations=2,
                     id_col="doc_id", vec_col="features",
                     sample_fraction=0.01)
    n_codes = pq_encode(feats, model, id_col="doc_id",
                        vec_col="features").count()
    res["pq_encode_s"] = round(time.monotonic() - t0, 3)
    res["pq_codes"] = int(n_codes)
    feats.unpersist()

    res["total_s"] = round(sum(v for k, v in res.items()
                               if k.endswith("_s")), 3)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
