#!/usr/bin/env python
"""Raw shuffle-substrate scaling probe: pure ``groupBy(dst).sum`` over the
pre-generated scaling edge table — no engine code — at the parallelism given
by SPARK_GRAFT_CPUS. Best-of-3. Prints one JSON line.

This measures the HOST's ceiling for any shuffle-dominated job at a given
thread count (BENCH/BASELINE.md "substrate ceiling" section): on one box,
threads share one memory subsystem, so the interesting question per core
pair (N, 4N) is whether the substrate itself still scales there.
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
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gds_scaling/edges.parquet"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # fixed partition count regardless of thread count — the same
    # layout-is-a-property-of-the-dataset protocol every engine scaling
    # measurement uses (scale_job.py), so the N vs 4N substrate comparison
    # varies ONLY parallelism, not the shuffle decomposition
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "32"))
    spark = get_spark(app_name=f"gds-substrate-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=parts)
    edges = spark.read.parquet(path).select("src", "dst").persist()
    n = edges.count()
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        edges.groupBy("dst").agg(F.count(F.lit(1)).alias("c")) \
            .agg(F.sum("c")).first()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"cpus": cpus, "n_edges": n,
                      "substrate_best_s": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
