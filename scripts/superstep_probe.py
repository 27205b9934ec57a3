#!/usr/bin/env python
"""Per-superstep wall-time probe for the scaling investigation: run one
algorithm on the scaling input at SPARK_GRAFT_CPUS and print each
superstep's wall_ms (Pregel metrics). Usage:
    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 python scripts/superstep_probe.py pagerank
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.graph import graph_from_edges
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.operators.wcc import wcc
from graph_data_science_spark.session import get_spark


def main() -> None:
    algo = sys.argv[1] if len(sys.argv) > 1 else "pagerank"
    if algo not in ("pagerank", "wcc"):
        raise SystemExit(f"unknown algo {algo!r}: expected pagerank or wcc")
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gds_scaling/edges.parquet"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "32"))
    spark = get_spark(app_name=f"probe-{algo}-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=parts)
    edges = spark.read.parquet(path).repartition(parts, "src").persist()
    edges.count()
    nodes = (edges.select(F.col("src").alias("node_id"))
             .unionByName(edges.select(F.col("dst").alias("node_id")))
             .distinct().persist())
    nodes.count()
    g = graph_from_edges(spark, edges, nodes)
    t0 = time.monotonic()
    if algo == "pagerank":
        r = pagerank(g, tolerance=0.0, max_iterations=6)
        r.scores.agg(F.sum("score")).first()
        metrics = r.metrics
    else:
        r = wcc(g)
        r.components.agg(F.countDistinct("component")).first()
        metrics = r.metrics
    total = time.monotonic() - t0
    print(json.dumps({
        "algo": algo, "cpus": cpus, "parts": parts,
        "total_s": round(total, 2),
        "supersteps": [
            {"i": m.get("superstep"), "wall_s": round(m.get("wall_ms", 0) / 1000, 2),
             "active": m.get("active")} for m in metrics],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
