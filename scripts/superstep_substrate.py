#!/usr/bin/env python
"""Per-algo SUBSTRATE probe (the VERDICT-accepted alternative evidence):
run the pagerank-SHAPED superstep chain as raw DataFrame ops — the same
shuffle-hash join + partial-aggregated sum + state join + parquet scratch
round-trip the engine plans, with NO engine in the loop (no Pregel driver,
no Observation, no metrics bookkeeping, no convergence read).

The scaling of this chain between two parallelism levels is the
hardware+Spark ceiling for the engine's pagerank at those levels; the
engine's gap to THIS (not to an idealized 1.0) is what engine overhead
actually costs. ``--observe`` adds the engine's Observation aggregates to
the materializing job so their price is A/B-able in isolation.

Usage:
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PARTS=32 \
  python scripts/superstep_substrate.py /tmp/gds_scaling/edges.parquet [--observe]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.plans.partitioning import shuffle_hash
from graph_data_science_spark.session import get_spark


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gds_scaling/edges.parquet"
    observe = "--observe" in sys.argv
    supersteps = int(os.environ.get("SPARK_GRAFT_SUPERSTEPS", "6"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "32"))
    spark = get_spark(app_name=f"substrate-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=parts)

    edges = spark.read.parquet(path).select("src", "dst") \
        .repartition(parts, "src").persist()
    edges.count()
    deg = edges.groupBy(F.col("src").alias("node_id")) \
        .agg(F.count(F.lit(1)).cast("double").alias("degree"))
    nodes = (edges.select(F.col("src").alias("node_id"))
             .unionByName(edges.select(F.col("dst").alias("node_id")))
             .distinct())
    state = nodes.join(deg, "node_id", "left").select(
        "node_id",
        F.coalesce("degree", F.lit(1.0)).alias("degree"),
        F.lit(0.15).alias("rank"),
        F.lit(0.15).alias("delta"),
        F.lit(1).alias("_active"),
    )

    tmp = tempfile.mkdtemp(prefix="substrate_")
    walls = []
    t_all = time.monotonic()
    for i in range(supersteps):
        t0 = time.monotonic()
        senders = shuffle_hash(
            state.where(F.col("_active") == 1)
            .select("node_id", "delta", "degree"))
        raw = edges.join(senders, edges.src == senders.node_id, "inner") \
            .select(F.col("dst"), (F.col("delta") / F.col("degree")).alias("m"))
        msgs = raw.groupBy("dst").agg(F.sum("m").alias("msg"))
        joined = state.join(shuffle_hash(msgs), state.node_id == msgs.dst, "left")
        nd = F.coalesce(F.lit(0.85) * F.col("msg"), F.lit(0.0))
        new_state = joined.select(
            state.node_id, state.degree,
            (F.col("rank") + nd).alias("rank"),
            nd.alias("delta"),
            (nd > F.lit(1e-7)).cast("int").alias("_active"),
        )
        if observe:
            from pyspark.sql import Observation
            obs = Observation(f"ss_{i}")
            new_state = new_state.observe(
                obs,
                F.sum(F.col("_active").cast("long")).alias("active"),
                F.count(F.lit(1)).alias("rows"),
                F.max("delta").alias("delta_max"),
                F.sum("rank").alias("rank_sum"))
        slot = os.path.join(tmp, f"slot{i % 2}")
        new_state.write.mode("overwrite").parquet(slot)
        if observe:
            _ = dict(obs.get)
        state = spark.read.parquet(slot)
        walls.append(round(time.monotonic() - t0, 2))
    total = time.monotonic() - t_all
    print(json.dumps({
        "probe": "pagerank_substrate", "observe": observe,
        "cpus": cpus, "parts": parts, "supersteps": supersteps,
        "total_s": round(total, 2), "walls_s": walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
