#!/usr/bin/env python
"""Generate the deterministic synthetic scaling-input graph (seeded
power-law, gds.graph.generate analog) to parquet. Sized so one PageRank
superstep takes multiple seconds at local[8] (BASELINE.md protocol)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.sources.generator import POWER_LAW, random_graph


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gds_scaling/edges.parquet"
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    avg_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        print(f"exists: {path}")
        return
    spark = get_spark(app_name="gds-gen-scaling", master="local[32]",
                      shuffle_partitions=32)
    edges = random_graph(spark, n_nodes, avg_deg, POWER_LAW, seed=42,
                         max_degree=512)
    edges.write.mode("overwrite").parquet(path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
