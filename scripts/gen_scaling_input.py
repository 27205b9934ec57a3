#!/usr/bin/env python
"""Generate the deterministic synthetic scaling-input graph (seeded
power-law, gds.graph.generate analog) to parquet. Sized so one PageRank
superstep takes multiple seconds at local[8] (BASELINE.md protocol)."""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.sources.generator import POWER_LAW, random_graph


def ensure_input(path: str, n_nodes: int, avg_deg: int) -> None:
    """Generate the graph at ``path`` unless a COMPLETE output for the SAME
    parameters already exists. The generator is deterministic (seed 42), so
    same-params reuse is byte-equivalent; a ``_GEN_PARAMS.json`` sidecar
    guards against silently benchmarking a stale, differently-sized graph
    left at the same path by an earlier run with other parameters."""
    params_path = os.path.join(path, "_GEN_PARAMS.json")
    want = {"n_nodes": str(n_nodes), "avg_deg": str(avg_deg)}
    if os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(params_path):
        with open(params_path) as fh:
            if json.load(fh) == want:
                print(f"exists: {path} {want}")
                return
    shutil.rmtree(path, ignore_errors=True)
    spark = get_spark(app_name="gds-gen-scaling", master="local[32]",
                      shuffle_partitions=32)
    edges = random_graph(spark, n_nodes, avg_deg, POWER_LAW, seed=42,
                         max_degree=512)
    edges.write.mode("overwrite").parquet(path)
    spark.stop()
    with open(params_path, "w") as fh:
        json.dump(want, fh)
    print(f"wrote {path} {want}")


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gds_scaling/edges.parquet"
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    avg_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ensure_input(path, n_nodes, avg_deg)


if __name__ == "__main__":
    main()
