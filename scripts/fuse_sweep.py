#!/usr/bin/env python
"""Pick the superstep-fusion factor empirically (docs/SCALE_NOTES.md §10).

Runs scale_job.py on a mid-size deterministic input at ONE parallelism
level for each SPARK_GRAFT_FUSE in the sweep list, so the fused-plan cost
model (exchange reuse vs duplicated post-shuffle map work) is measured,
not assumed. Prints one JSON line per fuse level plus a summary.

Usage: python scripts/fuse_sweep.py [cpus] [n_nodes] [avg_deg] [fuse,fuse,...]
"""

from __future__ import annotations

import json
import os
import sys

from _common import REPO, clean_env, last_json, run_cmd

INPUT = "/tmp/gds_fuse_sweep/edges.parquet"


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_nodes = sys.argv[2] if len(sys.argv) > 2 else "2000000"
    avg_deg = sys.argv[3] if len(sys.argv) > 3 else "8"
    fuses = [int(f) for f in (sys.argv[4].split(",") if len(sys.argv) > 4
                              else [1, 3, 6])]

    # gen_scaling_input's _GEN_PARAMS.json sidecar makes this a no-op when
    # a complete same-params output already exists, and a regeneration when
    # the path holds a graph generated with OTHER parameters
    run_cmd([sys.executable,
             os.path.join(REPO, "scripts", "gen_scaling_input.py"),
             INPUT, n_nodes, avg_deg])

    results = {}
    for fuse in fuses:
        env = clean_env(SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_PARTS=32,
                        SPARK_GRAFT_FUSE=fuse)
        env.setdefault("SPARK_DRIVER_MEMORY", "24g")
        env.setdefault(
            "SPARK_GRAFT_GC", "-XX:+UseParallelGC -Xms24g -XX:+AlwaysPreTouch")
        rec = last_json(run_cmd(
            [sys.executable,
             os.path.join(REPO, "scripts", "scale_job.py"), INPUT], env))
        rec["fuse"] = fuse
        results[fuse] = rec
        print(json.dumps(rec), flush=True)

    keys = ["pagerank_s", "wcc_s", "lpa_s"]
    print(json.dumps({
        "summary": {f: round(sum(r[k] for k in keys), 1)
                    for f, r in results.items()},
        "keys": keys,
    }), flush=True)


if __name__ == "__main__":
    main()
