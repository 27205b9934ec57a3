#!/usr/bin/env python
"""Quick two-parallelism efficiency probe for tuning engine knobs.

Runs scale_job.py at local[n_small] and local[n_big] for each candidate
SPARK_GRAFT_FUSE, on a smaller graph than the headline scaling run, and
prints efficiency per (fuse, algorithm). The headline BENCH/BASELINE.md
evidence still comes from scripts/scaling_bench.py on the 8M-node input —
this probe exists so knob choices are measured on the cheap input first.

Usage: python scripts/eff_probe.py [n_small] [n_big] [n_nodes] [avg_deg] [fuse,...]
"""

from __future__ import annotations

import json
import os
import sys

from _common import REPO, clean_env, last_json, run_cmd


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_nodes = sys.argv[3] if len(sys.argv) > 3 else "2000000"
    avg_deg = sys.argv[4] if len(sys.argv) > 4 else "8"
    fuses = [int(f) for f in (sys.argv[5].split(",") if len(sys.argv) > 5
                              else [3, 6])]
    inp = f"/tmp/gds_eff_probe_{n_nodes}/edges.parquet"

    # sidecar-guarded: regenerates when avg_deg (not in the path) changed
    run_cmd([sys.executable,
             os.path.join(REPO, "scripts", "gen_scaling_input.py"),
             inp, n_nodes, avg_deg])

    gc = "-XX:+UseParallelGC -Xms24g -XX:+AlwaysPreTouch"
    ratio = n_big / n_small
    algos = os.environ.get("SPARK_GRAFT_ALGOS", "pagerank,wcc,lpa")
    keys = [(a, {"pagerank": "pagerank_s", "pagerank_csr": "pagerank_csr_s",
                 "wcc": "wcc_s", "lpa": "lpa_s", "tc": "tc_s"}[a])
            for a in algos.split(",")]
    for fuse in fuses:
        rec = {}
        for cpus in (n_small, n_big):
            env = clean_env(SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_PARTS=32,
                            SPARK_GRAFT_FUSE=fuse, SPARK_GRAFT_ALGOS=algos,
                            SPARK_DRIVER_MEMORY="24g", SPARK_GRAFT_GC=gc)
            rec[cpus] = last_json(run_cmd(
                [sys.executable,
                 os.path.join(REPO, "scripts", "scale_job.py"), inp], env))
            print(json.dumps({"fuse": fuse, **rec[cpus]}), flush=True)
        eff = {name: round((rec[n_small][k] / rec[n_big][k]) / ratio, 3)
               for name, k in keys}
        tot_s = sum(rec[n_small][k] for _, k in keys)
        tot_b = sum(rec[n_big][k] for _, k in keys)
        print(json.dumps({"fuse": fuse, "efficiency": eff,
                          "suite_eff": round((tot_s / tot_b) / ratio, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
