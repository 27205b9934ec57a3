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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env: dict) -> str:
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=7200)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"failed: {cmd}")
    return out.stdout


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_nodes = sys.argv[3] if len(sys.argv) > 3 else "2000000"
    avg_deg = sys.argv[4] if len(sys.argv) > 4 else "8"
    fuses = [int(f) for f in (sys.argv[5].split(",") if len(sys.argv) > 5
                              else [3, 6])]
    inp = f"/tmp/gds_eff_probe_{n_nodes}/edges.parquet"

    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        _run([sys.executable,
              os.path.join(REPO, "scripts", "gen_scaling_input.py"),
              inp, n_nodes, avg_deg], dict(os.environ))

    gc = "-XX:+UseParallelGC -Xms24g -XX:+AlwaysPreTouch"
    ratio = n_big / n_small
    algos = os.environ.get("SPARK_GRAFT_ALGOS", "pagerank,wcc,lpa")
    keys = [(a, {"pagerank": "pagerank_s", "pagerank_csr": "pagerank_csr_s",
                 "wcc": "wcc_s", "lpa": "lpa_s", "tc": "tc_s"}[a])
            for a in algos.split(",")]
    for fuse in fuses:
        rec = {}
        for cpus in (n_small, n_big):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                       SPARK_GRAFT_PARTS="32", SPARK_GRAFT_FUSE=str(fuse),
                       SPARK_GRAFT_ALGOS=algos,
                       SPARK_DRIVER_MEMORY="24g", SPARK_GRAFT_GC=gc)
            out = _run([sys.executable,
                        os.path.join(REPO, "scripts", "scale_job.py"), inp], env)
            rec[cpus] = json.loads(
                [l for l in out.splitlines() if l.startswith("{")][-1])
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
