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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = "/tmp/gds_fuse_sweep/edges.parquet"


def _run(cmd: list[str], env: dict | None = None) -> str:
    out = subprocess.run(cmd, env=env or dict(os.environ), capture_output=True,
                         text=True, timeout=7200)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"failed: {cmd}")
    return out.stdout


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_nodes = sys.argv[2] if len(sys.argv) > 2 else "2000000"
    avg_deg = sys.argv[3] if len(sys.argv) > 3 else "8"
    fuses = [int(f) for f in (sys.argv[4].split(",") if len(sys.argv) > 4
                              else [1, 3, 6])]

    if not os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        _run([sys.executable,
              os.path.join(REPO, "scripts", "gen_scaling_input.py"),
              INPUT, n_nodes, avg_deg])

    results = {}
    for fuse in fuses:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_PARTS="32", SPARK_GRAFT_FUSE=str(fuse))
        env.setdefault("SPARK_DRIVER_MEMORY", "24g")
        env.setdefault(
            "SPARK_GRAFT_GC", "-XX:+UseParallelGC -Xms24g -XX:+AlwaysPreTouch")
        out = _run([sys.executable,
                    os.path.join(REPO, "scripts", "scale_job.py"), INPUT], env)
        rec = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
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
