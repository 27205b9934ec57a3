#!/usr/bin/env python
"""Two-parallelism scaling evidence (north rule: ≥0.8 efficiency N → 4N).

No real cluster exists in this sandbox, so the rule's two-cluster-size
criterion is evidenced by running the SAME job on the SAME input at two
local parallelism levels (BASELINE.md protocol): local[8] vs local[32],
each in its own JVM via subprocess. Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [sf_dir] [n_small] [n_big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"bench.py failed at local[{cpus}]")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    small = run(n_small, sf_dir)
    big = run(n_big, sf_dir)

    ratio = n_big / n_small
    rows = []
    iterative = ["pagerank", "wcc", "label_propagation", "triangle_count",
                 "minhash_lsh", "embedding_topk"]
    for q in iterative:
        ts, tb = small["queries"][q], big["queries"][q]
        eff = (ts / tb) / ratio
        rows.append((q, ts, tb, ts / tb, eff))
    t_s, t_b = small["value"], big["value"]
    total_eff = (t_s / t_b) / ratio

    md = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        f"Input: `{sf_dir}` — {small['n_nodes']} nodes, {small['n_edges']} edges "
        f"(derived link graph), documents/embeddings tables at the same SF.",
        "",
        f"Protocol (BASELINE.md): same job, same input, local[{n_small}] vs "
        f"local[{n_big}] in separate JVMs; scaling efficiency = "
        f"(T_small / T_big) / {ratio:.0f}. North-rule target ≥ 0.8.",
        "",
        f"| query | local[{n_small}] s | local[{n_big}] s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for q, ts, tb, sp, eff in rows:
        md.append(f"| {q} | {ts:.2f} | {tb:.2f} | {sp:.2f}× | {eff:.2f} |")
    md += [
        f"| **total** | {t_s:.2f} | {t_b:.2f} | {t_s/t_b:.2f}× | **{total_eff:.2f}** |",
        "",
        "## Throughput",
        "",
        f"- PageRank: {small['pagerank_supersteps']:.0f} supersteps; "
        f"edges/sec/superstep {small['pagerank_edges_per_sec_per_superstep']:.0f} "
        f"(local[{n_small}]) → {big['pagerank_edges_per_sec_per_superstep']:.0f} "
        f"(local[{n_big}])",
        f"- WCC: {small['wcc_supersteps']:.0f} supersteps; edges/sec/superstep "
        f"{small['wcc_edges_per_sec_per_superstep']:.0f} → "
        f"{big['wcc_edges_per_sec_per_superstep']:.0f}",
        f"- Triangle count: {small['n_triangles']:.0f} triangles; edges/sec "
        f"{small['triangle_edges_per_sec']:.0f} → {big['triangle_edges_per_sec']:.0f}",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(small),
        json.dumps(big),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(f"wrote {path}; total efficiency {total_eff:.2f}")


if __name__ == "__main__":
    main()
