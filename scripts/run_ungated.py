"""Run the rows-only __spark_entry__ queries that sit OUTSIDE the driver's
50-entry correctness gate at the gate's scale (sf0.01), so "every entry runs
at gate scale" stays a tested claim even for entries the gate cap displaces.

Usage: python scripts/run_ungated.py [sf_dir]
Prints one line per query: name, row count, wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from graph_data_science_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # the engine session: UTC timezone (events ops assert it), AQE + Arrow on
    spark = get_spark(app_name="run-ungated", master="local[8]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()
    oracled = set(entrymod.oracle_sql())
    gated = list(q)[:50]
    targets = [k for k in q if k not in gated]
    out = {}
    for name in targets:
        t0 = time.time()
        try:
            n = q[name](spark, sf_dir).count()
            out[name] = {"rows": n, "sec": round(time.time() - t0, 2),
                         "oracled": name in oracled}
        except Exception as exc:  # noqa: BLE001 — survey run, report and move on
            out[name] = {"err": str(exc)[:200]}
        print(name, json.dumps(out[name]), flush=True)
    bad = [k for k, v in out.items() if "err" in v or v.get("rows", 0) < 0]
    print(json.dumps({"sf_dir": sf_dir, "ran": len(out), "failed": len(bad)}))
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
