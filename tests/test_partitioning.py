"""Unit tests for the factored-out two-level prefix helper
(plans/partitioning.py) — the machinery under token_budget_sample and
lm_perplexity_buckets."""

from pyspark.sql import functions as F

from graph_data_science_spark.plans.partitioning import (
    bucketed_exclusive_prefix,
)


def test_prefix_matches_global_window(spark):
    d = spark.createDataFrame(
        [(i % 4, i, (i * 7) % 5 + 1) for i in range(40)],
        "b long, k long, v long")
    out = {r["k"]: r["_prefix"] for r in
           bucketed_exclusive_prefix(d, "b", ["k"], 4, value="v").collect()}
    rows = sorted(d.collect(), key=lambda r: (r["b"], r["k"]))
    acc = 0
    for r in rows:
        assert out[r["k"]] == acc
        acc += r["v"]


def test_prefix_clamps_out_of_range_buckets(spark):
    """An out-of-range bucket id (e.g. a boundary u == 1.0 mapping to
    n_buckets) must land in the last bucket, not vanish through the
    broadcast inner join (regression: rows were silently dropped)."""
    d = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 3), (-1, 4)], "b long, k long")
    out = bucketed_exclusive_prefix(d, "b", ["k"], 4)
    rows = {r["k"]: (r["b"], r["_prefix"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}           # nothing dropped
    assert rows[3][0] == 3                     # 4 clamped into last bucket
    assert rows[4][0] == 0                     # -1 clamped into first
    # counts: bucket0 holds k=1 (pos 0) and k=4 (pos 1), then k=2, k=3
    assert rows[1][1] == 0 and rows[4][1] == 1
    assert rows[2][1] == 2 and rows[3][1] == 3
