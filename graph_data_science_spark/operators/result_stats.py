"""Execution-mode ``stats`` result distributions (GDS parity).

Every GDS ``*.stats`` proc returns a result histogram — centrality procs a
``centralityDistribution`` and community procs a ``communityDistribution``
(min/mean/max/p50/p75/p90/p95/p99), built from an HdrHistogram over the
result values (proc-common: ``CentralityStatistics.java`` /
``CommunityStatistics.java``). This module is the Spark-native analog:

- ``exact=True`` (default): ``F.percentile`` — a single partial-aggregated
  pass whose merge buffer holds the value multiset. Bit-comparable across
  engines (the DuckDB oracle uses ``quantile_cont``, the same
  linear-interpolation definition), so it is the correctness-gate path.
- ``exact=False``: ``F.percentile_approx`` — a bounded-memory KLL-style
  sketch, the 100 TB path (the reference's HdrHistogram is itself an
  approximate fixed-memory structure, so approximate is the parity-faithful
  mode at scale). Same plan shape: one partial agg, no extra shuffle.

Both are ONE aggregation over the result DataFrame: no join, no window, no
driver-side collect of values — at 10^9 nodes the exact mode's only cost is
the sort-buffer inside the final reduce, which is why ``exact=False`` is
the documented default for cluster runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PCTS = (0.5, 0.75, 0.9, 0.95, 0.99)
_PCT_NAMES = ("p50", "p75", "p90", "p95", "p99")


def _pct(col: str, p: float, exact: bool):
    return F.percentile(F.col(col), F.lit(p)) if exact \
        else F.percentile_approx(F.col(col), F.lit(p))


def centrality_distribution(
    scores: DataFrame, col: str = "score", exact: bool = True, nd: int = 4
) -> DataFrame:
    """``centralityDistribution`` analog — one row: n, min/mean/max, p50-p99.

    Percentiles are rounded to ``nd`` dp (interpolation of identical inputs
    can differ in the last ulp across engines; 4 dp is far above ulp noise
    and far below result resolution).
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(col), 6).alias("min_score"),
        F.round(F.avg(col), nd).alias("mean_score"),
        F.round(F.max(col), 6).alias("max_score"),
    ] + [
        F.round(_pct(col, p, exact), nd).alias(nm)
        for p, nm in zip(_PCTS, _PCT_NAMES)
    ]
    return scores.agg(*aggs)


def community_distribution(
    components: DataFrame, col: str = "component", exact: bool = True,
    nd: int = 4
) -> DataFrame:
    """``communityDistribution`` analog — one row: communityCount plus the
    size distribution (min/mean/max/p50-p99 over community sizes).

    Two partial-aggregated shuffles: sizes (groupBy component — the same agg
    every community algorithm already ends with) then the one-row rollup
    over ``#communities`` rows, which is tiny by construction.
    """
    sizes = components.groupBy(F.col(col)).agg(
        F.count(F.lit(1)).alias("sz"))
    aggs = [
        F.count(F.lit(1)).alias("community_count"),
        F.min("sz").alias("min_size"),
        F.round(F.avg("sz"), nd).alias("mean_size"),
        F.max("sz").alias("max_size"),
    ] + [
        F.round(_pct("sz", p, exact), nd).alias(nm)
        for p, nm in zip(_PCTS, _PCT_NAMES)
    ]
    return sizes.agg(*aggs)
