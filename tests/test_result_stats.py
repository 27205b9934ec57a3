"""stats-mode distributions vs numpy (linear-interpolation quantiles).

GDS parity surface: CentralityStatistics/CommunityStatistics histograms
(proc-common). numpy's default 'linear' percentile method IS the
quantile_cont / Spark-F.percentile definition, so it is an independent
exact reference here.
"""

from __future__ import annotations

import numpy as np

from graph_data_science_spark.operators.result_stats import (
    centrality_distribution,
    community_distribution,
)


def _np_pcts(vals):
    return {nm: round(float(np.percentile(vals, p)), 4)
            for p, nm in ((50, "p50"), (75, "p75"), (90, "p90"),
                          (95, "p95"), (99, "p99"))}


def test_centrality_distribution_matches_numpy(spark):
    vals = [0.15, 0.2, 0.2, 0.35, 0.5, 0.8, 1.25, 2.0, 3.5]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "node_id long, score double")
    row = centrality_distribution(df, "score").collect()[0].asDict()
    assert row["n"] == len(vals)
    assert row["min_score"] == min(vals)
    assert row["max_score"] == max(vals)
    assert row["mean_score"] == round(float(np.mean(vals)), 4)
    for nm, want in _np_pcts(vals).items():
        assert row[nm] == want, (nm, row[nm], want)


def test_centrality_distribution_approx_mode(spark):
    # the 100 TB path: bounded-memory sketch, same schema, near-exact here
    vals = list(np.linspace(0.15, 4.0, 200))
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "node_id long, score double")
    ex = centrality_distribution(df, "score", exact=True).collect()[0]
    ap = centrality_distribution(df, "score", exact=False).collect()[0]
    assert ex.asDict().keys() == ap.asDict().keys()
    for nm in ("p50", "p75", "p90", "p95", "p99"):
        assert abs(ex[nm] - ap[nm]) < 0.1


def test_community_distribution_matches_numpy(spark):
    # components: sizes 1, 2, 3, 6
    assign = [(0, 10), (1, 20), (2, 20), (3, 30), (4, 30), (5, 30)] + [
        (6 + i, 40) for i in range(6)]
    df = spark.createDataFrame(assign, "node_id long, component long")
    row = community_distribution(df).collect()[0].asDict()
    sizes = [1, 2, 3, 6]
    assert row["community_count"] == 4
    assert row["min_size"] == 1 and row["max_size"] == 6
    assert row["mean_size"] == 3.0
    for nm, want in _np_pcts(sizes).items():
        assert row[nm] == want, (nm, row[nm], want)
