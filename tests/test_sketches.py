"""Mergeable sketches (operators/sketches.py): HLL accuracy + merge
associativity, log2-histogram exactness, quantile interpolation."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.sketches import (
    histogram_quantiles,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
    log_histogram,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint()


def test_hll_accuracy_within_standard_error(spark, docs):
    # p=9 → relative standard error 1.04/sqrt(512) ≈ 4.6%; allow 3σ
    est = {r["group"]: r["approx_distinct"]
           for r in hll_distinct(docs, "lang", "text", p=9).collect()}
    exact = {r["lang"]: r["d"] for r in docs.groupBy("lang").agg(
        F.countDistinct("text").alias("d")).collect()}
    for g, d in exact.items():
        rel = abs(est[g] - d) / d
        assert rel <= 3 * 1.04 / math.sqrt(512), (g, est[g], d)


def test_hll_merge_equals_whole(spark, docs):
    """Mergeability — the property that makes incremental accounting free:
    sketch two disjoint halves independently, max-merge, get the identical
    register state (hence identical estimate) as one pass."""
    h1 = hll_registers(docs.where("doc_id % 2 = 0"), "lang", "text")
    h2 = hll_registers(docs.where("doc_id % 2 = 1"), "lang", "text")
    merged = {(r["group"], r["reg"]): r["rho"]
              for r in hll_merge(h1, h2).collect()}
    whole = {(r["group"], r["reg"]): r["rho"]
             for r in hll_registers(docs, "lang", "text").collect()}
    assert merged == whole


def test_hll_insensitive_to_duplicates(spark, docs):
    # distinct count must ignore multiplicity: doubling every row changes
    # nothing in the register state
    doubled = docs.unionByName(docs)
    a = {(r["group"], r["reg"]): r["rho"]
         for r in hll_registers(docs, "lang", "text").collect()}
    b = {(r["group"], r["reg"]): r["rho"]
         for r in hll_registers(doubled, "lang", "text").collect()}
    assert a == b


def test_hll_p_bounds(docs):
    with pytest.raises(ValueError):
        hll_registers(docs, "lang", "text", p=3)
    with pytest.raises(ValueError):
        hll_registers(docs, "lang", "text", p=17)


def test_log_histogram_exact_counts(spark, docs):
    hist = log_histogram(docs, "lang", "n_chars")
    total = hist.agg(F.sum("cnt")).first()[0]
    assert total == docs.count()
    # bin b covers [2^(b-1), 2^b): verify against a direct recount
    direct = docs.select(
        "lang", F.length(F.bin(F.col("n_chars").cast("long"))).alias("b"))
    want = {(r["lang"], r["b"]): r["c"] for r in
            direct.groupBy("lang", "b").agg(
                F.count(F.lit(1)).alias("c")).collect()}
    got = {(r["group"], r["bin"]): r["cnt"] for r in hist.collect()}
    assert got == want


def test_quantiles_ordered_and_bracketed(spark, docs):
    qtl = histogram_quantiles(log_histogram(docs, "lang", "n_chars"))
    rows = sorted((r["group"], r["q"], r["est"]) for r in qtl.collect())
    by_group = {}
    for g, q, est in rows:
        by_group.setdefault(g, []).append((q, est))
    stats = {r["lang"]: (r["lo"], r["hi"]) for r in docs.groupBy("lang").agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")).collect()}
    for g, pairs in by_group.items():
        ests = [e for _, e in sorted(pairs)]
        assert ests == sorted(ests)           # monotone in q
        lo, hi = stats[g]
        for e in ests:                        # inside the value range's bins
            assert e <= 2 * hi and e >= lo / 2


def test_quantile_median_near_exact(spark, docs):
    # log2 bins are coarse, but the interpolated median must land within
    # the true median's bin (factor-2 band)
    qtl = {r["group"]: r["est"] for r in histogram_quantiles(
        log_histogram(docs, "lang", "n_chars"), qs=(0.5,)).collect()}
    for r in docs.groupBy("lang").agg(
            F.expr("percentile(n_chars, 0.5)").alias("md")).collect():
        est = qtl[r["lang"]]
        assert est / 2 <= r["md"] <= est * 2, (r["lang"], est, r["md"])


def test_streaming_hll_matches_batch_sketch(spark, tmp_path, docs):
    """Drain two drops of documents through the streaming maintainer: the
    persisted register store must equal the one-pass batch sketch of the
    union EXACTLY (HLL union is associative, not approximate-on-top)."""
    import os

    from graph_data_science_spark.streaming.ingest import run_streaming_hll

    drop = os.path.join(str(tmp_path), "hll_drop")
    state = os.path.join(str(tmp_path), "hll_state")
    half1 = docs.where("doc_id % 2 = 0").select("doc_id", "text", "lang")
    half2 = docs.where("doc_id % 2 = 1").select("doc_id", "text", "lang")

    half1.write.mode("append").parquet(drop)
    s1 = {(r["group"], r["reg"]): r["rho"]
          for r in run_streaming_hll(spark, drop, state).collect()}
    want1 = {(r["group"], r["reg"]): r["rho"]
             for r in hll_registers(half1, "lang", "text").collect()}
    assert s1 == want1

    half2.write.mode("append").parquet(drop)
    s2 = {(r["group"], r["reg"]): r["rho"]
          for r in run_streaming_hll(spark, drop, state).collect()}
    want = {(r["group"], r["reg"]): r["rho"]
            for r in hll_registers(docs, "lang", "text").collect()}
    assert s2 == want


def test_hll_large_p_float_path(spark, docs):
    # p outside [8,9] takes the float-sum estimator branch; accuracy must
    # still hold (p=12 → SE 1.6%, allow 3σ ≈ 5%)
    est = {r["group"]: r["approx_distinct"]
           for r in hll_distinct(docs, "lang", "text", p=12).collect()}
    exact = {r["lang"]: r["d"] for r in docs.groupBy("lang").agg(
        F.countDistinct("text").alias("d")).collect()}
    for g, d in exact.items():
        assert abs(est[g] - d) / d <= 3 * 1.04 / math.sqrt(4096), (g, est[g], d)
