"""Streaming surface: watermarked windowed agg (availableNow) vs batch truth,
and batch sessionization sanity."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.streaming.events import (
    sessionize,
    stream_windowed_counts,
    windowed_counts_batch,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").persist()


def test_sessionize_structure(spark, events):
    sess = sessionize(events, gap_minutes=30).persist()
    total = sess.agg(F.sum("n_events")).first()[0]
    assert total == events.count()  # every event lands in exactly one session
    r = sess.where("t_end_us < t_start_us").count()
    assert r == 0
    # session indices are 1..k per user, contiguous
    per_user = sess.groupBy("user_id").agg(
        F.min("session_idx").alias("lo"), F.max("session_idx").alias("hi"),
        F.count(F.lit(1)).alias("k"))
    bad = per_user.where((F.col("lo") != 1) | (F.col("hi") != F.col("k"))).count()
    assert bad == 0


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 7, "a", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=50), 7, "a", 1.0, "{}"),   # 40min gap → new
        (4, t0 + dt.timedelta(minutes=55), 7, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    sess = sessionize(df, gap_minutes=30).orderBy("session_idx").collect()
    assert [(r["session_idx"], r["n_events"]) for r in sess] == [(1, 2), (2, 2)]


def test_stream_windowed_counts_matches_batch(spark, events):
    got = stream_windowed_counts(spark, f"{SF}/events.parquet",
                                 window="1 hour", watermark="2 hours",
                                 query_name="t_stream_wc")
    stream_rows = {(r["w_start_us"], r["event_type"]): (r["n"], r["sum_value"])
                   for r in got.collect()}
    assert stream_rows, "streaming query emitted nothing"
    batch = windowed_counts_batch(events, "1 hour")
    batch_rows = {(r["w_start_us"], r["event_type"]): (r["n"], r["sum_value"])
                  for r in batch.collect()}
    # append mode: emitted windows are exactly the batch values
    for k, v in stream_rows.items():
        assert batch_rows[k] == v
    # all but the final (watermark-open) windows were emitted
    assert len(stream_rows) >= len(batch_rows) * 0.8


def test_stream_sessionize_matches_batch_closed_sessions(spark, events):
    from graph_data_science_spark.streaming.events import stream_sessionize

    got = stream_sessionize(spark, f"{SF}/events.parquet", gap_minutes=30,
                            query_name="t_stream_sess")
    stream_rows = {(r["user_id"], r["t_start_us"]):
                   (r["n_events"], r["t_end_us"], r["total_value"])
                   for r in got.collect()}
    assert stream_rows, "stateful streaming query emitted nothing"
    batch = sessionize(events, gap_minutes=30)
    batch_rows = {(r["user_id"], r["t_start_us"]):
                  (r["n_events"], r["t_end_us"], r["total_value"])
                  for r in batch.collect()}
    # every emitted (closed) session must be a batch session, exactly
    for k, v in stream_rows.items():
        assert batch_rows[k] == v, (k, v, batch_rows.get(k))
    # each user's final (open) session is withheld by append semantics;
    # everything else must have been emitted
    n_users = batch.select("user_id").distinct().count()
    assert len(stream_rows) >= len(batch_rows) - n_users
