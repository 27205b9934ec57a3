"""Event-stream operators: watermarked windowed aggregation (streaming) and
gap-based sessionization (batch, window functions).

The streaming path is ``readStream`` over a parquet directory →
``withWatermark`` → windowed groupBy → ``availableNow`` trigger into a
memory sink; at scale the same query runs continuously against a
cloud-storage drop zone with the watermark bounding state. The batch
sessionizer is the relational equivalent the DuckDB oracle can check
(lag + conditional cumulative sum — the standard gap-and-island pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string")


def _utc_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a possibly-NTZ timestamp column to session-TZ TIMESTAMP.

    REQUIRES the session timezone to already be UTC (session.get_spark sets
    it) so ``unix_micros`` equals the raw parquet micros on every engine
    (DuckDB's epoch_us reads the same naive value). Asserting instead of
    mutating: a per-DataFrame helper must not silently change timestamp
    semantics of unrelated queries sharing the session."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"event operators require spark.sql.session.timeZone=UTC, got {tz!r}; "
            "build the session with graph_data_science_spark.session.get_spark")
    return df.withColumn(col, F.col(col).cast("timestamp"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user → (user_id, session_idx, n_events,
    t_start_us, t_end_us, total_value).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. Timestamps exported as epoch micros
    (BIGINT) for engine-portable comparison.
    """
    events = _utc_ts(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_minutes * 60_000_000), 1).otherwise(0)
    )
    sessioned = flagged.withColumn(
        "session_idx", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return (
        sessioned.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("t_start_us"),
            F.max(F.unix_micros("ts")).alias("t_end_us"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch equivalent of the streaming windowed aggregation (ground truth
    for the streaming test): counts + value sum per (window, event_type)."""
    events = _utc_ts(events)
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start_us"),
            "event_type", "n", "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_windowed",
) -> DataFrame:
    """Run the watermarked streaming aggregation over ``events_dir`` (parquet
    files) to completion with the availableNow trigger; returns the result
    as a DataFrame (reads the memory sink).

    Watermark semantics: late events older than ``watermark`` behind the max
    seen ts are dropped and window state is evicted — the unbounded-state
    guard a 100 TB/day stream needs. Append output mode emits only
    finalized (watermark-passed) windows, so with availableNow over a
    static directory windows still open at end-of-input are NOT emitted —
    callers wanting every window compare against
    :func:`windowed_counts_batch` restricted to closed windows.
    """
    import os
    import tempfile

    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"stream_windowed_counts requires spark.sql.session.timeZone=UTC, got {tz!r}")
    if os.path.isfile(events_dir):
        # the file-stream source requires a directory (its drop-zone model);
        # stage a single-file input behind a symlink
        staged = tempfile.mkdtemp(prefix="gds_stream_")
        os.symlink(os.path.abspath(events_dir),
                   os.path.join(staged, os.path.basename(events_dir)))
        events_dir = staged
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start_us"),
            "event_type", "n", "sum_value",
        )
    )
    q = (
        stream.writeStream.format("memory").queryName(query_name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(query_name)
