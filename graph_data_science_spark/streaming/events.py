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


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    query_name: str = "events_sessions",
    timeout: str = "none",
) -> DataFrame:
    """Streaming gap-based sessionization — the CUSTOM STATEFUL operator
    surface (``applyInPandasWithState`` / GroupState), the streaming twin of
    :func:`sessionize`.

    Per user, open-session state (start, last ts, count, value sum) lives in
    the state store; an arriving batch's events (sorted by ts in-group)
    extend the session or close it when the gap exceeds ``gap_minutes``.
    Emitted rows match :func:`sessionize`'s schema minus the per-user
    session index (a streaming operator cannot know final per-user
    ordinals; callers derive them downstream if needed).

    State bounding: in a CONTINUOUS deployment, pass
    ``timeout="processing"`` so idle sessions flush via
    ``GroupStateTimeout.ProcessingTimeTimeout`` (the per-key analog of the
    watermark). The default is no timeout because under
    ``trigger(availableNow)`` processing-time timeouts keep scheduling
    empty microbatches and the drain never terminates (measured: 50+ empty
    batches); for a bounded drain the open tails are simply withheld.

    Caveats: events are assumed near-ordered within the watermark. With
    ``availableNow`` over a static directory, sessions still OPEN at
    end-of-input are not emitted (their state is discarded when the query
    stops; in a continuous deployment the idle timeout flushes them) — the
    same append-mode caveat :func:`stream_windowed_counts` documents, and
    the batch :func:`sessionize` is the reconciliation truth.
    """
    import os
    import tempfile

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"stream_sessionize requires spark.sql.session.timeZone=UTC, got {tz!r}")
    if os.path.isfile(events_dir):
        staged = tempfile.mkdtemp(prefix="gds_stream_")
        os.symlink(os.path.abspath(events_dir),
                   os.path.join(staged, os.path.basename(events_dir)))
        events_dir = staged

    gap_us = int(gap_minutes) * 60_000_000
    use_timeout = timeout == "processing"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        sessions = []
        if state.hasTimedOut:
            if state.exists:
                st, en, n, val = state.get
                sessions.append((user_id, n, st, en, round(val, 6)))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"])
            if state.exists:
                st, en, n, val = state.get
            else:
                st = en = None
                n, val = 0, 0.0
            for ts, v in zip(rows["ts"], rows["value"]):
                t_us = int(ts.value // 1000)  # pandas ns → µs
                if st is None:
                    st, en, n, val = t_us, t_us, 1, float(v)
                elif t_us - en > gap_us:
                    sessions.append((user_id, n, st, en, round(val, 6)))
                    st, en, n, val = t_us, t_us, 1, float(v)
                else:
                    en, n, val = t_us, n + 1, val + float(v)
            if st is not None:
                state.update((st, en, n, val))
                if use_timeout:
                    state.setTimeoutDuration(60_000)  # 60 s idle → flush
        if sessions:
            yield pd.DataFrame(sessions, columns=[
                "user_id", "n_events", "t_start_us", "t_end_us", "total_value"])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=("user_id long, n_events long, t_start_us long, "
                              "t_end_us long, total_value double"),
            stateStructType=("t_start_us long, t_end_us long, n_events long, "
                             "total_value double"),
            outputMode="append",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                         if use_timeout else GroupStateTimeout.NoTimeout),
        )
    )
    q = (stream.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


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
