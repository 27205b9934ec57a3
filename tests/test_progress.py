"""gds.beta.listProgress surface (graph_data_science_spark/progress.py)."""

import threading
import time

from pyspark.sql import functions as F

from graph_data_science_spark import progress


def setup_function(_fn):
    progress.clear()


def test_track_lifecycle_and_listing():
    with progress.track("my_algo", total=10) as t:
        t.update(4)
        rows = progress.list_progress()
        assert rows[0]["task_name"] == "my_algo"
        assert rows[0]["status"] == "RUNNING"
        assert rows[0]["progress"] == "40.0%"
        assert rows[0]["progress_bar"] == "[####------]"
    rows = progress.list_progress()
    assert rows[0]["status"] == "FINISHED" and rows[0]["progress"] == "100.0%"
    assert progress.list_progress(include_finished=False) == []


def test_failed_task_marked():
    try:
        with progress.track("boom", total=2):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert progress.list_progress()[0]["status"] == "FAILED"


def test_unknown_volume_task():
    jid = progress.begin("open_ended")
    rows = progress.list_progress()
    assert rows[0]["progress"] == "n/a"
    progress.finish(jid)


def test_pregel_reports_progress(spark):
    from graph_data_science_spark.plans.pregel import ACTIVE_COL, Pregel

    driver = Pregel(spark, max_iterations=5,
                    manifest={"algorithm": "probe_algo"})
    state0 = spark.range(4).select(
        F.col("id").alias("node_id"), F.col("id").alias("x"),
        F.lit(1).cast("int").alias(ACTIVE_COL))

    def step(st, i):
        return st.select(
            "node_id", (F.col("x") + 1).alias("x"),
            F.when(F.col("x") < 2, 1).otherwise(0)
            .cast("int").alias(ACTIVE_COL))

    driver.run(state0, step)
    rows = [r for r in progress.list_progress()
            if r["task_name"] == "probe_algo"]
    assert rows and rows[0]["status"] == "FINISHED"
    assert rows[0]["volume_total"] == 5
    assert rows[0]["elapsed_seconds"] > 0


def test_live_listing_from_another_thread(spark):
    """The reference proc's point is listing a RUNNING job from another
    session — poll the registry while a Pregel run is in flight."""
    from graph_data_science_spark.plans.pregel import ACTIVE_COL, Pregel

    seen = []

    def poll():
        for _ in range(200):
            running = progress.list_progress(include_finished=False)
            if any(r["task_name"] == "slow_algo" for r in running):
                seen.append(running[0])
                return
            time.sleep(0.02)

    poller = threading.Thread(target=poll)
    poller.start()
    driver = Pregel(spark, max_iterations=3,
                    manifest={"algorithm": "slow_algo"})
    state0 = spark.range(64).select(
        F.col("id").alias("node_id"), F.col("id").alias("x"),
        F.lit(1).cast("int").alias(ACTIVE_COL))

    def step(st, i):
        return st.select(
            "node_id", (F.col("x") * 2 + 1).alias("x"),
            F.when(F.col("x") < 1000, 1).otherwise(0)
            .cast("int").alias(ACTIVE_COL))

    driver.run(state0, step)
    poller.join()
    assert seen and seen[0]["status"] == "RUNNING"


def test_list_progress_df_shape(spark):
    progress.begin("df_task", volume_total=3)
    df = progress.list_progress_df(spark)
    assert df.columns[:3] == ["job_id", "task_name", "status"]
    assert df.count() >= 1
