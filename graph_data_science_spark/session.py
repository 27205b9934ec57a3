"""SparkSession factory tuned for the link-graph engine.

Local-mode testing uses ``local[N]``; production submits the same code with
``spark-submit --py-files`` on a multi-executor cluster (the configs below
are cluster-safe: AQE, Arrow, skew-join handling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graph-data-science-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults follow the scale guidance: AQE on (runtime coalesce + skew-join
    splitting), Arrow on (all pandas-UDF exchange is Arrow batches),
    UTC timezone (oracle comparability), shuffle partitions sized to cores
    in local mode rather than the 200 default.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # GC choice is measured per-shape (docs/SCALE_NOTES.md §3, §9):
        # round-1 measured G1 stalling supersteps 10-20 s vs ParallelGC;
        # round-2 re-measured after the Observation fold and found ParallelGC
        # full-GCs wandering 14→42 s on identical supersteps — override via
        # SPARK_GRAFT_GC while measuring on the target host
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # superstep joins: shuffle-hash beats sort-merge (no 10^7-row sorts
        # per iteration) and beats per-superstep rebroadcast of vertex state
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
