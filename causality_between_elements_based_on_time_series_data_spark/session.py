"""SparkSession factory tuned for the test harness and for scale.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads, one
JVM).  The conf choices below are the ones that carry to a real
cluster: AQE on (runtime coalescing + skew-join handling), shuffle
partitions sized to parallelism rather than the 200 default, Arrow
enabled for the pandas-UDF slow path, and a pinned UTC session
timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a runtime SQL conf for the duration of a block, restoring
    (or unsetting) the prior value afterwards — for confs a *read* must
    see (the reader captures its hadoop conf at ``spark.read`` time)
    without leaving a session-wide mutation behind."""
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "causality-ts-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster only ``master`` changes; every other conf here is
    scale-portable.  ``spark.sql.shuffle.partitions`` should track
    cluster cores (AQE coalesces down when partitions run small).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start shuffles WIDE and let AQE coalesce down: with the
        # static partition count alone, a 100x volume jump makes
        # per-partition shuffle blocks outgrow memory and spill
        # (measured: q21 at x100 ran 2.5x faster at 256 partitions —
        # SCALE_r7.md finding 4).  initialPartitionNum is the
        # scale-portable knob — small queries still coalesce to few
        # partitions, big ones keep enough to stay in memory.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(8 * cpus),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # single configuration point for TIMESTAMP(NANOS) parquet scans
        # (events.ts); sources.catalog.load_table additionally scopes
        # the flag per-read so foreign sessions behave identically
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
