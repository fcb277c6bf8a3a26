"""SparkSession factory with scale-oriented defaults.

Defaults chosen for large clusters: AQE re-plans at runtime
(partition coalescing, skew-join splitting), Arrow for any
Python<->JVM transfer, and a generous broadcast threshold so
dimension tables (region/nation/supplier/part) never shuffle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hillview-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        # Runtime re-planning: coalesce tiny post-shuffle partitions,
        # split skewed join partitions. Essential at 100 TB.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow-batched transfer for the few Pandas-UDF paths.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Dimension tables at TPC-H-ish shape stay well under this;
        # broadcast instead of shuffling the fact table.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # The threshold above is an ESTIMATE on the build input; the
        # built HashedRelation is ~5x larger on the driver heap. With
        # Spark's 1g default driver heap, a build side near the 64 MiB
        # line OOMs the broadcast (seen at a 10x local scale replica,
        # r9) — pair the threshold with a driver heap that can hold a
        # few built relations. Only effective when this session boots
        # the JVM (local mode / spark-submit defaults can override).
        "spark.driver.memory": "6g",
        # Read-side parallelism: default 128 MiB splits.
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false",
        # Some sources write TIMESTAMP(NANOS) parquet, which Spark's
        # timestamp type (micros) cannot hold; read as long and let
        # tables.load_table surface micros + raw-nanos columns.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate silently IGNORES every config when a session already
    # exists (r11 session review). Most of the conf above is tuning,
    # but two keys are SEMANTIC — UTC pins the timestamp<->instant
    # mapping every oracle comparison assumes, and nanosAsLong is what
    # lets events.parquet load at all — so re-assert them on the
    # session we actually got (both are runtime-settable SQL confs;
    # a no-op when this call built the session).
    spark.conf.set(
        "spark.sql.session.timeZone", conf["spark.sql.session.timeZone"]
    )
    spark.conf.set(
        "spark.sql.legacy.parquet.nanosAsLong",
        conf["spark.sql.legacy.parquet.nanosAsLong"],
    )
    return spark
