"""Event-stream analytics: windowed aggregation and sessionization,
in both batch form (oracle-checkable) and Structured Streaming form
(watermarks, incremental state).

Batch and stream share semantics: a tumbling window over event time.
The batch variant is what the DuckDB oracle verifies; the stream
variant is the same logical plan under ``readStream`` with a
watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def windowed_counts(events: DataFrame, unit: str = "hour") -> DataFrame:
    """Tumbling-window event counts and value sums per event type.
    events.value is exact to 6 decimals → DECIMAL sum is lossless and
    order-independent."""
    from hillview_spark.operators.histogram import trunc_ntz

    return (
        events.groupBy(
            trunc_ntz(F.col("ts"), unit).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    since the previous event exceeds gap_minutes. Two window passes
    over data partitioned by user — shuffle once on user_id, both
    windows reuse that partitioning (no second shuffle)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact, timezone-free gap (cast-to-long truncates to
    # seconds; unix_micros on NTZ would re-enter the session TZ).
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " ts)"
    )
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = events.select(
        "user_id", "ts", "event_id", F.sum(new_session).over(wcum).alias("session_id")
    )
    from hillview_spark.operators.histogram import trunc_ntz

    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        trunc_ntz(F.min("ts"), "second").alias("session_start"),
        trunc_ntz(F.max("ts"), "second").alias("session_end"),
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    schema,
    gap_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization
    with applyInPandasWithState. Per-user state carries the open
    session (start, last event time, count); a session is emitted
    when a gap larger than gap_minutes closes it (or state times
    out). This is the Structured Streaming twin of sessionize() —
    state is O(active users), not O(events).

    events_dir must be a directory (file-stream source requirement).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType,
    )

    gap_us = gap_minutes * 60 * 1_000_000

    out_type = StructType([
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ])
    state_type = StructType([
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("count", LongType()),
    ])

    def fn(key, pdfs, state: "GroupState"):
        user_id = key[0]
        (start_us, last_us, count) = state.get if state.exists else (None, None, 0)
        closed = []
        for pdf in pdfs:
            ts = pdf["ts"].sort_values()
            for t in ts:
                us = int(t.value // 1000)  # pandas ns -> us
                if last_us is None:
                    start_us, last_us, count = us, us, 1
                elif us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, count))
                    start_us, last_us, count = us, us, 1
                else:
                    last_us, count = us, count + 1
        state.update((start_us, last_us, count))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    stream = spark.readStream.schema(schema).parquet(events_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        # watermarks require TIMESTAMP (with-TZ); exact integer div
        stream = stream.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_type, state_type, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured Streaming variant: file stream → watermark →
    tumbling window counts. Late events beyond the watermark are
    dropped; state is bounded. Drive with
    .writeStream.trigger(availableNow=True) in tests.

    events_dir must be a DIRECTORY (Spark file-stream source
    requirement) — symlink single parquet files into a temp dir.
    """
    stream = spark.readStream.schema(schema).parquet(events_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        # watermarks require TIMESTAMP (with-TZ); exact integer div
        stream = stream.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
