"""Watermark semantics: late events beyond the watermark are dropped
from windowed aggregation state. Drives a real two-trigger file
stream sharing one checkpoint — batch 2 arrives with timestamps far
older than the advanced watermark."""

import datetime as dt
import os

from pyspark.sql import functions as F

from hillview_spark.streaming import events as ev


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)
    base = dt.datetime(2024, 6, 1, 12, 0, 0)

    # batch 1: events at noon
    _write_events(
        spark, os.path.join(src, "b1"),
        [(1, base, 1, "click", 1.0), (2, base + dt.timedelta(minutes=5), 1, "click", 1.0)],
    )
    schema = spark.read.parquet(os.path.join(src, "b1")).schema

    def run_trigger():
        sdf = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(src, "*"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("ws"), "event_type", "n")
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_trigger()

    # batch 2: one fresh event 3h later (advances watermark and closes
    # old windows) and one late event 2h BEFORE batch 1 (beyond the 1h
    # watermark once batch 2's max event time is seen in batch 3).
    _write_events(
        spark, os.path.join(src, "b2"),
        [(3, base + dt.timedelta(hours=3), 1, "click", 1.0),
         (4, base - dt.timedelta(hours=2), 1, "late", 1.0)],
    )
    run_trigger()

    # batch 3: another fresh event plus another very-late one; by now
    # the watermark sits at (noon+3h) - 1h, so the noon-2h event must
    # NOT create a window.
    _write_events(
        spark, os.path.join(src, "b3"),
        [(5, base + dt.timedelta(hours=4), 1, "click", 1.0),
         (6, base - dt.timedelta(hours=2, minutes=5), 1, "late2", 1.0)],
    )
    run_trigger()

    got = spark.read.parquet(out_dir).collect()
    types = {r.event_type for r in got}
    # on-time windows were emitted once closed...
    assert "click" in types
    # ...the event that was 2h late in batch 3 (vs a 1h watermark) is gone
    assert "late2" not in types
