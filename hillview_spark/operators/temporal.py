"""Temporal joins Spark lacks as built-ins: as-of join and
interval/range join. (Extension beyond the Hillview reference —
SURVEY.md §2.4; the brief's canonical "custom operator" examples.)

Both are expressed as compositions of existing DataFrame operators —
no UDF, no cartesian:

- as-of join: union the two sides tagged by origin, then one window
  per key carries the latest right-side payload forward; left rows
  read it. ONE shuffle on the join key, O(1) state per row — the
  merge-scan shape a time-series engine uses, expressed declaratively
  so Catalyst plans it.
- range join: equi-join on a coarse time bucket (intervals explode to
  the buckets they overlap) + residual BETWEEN filter. Turns the
  quadratic point-interval theta-join into an inverted-index join
  whose cost tracks actual overlaps; bucket_width trades replication
  against candidate precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Microsecond epoch from a TIMESTAMP_NTZ (cast-to-long would truncate
# to seconds; unix_micros would re-enter the session timezone).
_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the MOST RECENT right row (same key,
    right time <= left time, inclusive) — the classic as-of join.

    Output: all left columns plus ``<time_col><suffix>`` (the matched
    right row's time) and ``<c><suffix>`` for each requested right
    column; NULLs when no right row precedes the left row.

    Determinism: ties on (key, time) between left and right resolve
    inclusive (right visible to a left row at the same instant); if
    the right side can hold duplicate (key, time) rows, pre-aggregate
    it — the window otherwise picks an arbitrary one."""
    payload = F.struct(
        F.col(time_col).alias("__t"), *[F.col(c) for c in right_cols]
    )
    l = left.withColumn("__is_left", F.lit(1))
    r = right.select(
        *by_cols, time_col, payload.alias("__rpayload")
    ).withColumn("__is_left", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    # right (0) sorts before left (1) at equal times -> inclusive match
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(time_col, "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__rpayload", ignorenulls=True).over(w))
    out = matched.where(F.col("__is_left") == 1).select(
        *left.columns,
        F.col("__m.__t").alias(f"{time_col}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by_cols: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (start <= point <= end, plus optional equality keys) WITHOUT a
    nested-loop join: both sides get a coarse time-bucket key
    (intervals explode to every bucket they overlap), the join is an
    equi-join on (keys..., bucket), and the exact BETWEEN predicate
    filters residual candidates. Interval replication factor is
    ceil(duration / bucket_seconds) + 1 — size bucket_seconds near
    the typical interval length."""
    by_cols = by_cols or []
    width_us = bucket_seconds * 1_000_000
    p_us = F.expr(_EPOCH_US.format(c=point_col))
    s_us = F.expr(_EPOCH_US.format(c=start_col))
    e_us = F.expr(_EPOCH_US.format(c=end_col))
    p = points.withColumn("__bucket", (p_us / width_us).cast("long"))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence((s_us / width_us).cast("long"), (e_us / width_us).cast("long"))
        ),
    )
    joined = p.join(i, [*by_cols, "__bucket"]).where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__bucket")


def moving_aggregate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    n_preceding: int = 3,
) -> DataFrame:
    """Per-key moving window aggregates over event time: for each
    event, the rolling sum/avg/count of the last (n_preceding + 1)
    events of the same key. ONE shuffle on the key; within a
    partition the window is a single sort + linear scan (Spark's
    WindowExec), so cost is O(rows log run) regardless of window
    width. The rolling sum is decimal-exact (order-independent
    cross-engine); the average is one double division.

    The (ts, tiebreak) ordering makes frame contents deterministic
    under duplicate timestamps."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(-n_preceding, 0)
    )
    dec_v = F.col(value_col).cast("decimal(18,6)")
    return events.select(
        F.col(key_col),
        F.col(tiebreak_col),
        F.sum(dec_v).over(w).cast("double").alias("rolling_sum"),
        (F.sum(dec_v).over(w).cast("double") / F.count(F.lit(1)).over(w))
        .alias("rolling_avg"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )
