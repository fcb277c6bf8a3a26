"""Histogram sketches.

Reference semantics:
- 1-D numeric histogram + CDF:
  platform/src/main/java/org/hillview/sketches/HistogramSketch.java:27
- 2-D heatmap: sketches/Histogram2DSketch.java, HeatmapSketch.java
- 3-D/4-D trellis: sketches/Histogram3DSketch.java, Histogram4DSketch.java
- bucket kinds: sketches/results/DoubleHistogramBuckets.java,
  StringHistogramBuckets.java
- data range: sketches/DoubleDataRangeSketch.java

Spark-first design: the bucket index is computed with built-in
arithmetic on the scan (whole-stage codegen, no UDF), then a
groupBy on the small int key — the shuffle carries O(buckets)
rows after map-side partial aggregation, independent of table
size. Hillview returns *dense* bucket arrays including empty
buckets; we reproduce that by left-joining a generated bucket
spine (F.sequence → explode, a tiny local relation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

from hillview_spark import numeric


def _validate_stages(stages) -> None:
    """Eager validation for progressive operators: strictly increasing
    fractions in (0, 1], ending at exactly 1.0. Strictness rejects
    duplicate stages (a silently redundant identical job) and a 0.0
    stage (cnt/0.0 -> DIVIDE_BY_ZERO under ANSI). Called BEFORE the
    generator is constructed so a bad tuple raises at call time, not
    at first next()."""
    ss = list(stages)
    if not ss or ss != sorted(set(ss)) or ss[-1] != 1.0 or ss[0] <= 0.0:
        raise ValueError(
            "stages must be strictly increasing, in (0, 1], and end at 1.0"
        )


def _finite(df: DataFrame, col: str) -> Column:
    """Present-and-usable predicate: NOT NULL, and for float/double
    columns also FINITE. Spark orders NaN ABOVE every double, so a
    single NaN row would poison max() -> bucket width NaN ->
    floor((x-mn)/NaN) casts to bucket 0 for EVERY row — the whole
    histogram silently collapses; a single ±Inf row degenerates the
    range the same way (width Inf -> every finite value in bucket 0).
    Non-finite counts as missing, like Hillview's Double converters
    treat non-finite values. The two strict comparisons against the
    ±Inf literals are false for NaN as well, so one predicate shape
    covers both — and it is expressible identically in any SQL engine
    (the oracle uses isfinite())."""
    c = F.col(col)
    cond = c.isNotNull()
    if dict(df.dtypes).get(col) in ("double", "float"):
        cond = cond & numeric.finite_pred(c)
    return cond


def _range_of(df: DataFrame, col: str) -> DataFrame:
    """1-row (mn, mx) relation over the finite values of col."""
    c = F.when(_finite(df, col), F.col(col))
    return df.agg(F.min(c).alias("mn"), F.max(c).alias("mx"))


def data_range(df: DataFrame, col: str) -> DataFrame:
    """Min/max/count/missing of a column — one scan, tiny result.
    Mirrors DoubleDataRangeSketch."""
    fin = _finite(df, col)
    c = F.when(fin, F.col(col))
    # coalesce: COUNTS are 0 on an empty table (SUM over zero rows is
    # NULL) — a count has a value even when the data does not
    return df.agg(
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
        F.coalesce(F.sum(fin.cast("long")), F.lit(0)).alias("present_count"),
        F.coalesce(F.sum((~fin).cast("long")), F.lit(0)).alias("missing_count"),
    )


def data_range_interval(df: DataFrame, col: str) -> DataFrame:
    """Range of an interval column (struct<start,end>):
    sketches/results/IntervalDataRangeSketch.java — the minimum over
    starts and maximum over ends, plus presence counts. Flat output
    columns so results hash across engines.

    The engine-wide missing rule applies at the INTERVAL level (r9,
    aligning with data_range): an interval is present iff both
    endpoints are present and — for float/double endpoints — finite;
    otherwise the whole cell is missing: it contributes to
    missing_count and never to the extremes. Before r9 a single NaN
    endpoint leaked through as max_end (both engines agreed, but the
    contract didn't). The NaN/Inf checks dispatch on the endpoint
    dtype: interval_column is type-generic (date/timestamp/int
    intervals are legal) and isnan only accepts floats."""
    s, e = F.col(f"{col}.start"), F.col(f"{col}.end")

    def _fin(c: Column, dtype) -> Column:
        ok = c.isNotNull()
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            ok = ok & numeric.finite_pred(c)
        return ok

    fields = {f.name: f.dataType for f in df.schema[col].dataType.fields}
    valid = _fin(s, fields["start"]) & _fin(e, fields["end"])
    return df.agg(
        F.min(F.when(valid, s)).alias("min_start"),
        F.max(F.when(valid, e)).alias("max_end"),
        # coalesce: 0 (not NULL) on an empty table, like data_range
        F.coalesce(F.sum(valid.cast("long")), F.lit(0)).alias(
            "present_count"
        ),
        F.coalesce(F.sum((~valid).cast("long")), F.lit(0)).alias(
            "missing_count"
        ),
    )


def _bucket_expr(col: Column, mn: Column, mx: Column, buckets: int) -> Column:
    """Bucket index in [0, buckets): floor((x-mn)/w), max clamped into
    the last bucket (Hillview's DoubleHistogramBuckets puts max in the
    last bucket). NULL-safe: nulls stay null and drop out of groupBy.
    A constant column (mn == mx) maps everything to bucket 0 instead
    of dividing by a zero-width bucket."""
    w = (mx - mn) / F.lit(float(buckets))
    idx = F.floor((col - mn) / w)
    clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(buckets - 1)).cast("int")
    # explicit NULL guard: greatest/least SKIP nulls, so without it a
    # NULL x would silently land in bucket 0 instead of staying NULL
    return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(
        F.when(mx == mn, F.lit(0)).otherwise(clamped)
    )


def histogram1d(df: DataFrame, col: str, buckets: int = 40) -> DataFrame:
    """Dense 1-D histogram: (bucket, count) for every bucket in
    [0, buckets). Range discovered in the same job via a broadcast
    1-row aggregate (two scans total at worst; Catalyst reuses the
    cached relation when available)."""
    rng = _range_of(df, col)
    return _histogram_counts(df, col, buckets, rng)


def _histogram_counts(
    df: DataFrame, col: str, buckets: int, rng: DataFrame
) -> DataFrame:
    """Dense bucket counts against a caller-supplied 1-row range
    relation (mn, mx). Factored out so progressive stages share one
    set of bucket boundaries."""
    src = df.select(F.col(col).alias("x")).where(_finite(df, col))
    counted = (
        src.crossJoin(F.broadcast(rng))
        .select(_bucket_expr(F.col("x"), F.col("mn"), F.col("mx"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = df.sparkSession.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    return (
        F.broadcast(spine)
        .join(counted, "bucket", "left")
        .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )


def progressive_histogram(
    df: DataFrame,
    col: str,
    buckets: int = 40,
    stages: tuple[float, ...] = (0.01, 0.1, 1.0),
    seed: int = 42,
):
    """Progressive partial results for a 1-D histogram.

    Hillview streams refining partial sketches to the UI while a scan
    runs (dataset/api/PartialResult.java:1, IncrementalTableSketch.java):
    the user sees a sample-based histogram in milliseconds that
    converges to exact. Spark's execution model delivers whole results,
    so the analogue is staged jobs: yield one small DataFrame per
    stage, each computed from a seeded Bernoulli sample of increasing
    fraction, the last from the full data (exact — bit-equal to
    histogram1d).

    Every stage shares ONE set of bucket boundaries (true min/max of
    the column — a cheap columnar scan that parquet statistics keep
    far below the cost of the count aggregation being refined), so
    stage results are directly comparable. Columns: stage, fraction,
    bucket, cnt (raw sample count), est_cnt (cnt/fraction — the
    refining estimate of the true count).

    At 100 TB each early stage reads the same partitions but the
    Bernoulli filter drops rows before the shuffle, so the stage cost
    is dominated by scan I/O; a 1% stage is appropriate for a first
    paint, and callers can stop consuming the generator once the
    estimate stabilizes (lazy: nothing runs until a stage is acted on).
    """
    _validate_stages(stages)
    rng = _range_of(df, col)

    def _gen():
        for i, frac in enumerate(stages):
            sampled = df if frac >= 1.0 else df.sample(fraction=frac, seed=seed)
            h = _histogram_counts(sampled, col, buckets, rng)
            yield h.select(
                F.lit(i).alias("stage"),
                F.lit(float(frac)).alias("fraction"),
                "bucket",
                "cnt",
                (F.col("cnt") / F.lit(float(frac))).alias("est_cnt"),
            )

    return _gen()


def progressive_histogram_final(
    df: DataFrame, col: str, buckets: int = 40
) -> DataFrame:
    """The terminal (exact) stage of progressive_histogram — the
    oracle-checkable anchor: fraction 1.0, cnt == histogram1d, est_cnt
    == cnt."""
    *_, last = progressive_histogram(df, col, buckets, stages=(0.1, 1.0))
    return last


def cdf(df: DataFrame, col: str, buckets: int = 100) -> DataFrame:
    """Cumulative distribution over histogram buckets (Hillview draws
    CDFs from a fine-grained histogram — HistogramSketch with a CDF
    flag). Running sum over O(buckets) rows: the window is driver-
    trivial because the input is already tiny."""
    h = histogram1d(df, col, buckets)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return h.select("bucket", F.sum("cnt").over(w).alias("cum_cnt"))


def histogram_with_cdf(df: DataFrame, col: str, buckets: int = 100) -> DataFrame:
    """Histogram and its CDF from ONE aggregation
    (sketches/highorder/DataWithCDFSketch.java fuses the two so the
    UI gets both in a single round trip). The running sum runs over
    the already-tiny O(buckets) result, so the extra column is free."""
    h = histogram1d(df, col, buckets)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return h.select("bucket", "cnt", F.sum("cnt").over(w).alias("cum_cnt"))


def histogram2d(
    df: DataFrame, xcol: str, ycol: str, xbuckets: int = 25, ybuckets: int = 25
) -> DataFrame:
    """2-D heatmap counts. Shuffle is O(xbuckets*ybuckets). Sparse
    output (Hillview's heatmap result is dense but zero cells carry
    no information; the UI fills them — we keep the dense spine for
    the 1-D case and sparse here to bound result size at high
    resolutions)."""
    def fin_col(c):
        return F.when(_finite(df, c), F.col(c))

    rng = df.agg(
        F.min(fin_col(xcol)).alias("xmn"),
        F.max(fin_col(xcol)).alias("xmx"),
        F.min(fin_col(ycol)).alias("ymn"),
        F.max(fin_col(ycol)).alias("ymx"),
    )
    src = df.select(F.col(xcol).alias("x"), F.col(ycol).alias("y")).where(
        _finite(df, xcol) & _finite(df, ycol)
    )
    return (
        src.crossJoin(F.broadcast(rng))
        .select(
            _bucket_expr(F.col("x"), F.col("xmn"), F.col("xmx"), xbuckets).alias("xbucket"),
            _bucket_expr(F.col("y"), F.col("ymn"), F.col("ymx"), ybuckets).alias("ybucket"),
        )
        .groupBy("xbucket", "ybucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_nd(df: DataFrame, specs: list[tuple[str, int]]) -> DataFrame:
    """N-dimensional histogram (Hillview's 3-D/4-D trellis views:
    Histogram3DSketch/Histogram4DSketch nest Groups<>). specs =
    [(col, buckets), ...]; numeric columns are range-bucketed, string
    columns group by value (Hillview trellis splits on categorical
    values)."""
    dtypes = dict(df.dtypes)
    categorical = ("string", "boolean")

    def axis(c):
        # date/timestamp axes range-bucket on epoch seconds (Hillview
        # trellis supports date axes; a raw (col - mn) on dates makes
        # an interval and fails the division's analysis). NTZ/date go
        # through a timezone-free diff — cast('timestamp') would
        # re-enter the session timezone, whose DST jumps would shift
        # bucket spacing per-session (trunc_ntz documents the same
        # trap).
        if dtypes[c] in ("date", "timestamp_ntz"):
            return F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                f" CAST(`{c}` AS TIMESTAMP_NTZ))"
            )
        if dtypes[c] == "timestamp":
            return F.col(c).cast("long")
        return F.col(c)

    # NOT named `numeric`: that would shadow hillview_spark.numeric
    # for the rest of the function (r10 review)
    range_specs = [(c, b) for c, b in specs if dtypes[c] not in categorical]
    rng_aggs = []
    for c, _ in range_specs:
        # range over FINITE values only — a single NaN/±Inf would
        # otherwise poison the axis range and squash every row into
        # one bucket even though the rows themselves are filtered
        ax = F.when(_finite(df, c), axis(c))
        rng_aggs += [F.min(ax).alias(f"{c}_mn"), F.max(ax).alias(f"{c}_mx")]
    fin = None
    for c, _ in specs:
        cond = _finite(df, c)
        fin = cond if fin is None else fin & cond
    src = df.select([c for c, _ in specs]).where(fin)
    if rng_aggs:
        src = src.crossJoin(F.broadcast(df.agg(*rng_aggs)))
    outs = []
    for c, b in specs:
        if dtypes[c] in categorical:
            outs.append(F.col(c).alias(f"{c}_bucket"))
        else:
            outs.append(
                _bucket_expr(
                    axis(c), F.col(f"{c}_mn"), F.col(f"{c}_mx"), b
                ).alias(f"{c}_bucket")
            )
    keys = [f"{c}_bucket" for c, _ in specs]
    return src.select(*outs).groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_string(df: DataFrame, col: str, max_buckets: int = 100) -> DataFrame:
    """String histogram. Hillview's StringHistogramBuckets uses sorted
    boundary strings when cardinality exceeds the bucket budget; for
    low-cardinality columns it is exact per-value counts. We implement
    the exact path (groupBy value) — the boundary path is
    histogram_string_bounded below."""
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_string_bounded(
    df: DataFrame, col: str, boundaries: list[str],
    max_value: str | None = None,
) -> DataFrame:
    """Explicit-boundary string histogram (StringHistogramBuckets /
    ExplicitHistogramBuckets.indexOf, results/
    ExplicitHistogramBuckets.java:51-74): bucket i covers
    [boundaries[i], boundaries[i+1]); values below boundaries[0] are
    excluded (the reference's -1), values >= the last boundary land
    in the last bucket, and — when the explicit `max_value` is given
    (the 3-arg constructor) — values strictly ABOVE it land in an
    OVERFLOW bucket indexed len(boundaries), checked before the
    last-bucket rule as in the reference. Computed as the count of
    boundaries <= value over a broadcast literal array — JVM-side,
    O(B) per row, no shuffle beyond O(B) groups.

    Ordering note: comparisons use Spark's binary string order
    (UTF-8 bytes = code-point order); Java's String.compareTo orders
    by UTF-16 units, which disagrees only between supplementary-plane
    characters and U+E000..U+FFFF — boundary strings in that corner
    would bucket differently than the reference."""
    from hillview_spark.operators.maps import string_boundary_pos

    if not boundaries:
        raise ValueError("histogram_string_bounded needs >= 1 boundary")
    bs = sorted(boundaries)
    barr = F.array(*[F.lit(b) for b in bs])
    val = F.col(col)
    # 0-based bucket from the ONE shared left-boundary search (maps
    # snaps with the same expression 1-based via element_at)
    idx = string_boundary_pos(barr, val) - F.lit(1)
    if max_value is not None:
        idx = F.when(val > F.lit(max_value), F.lit(len(bs))).otherwise(idx)
    return (
        df.where(val.isNotNull() & (val >= F.lit(bs[0])))
        .select(idx.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    xcol: str,
    xbuckets: int,
    ycol: str,
    probs: list[float],
    ndigits: int = 4,
) -> DataFrame:
    """Per-bucket quantile vector: bucket xcol as in histogram1d, then
    exact interpolated quantiles of ycol within each bucket (the
    whisker-plot view: sketches/Histogram2DQuantilesSketch.java,
    HistogramQuantilesSketch.java). One scan + groupBy on the small
    bucket key; percentile state is per-bucket and mergeable, so the
    shuffle stays O(xbuckets), not O(rows)."""
    rng = _range_of(df, xcol)
    src = df.select(F.col(xcol).alias("x"), F.col(ycol).alias("y")).where(
        _finite(df, xcol) & _finite(df, ycol)
    )
    from hillview_spark.operators.stats import _q_alias

    aggs = [F.count(F.lit(1)).alias("cnt")] + [
        F.round(F.expr(f"percentile(y, {p})"), ndigits).alias(_q_alias(p))
        for p in probs
    ]
    return (
        src.crossJoin(F.broadcast(rng))
        .select(
            _bucket_expr(F.col("x"), F.col("mn"), F.col("mx"), xbuckets).alias("bucket"),
            "y",
        )
        .groupBy("bucket")
        .agg(*aggs)
    )


def trunc_ntz(col: Column, unit: str) -> Column:
    """Calendar truncation that PRESERVES timestamp_ntz. Spark's
    date_trunc coerces NTZ through the session timezone (returns
    LTZ), which silently shifts wall-clock values when the session
    TZ isn't the writer's; field extraction + make_timestamp_ntz is
    timezone-free."""
    y, m, d = F.year(col), F.month(col), F.dayofmonth(col)
    h, mi, s = F.hour(col), F.minute(col), F.second(col)
    zero = F.lit(0)
    parts = {
        "year": (y, F.lit(1), F.lit(1), zero, zero, zero),
        "month": (y, m, F.lit(1), zero, zero, zero),
        "day": (y, m, d, zero, zero, zero),
        "hour": (y, m, d, h, zero, zero),
        "minute": (y, m, d, h, mi, zero),
        "second": (y, m, d, h, mi, s),
    }
    if unit not in parts:
        raise ValueError(f"unsupported truncation unit: {unit}")
    return F.make_timestamp_ntz(*parts[unit])


def histogram_date(df: DataFrame, col: str, unit: str = "month") -> DataFrame:
    """Date/time histogram by calendar unit (Hillview buckets
    date columns by regular intervals). Truncation is NTZ-preserving
    so results are independent of the session timezone."""
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(trunc_ntz(F.col(col), unit).alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_and_singleton(df: DataFrame, col: str, buckets: int = 40) -> DataFrame:
    """Histogram where each bucket also carries the unique value when
    the bucket holds exactly ONE row (HistogramAndSingletonSketch via
    results/CountAndSingleton.java:30 — the UI renders the exact
    point instead of a bar). min(x) doubles as the singleton carrier:
    with cnt = 1 the min IS the row's value, so no extra state."""
    rng = _range_of(df, col)
    src = df.select(F.col(col).alias("x")).where(_finite(df, col))
    counted = (
        src.crossJoin(F.broadcast(rng))
        .select(
            _bucket_expr(F.col("x"), F.col("mn"), F.col("mx"), buckets).alias(
                "bucket"
            ),
            "x",
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("x").alias("__mn"))
    )
    spine = df.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    return (
        F.broadcast(spine)
        .join(counted, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.when(F.col("cnt") == 1, F.col("__mn")).alias("singleton"),
        )
    )
