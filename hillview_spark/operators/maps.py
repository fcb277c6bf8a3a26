"""Row-wise table transformations (Hillview 'maps').

Reference semantics (platform/src/main/java/org/hillview/maps/):
- ProjectMap.java — column projection.
- ConvertColumnMap.java — type conversion of a column.
- CreateColumnJSMap.java — computed column from a JavaScript UDF.
  Spark-first replacement: a SQL expression (Catalyst, codegen) —
  arbitrary Python via an Arrow-batched Pandas UDF only as the
  escape hatch (computed_column_pandas).
- CreateIntervalColumnMap.java — interval column from two numerics.
- RenameColumnMap.java / AppendOrReplaceColumnMap.java.
- ExtractValueFromKeyMap.java — pull a key's value out of a
  JSON-ish column.
- SetOperationMap.java — union / intersection / difference of two
  row sets (Hillview tracks row membership sets; on DataFrames the
  same semantics are the SQL set operators).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DataType


def project(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*cols)


def rename_column(df: DataFrame, old: str, new: str) -> DataFrame:
    return df.withColumnRenamed(old, new)


def convert_column(
    df: DataFrame, col: str, to_type: str, new_name: str | None = None
) -> DataFrame:
    """ConvertColumnMap: invalid input converts to NULL (try_cast),
    matching Hillview's missing-on-parse-failure — ANSI mode would
    otherwise fail the whole job on one bad cell."""
    out = new_name or col
    return df.withColumn(out, F.col(col).try_cast(to_type))


def computed_column(df: DataFrame, name: str, sql_expr: str) -> DataFrame:
    """CreateColumnJSMap, Spark-first: the computation is a SQL
    expression compiled by Catalyst into codegen — stays JVM-side."""
    return df.withColumn(name, F.expr(sql_expr))


def computed_column_pandas(
    df: DataFrame, name: str, fn: Callable[..., "pd.Series"], input_cols: list[str],
    return_type: "DataType | str" = "double",
) -> DataFrame:
    """Escape hatch for genuinely non-SQL logic: Arrow-batched Pandas
    UDF (vectorized; ~10-100x faster than row-at-a-time Python)."""
    udf = F.pandas_udf(fn, return_type)
    return df.withColumn(name, udf(*[F.col(c) for c in input_cols]))


def interval_column(df: DataFrame, name: str, start_col: str, end_col: str) -> DataFrame:
    """CreateIntervalColumnMap: Hillview's Interval kind is a (start,
    end) pair; struct<start,end> is the Spark-native encoding."""
    return df.withColumn(
        name,
        F.struct(F.col(start_col).alias("start"), F.col(end_col).alias("end")),
    )


def extract_json_value(
    df: DataFrame, json_col: str, key: str, name: str | None = None
) -> DataFrame:
    """ExtractValueFromKeyMap: get one key's value from a JSON column.
    get_json_object is JVM-side and null-safe on malformed input."""
    out = name or key
    return df.withColumn(out, F.get_json_object(F.col(json_col), f"$.{key}"))


def compare_columns(
    df: DataFrame, name: str, left: str, right: str, op: str = "=="
) -> DataFrame:
    """SetCompareColumnMap: boolean column from comparing two columns
    row-wise (null-safe equality for '==')."""
    lc, rc = F.col(left), F.col(right)
    ops = {
        "==": lc.eqNullSafe(rc),
        "!=": ~lc.eqNullSafe(rc),
        "<": lc < rc,
        "<=": lc <= rc,
        ">": lc > rc,
        ">=": lc >= rc,
    }
    if op not in ops:
        raise ValueError(f"unknown comparison op: {op}")
    return df.withColumn(name, ops[op])


def set_operation(a: DataFrame, b: DataFrame, op: str) -> DataFrame:
    """SetOperationMap over two row sets with identical schema.
    union keeps duplicates (bag union, Hillview's Union of
    membership sets over the same base table is disjoint anyway);
    intersect/except are set-semantic, matching row-set logic."""
    if op == "union":
        return a.unionByName(b)
    if op == "intersect":
        return a.intersect(b)
    if op == "except":
        # subtract = set-semantic EXCEPT, consistent with the
        # set-semantic intersect above and the row-set contract
        # (exceptAll would keep per-row multiplicities)
        return a.subtract(b)
    raise ValueError(f"unknown set operation: {op}")


def quantize_column(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    buckets: int,
    out_col: str | None = None,
) -> DataFrame:
    """Per-column quantization — the engine layer under Hillview's
    differentially-private views (table/QuantizedTable.java via
    sketches/highorder/QuantizedTableSketch.java:28): every value is
    snapped to the LEFT EDGE of its bucket in a fixed policy grid
    BEFORE any sketch sees it, so downstream aggregates can only
    observe quantized values (the DP noise layer then works on bucket
    counts). Pure Catalyst arithmetic in a fixed op order —
    bit-identical across engines. Out-of-range rule (r8, reference
    parity): FINITE values outside [lo, hi] quantize to MISSING —
    DoubleColumnQuantization.bucketIndex returns -1 there and the
    GroupBy guard drops it (GroupBySketch.java:78-80); the old edge
    clamp inflated the boundary buckets with rows the curator's grid
    never covered. value == hi stays in the last bucket
    (DoubleHistogramBuckets' closed max). NULL and non-finite (NaN,
    ±Inf) stay missing (NaN passes isNotNull and its clamped floor
    would silently land on the LOWEST bucket's left edge; missing is
    the only faithful reading of a non-value)."""
    if hi < lo:
        raise ValueError(f"quantize_column: hi {hi} < lo {lo}")
    width = (hi - lo) / buckets
    c = F.col(col).cast("double")
    # degenerate grid (lo == hi): the only in-range value IS lo —
    # index 0 directly; the division by a literal 0.0 width would be
    # job-fatal under ANSI (the recurring degenerate-fatality class,
    # r10 review; histogram._bucket_expr guards its mx == mn twin the
    # same way)
    if width == 0:
        idx = F.lit(0)
    else:
        idx = F.least(
            F.greatest(F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(buckets - 1),
        )
    # finite-only (NaN AND ±Inf are missing) + in-range-only; the two
    # strict comparisons are false for NaN too
    keep = (c >= F.lit(lo)) & (c <= F.lit(hi))
    q = F.when(keep, F.lit(lo) + idx * F.lit(width))
    return df.withColumn(out_col or col, q)


def string_boundary_pos(arr: Column, val: Column) -> Column:
    """1-based position of the greatest boundary <= val in the sorted
    literal array `arr` (0 when val precedes them all) — THE
    left-boundary search. quantize_string_column snaps with it and
    histogram.histogram_string_bounded buckets with it (r10: the two
    hand-maintained copies of this recipe could drift on a
    collation-corner fix, the same per-site-drift class r9 eliminated
    for the finite predicate)."""
    return F.size(F.filter(arr, lambda b: b <= val))


def quantize_string_column(
    df: DataFrame,
    col: str,
    boundaries: list[str],
    out_col: str | None = None,
    global_max: str | None = None,
) -> DataFrame:
    """String quantization: snap each value to the greatest boundary
    <= value (boundaries sorted ascending — the same left-boundary
    convention StringHistogramBuckets uses). Out-of-range rule (r8,
    StringColumnQuantization.roundDown:31-47): values BELOW the first
    boundary quantize to MISSING (the reference throws; one
    out-of-grid row must not kill a 100-TB job — the engine-wide
    quarantine — and its bucketIndex is -1/dropped anyway), values
    STRICTLY ABOVE the explicit `global_max` (when declared) quantize
    to MISSING too (StringColumnQuantization.outOfRange:49-55 is
    strictly-greater — they are out of range exactly like below-first;
    the pre-r10 snap to global_max erased the above-ceiling
    distinction, so a downstream DP histogram counted those rows into
    the last bucket on the quantized-session path while the
    schema-direct path excluded them), value == global_max snaps to
    global_max itself (in range, last leaf); NULL stays NULL."""
    if not boundaries:
        # the schema-driven path can feed an empty leftBoundaries
        # default — fail with the column name, not a bare IndexError
        # at plan-build (r10 review; histogram_string_bounded already
        # validates its twin precondition)
        raise ValueError(
            f"quantize_string_column({col!r}): boundaries must be "
            "non-empty (curator metadata missing leftBoundaries?)"
        )
    bs = sorted(boundaries)
    arr = F.array(*[F.lit(b) for b in bs])
    pos = string_boundary_pos(arr, F.col(col))
    q = F.when(F.col(col) >= F.lit(bs[0]), F.element_at(arr, pos))
    if global_max is not None:
        q = (
            F.when(F.col(col) > F.lit(global_max), F.lit(None).cast("string"))
            .when(F.col(col) == F.lit(global_max), F.lit(global_max))
            .otherwise(q)
        )
    return df.withColumn(out_col or col, q)
