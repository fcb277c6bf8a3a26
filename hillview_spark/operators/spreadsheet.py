"""The spreadsheet view: next-K rows under a sort order, and find.

Reference semantics:
- sketches/NextKSketch.java:46 — given a sort order and an optional
  start row, return the next K *distinct* rows (on the sort columns)
  with the count of occurrences of each (NextKList). This is what
  makes Hillview a "spreadsheet": scrolling = repeated next_k.
- sketches/FindSketch.java — find rows matching a string predicate
  at-or-after a position in the sort order.

Spark-first: next_k is groupBy(sort cols) → count → ORDER BY LIMIT K,
which Spark executes as partial agg + TakeOrderedAndProject: each
partition keeps a K-row heap and the driver merges — no global sort
shuffle. That is precisely NextKSketch's per-partition top-K merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hillview_spark import numeric


def _reference_order(sort_cols: list[str], ascending: list[bool]) -> list[Column]:
    """Hillview's record order treats a missing value as GREATER than
    every present value (IDoubleColumn.java:70-78 `iMissing → return 1`;
    Converters.compareStrings, utils/Converters.java:140-150), so NULL
    sorts LAST ascending and FIRST descending — the opposite of Spark's
    asc()/desc() defaults. Every spreadsheet surface must use this."""
    return [
        F.col(c).asc_nulls_last() if asc else F.col(c).desc_nulls_first()
        for c, asc in zip(sort_cols, ascending)
    ]


def _after_start(
    sort_cols: list[str], ascending: list[bool], start: tuple,
    inclusive: bool,
) -> Column:
    """Lexicographic 'row at-or-after start' predicate over the sort
    order (RowComparisonFilterDescription — shared with the filter
    API). The reference's paging is INCLUSIVE of the anchor row:
    NextKSketch.java:100-103 keeps rows with
    `topRow.compareTo(row) <= 0`, so the UI's topRow reappears as the
    first row of the next page (the scroll anchor). inclusive=False
    gives the strictly-after variant for callers composing their own
    pagination."""
    from hillview_spark.operators.filters import row_comparison_filter

    op = ">=" if inclusive else ">"
    return row_comparison_filter(sort_cols, start, op, ascending)


def next_k(
    df: DataFrame,
    sort_cols: list[str],
    k: int = 20,
    ascending: list[bool] | None = None,
    start: tuple | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """NextKList: the next k distinct sort-key rows at-or-after
    `start` (inclusive anchor, reference semantics — see
    _after_start), each with its duplicate count."""
    if ascending is None:
        ascending = [True] * len(sort_cols)
    if start is not None:
        df = df.where(_after_start(sort_cols, ascending, start, inclusive))
    order = _reference_order(sort_cols, ascending)
    return (
        df.groupBy(*sort_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(*order)
        .limit(k)
    )


def next_k_aggregate(
    df: DataFrame,
    sort_cols: list[str],
    agg_specs: list[tuple[str, str]],
    k: int = 20,
    ascending: list[bool] | None = None,
    start: tuple | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """NextKSketchAggregate (sketches/NextKSketchAggregate.java): the
    spreadsheet view with aggregated numeric columns per distinct
    sort key — each visible row also shows sum/min/max/avg of chosen
    columns over its duplicates. agg_specs: [(col, 'sum'|'min'|'max'|
    'avg'), ...]. Sums go through DECIMAL for order-independence."""
    if ascending is None:
        ascending = [True] * len(sort_cols)
    if start is not None:
        df = df.where(_after_start(sort_cols, ascending, start, inclusive))
    aggs = [F.count(F.lit(1)).alias("cnt")]
    # present = FINITE for float/double aggregate columns (the
    # engine-wide rule, hillview_spark.numeric): explicit, rather
    # than leaning on the non-ANSI NaN->decimal->NULL cast
    # accident — under ANSI the cast would make one NaN row
    # job-fatal, and ±Inf would poison the sums either way. One
    # schema fetch for the whole agg list.
    fin = numeric.finite_values(df, [c for c, _ in agg_specs])
    for c, how in agg_specs:
        name = f"{how}_{c}"
        vc = fin[c]
        # decimal(28,4): 24 integer digits, so epoch-nanos-scale
        # values don't hit ANSI NUMERIC_VALUE_OUT_OF_RANGE the way
        # (18,4) did; still lossless for 4-decimal data and
        # order-independent across engines
        if how == "sum":
            aggs.append(
                F.sum(vc.cast("decimal(28,4)")).cast("double").alias(name)
            )
        elif how == "avg":
            # SQL AVG semantics: null-skipping sum over NON-NULL count
            # (dividing by the group row count biased groups with
            # missing values low)
            aggs.append(
                F.round(
                    F.sum(vc.cast("decimal(28,4)")).cast("double")
                    / F.count(vc),
                    6,
                ).alias(name)
            )
        elif how in ("min", "max"):
            aggs.append(getattr(F, how)(vc).alias(name))
        else:
            raise ValueError(f"unknown aggregate: {how}")
    order = _reference_order(sort_cols, ascending)
    return df.groupBy(*sort_cols).agg(*aggs).orderBy(*order).limit(k)


def next_k_list(
    df: DataFrame,
    sort_cols: list[str],
    k: int = 20,
    ascending: list[bool] | None = None,
    start: tuple | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """The COMPLETE NextKList (sketches/results/NextKList.java:21-48):
    the next-k page plus `start_position` (the anchor's row number —
    rows strictly before topRow in the record order, the reference's
    `position++` branch at NextKSketch.java:104) and `rows_scanned`
    (total rows the sketch saw), which power the UI scrollbar
    thumb/extent. Both are one broadcast 1-row aggregate riding along
    on every page row — a second scan, no extra shuffle on the page
    (same trade as dp_next_k's noisy_rows_scanned)."""
    from hillview_spark.operators.filters import row_comparison_filter

    if ascending is None:
        ascending = [True] * len(sort_cols)
    page = next_k(df, sort_cols, k, ascending, start, inclusive)
    if start is None:
        before = F.lit(False)
    else:
        # start_position = rows before the FIRST PAGE ROW. Inclusive
        # paging starts AT the anchor (rows strictly before it);
        # exclusive paging starts strictly AFTER the anchor group, so
        # the anchor group's own rows count too — a strict '<' there
        # undercounts by the anchor key's multiplicity (r10 review:
        # arbitrarily large on heavy duplicate keys).
        op = "<" if inclusive else "<="
        before = row_comparison_filter(sort_cols, start, op, ascending)
    stats = df.agg(
        F.count(F.when(before, F.lit(1))).alias("start_position"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    # LEFT join from the 1-row stats side (ADVICE r8): an anchor past
    # the last group yields an EMPTY page, but the reference NextKList
    # still reports start_position/rows_scanned with an empty rows
    # table — so one all-NULL page row carrying the stats survives.
    # The page (<= k rows) is the broadcast side; same BNLJ cost as
    # the old crossJoin.
    return stats.join(F.broadcast(page), F.lit(True), "left").select(
        *page.columns, "start_position", "rows_scanned"
    )


def find_rows(
    df: DataFrame,
    col: str,
    pattern: str,
    mode: str = "substring",
    case_sensitive: bool = False,
) -> DataFrame:
    """FindSketch's count surface: total matching rows (powers the
    UI's 'n matches'). mode: substring | regex | exact | prefix —
    mirrors StringFilterDescription's kinds. The full Result (first
    matching row + before/at/after counts) is find_first."""
    from hillview_spark.operators.filters import string_filter

    pred = string_filter(col, pattern, mode=mode, case_sensitive=case_sensitive)
    return df.where(pred).agg(F.count(F.lit(1)).alias("match_count"))


def find_first(
    df: DataFrame,
    col: str,
    pattern: str,
    sort_cols: list[str],
    mode: str = "substring",
    case_sensitive: bool = False,
    ascending: list[bool] | None = None,
    start: tuple | None = None,
    exclude_start: bool = False,
    forward: bool = True,
) -> DataFrame:
    """The COMPLETE FindSketch Result (sketches/FindSketch.java:
    21-45, create() at :147-201): given a string filter, a record
    order, and an anchor row, return ONE row with
    `before` (matching rows strictly before the anchor — or at it,
    when excluded), `at` (rows equal on the sort schema to the FIRST
    match at-or-after the anchor — the row the UI scrolls to),
    `after` (matches past that first match), and the first match's
    sort-key values as first_<col> columns (NULL when no match).
    forward=False is the reference's next=false: search UP — the
    record order reverses, the anchor is always excluded
    (FindSketch.java:144), and before/after swap back at the end so
    they stay oriented in the ORIGINAL order.

    Scale shape: one scan for the filtered counts, a 1-row
    TakeOrderedAndProject for the first match, broadcast back — no
    shuffle proportional to matches."""
    from hillview_spark.operators.filters import (
        row_comparison_filter,
        string_filter,
    )

    if ascending is None:
        ascending = [True] * len(sort_cols)
    if not forward:
        if start is None:
            raise ValueError("find_first(forward=False) requires a start row")
        ascending = [not a for a in ascending]
        exclude_start = True
    matches = df.where(
        string_filter(col, pattern, mode=mode, case_sensitive=case_sensitive)
    ).select(*sort_cols)
    if start is None:
        before_pred = F.lit(False)
        cand = matches
    else:
        # complementary predicates (NOT a negation: ~(NULL) would
        # silently drop NULL-key rows from both sides — the explicit
        # at-or-after branch keeps missing-sorts-last rows candidates)
        before_pred = row_comparison_filter(
            sort_cols, start, "<=" if exclude_start else "<", ascending
        )
        cand = matches.where(
            row_comparison_filter(
                sort_cols, start, ">" if exclude_start else ">=", ascending
            )
        )
    # the first match as a GLOBAL AGGREGATE over the 1-row limit:
    # exactly one output row even when there are no candidates (NULL
    # firsts), so the final crossJoin never loses the counts row
    first = (
        cand.orderBy(*_reference_order(sort_cols, ascending))
        .limit(1)
        .agg(*[F.first(F.col(c)).alias(f"first_{c}") for c in sort_cols])
    )
    eq_first = F.lit(True)
    for c in sort_cols:
        eq_first = eq_first & F.col(c).eqNullSafe(F.col(f"first_{c}"))
    counts = matches.agg(
        F.count(F.when(before_pred, F.lit(1))).alias("before")
    )
    at_after = cand.crossJoin(F.broadcast(first)).agg(
        F.count(F.when(eq_first, F.lit(1))).alias("at"),
        F.count(F.when(~eq_first, F.lit(1))).alias("after"),
    )
    row = counts.crossJoin(F.broadcast(at_after)).crossJoin(
        F.broadcast(first)
    )
    if not forward:
        # re-orient the counts in the ORIGINAL order
        # (FindSketch.java:195-199 swaps before/after back)
        return row.select(
            F.col("after").alias("before"),
            F.col("at"),
            F.col("before").alias("after"),
            *[F.col(f"first_{c}") for c in sort_cols],
        )
    return row.select(
        "before", "at", "after", *[F.col(f"first_{c}") for c in sort_cols]
    )
