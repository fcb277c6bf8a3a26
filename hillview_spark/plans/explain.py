"""Plan-inspection helpers: the 100-TB design contract, checkable.

These are assertions about physical-plan properties that the scale
design in SURVEY.md §4 depends on. tests/test_plans.py uses them;
they are also handy interactively while tuning a query:

    from hillview_spark.plans.explain import assert_pushdown
    assert_pushdown(df, ["l_shipdate"])   # raises if not pushed

Column matching is word-boundary exact — bare substring tests would
let a pushed `ts_ns` filter satisfy an assertion about `ts` (false
pass) and make a legitimately-kept `ts_ns` column fail a
"`ts` is pruned" check (false failure). Multi-scan (join) plans are
handled by checking EVERY scan section, not just the first.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Plan string with FULL scan metadata: Spark abbreviates every
    metadata entry to spark.sql.maxMetadataStringLength (default 100
    chars — lineitem's ReadSchema alone is longer), which silently
    blinded the pruning/pushdown assertions to anything past the
    cutoff (r10 review: a 12-column un-pruned read PASSED a pruning
    assertion because the forbidden column fell off the abbreviated
    string). Raise the bound for the render, restore it after."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


# every key FileScan prints on its single metadata line — used to cut
# a section at the start of the NEXT entry
_SCAN_META_KEYS = (
    "Batched:", "DataFilters:", "Format:", "Location:",
    "PartitionFilters:", "PushedFilters:", "ReadSchema:",
    "Bucketed:", "SelectedBucketsCount:",
)


def _sections(plan: str, header: str) -> list[str]:
    """The text of every `header` section in the plan — one per file
    scan (joins have several; asserting on [0] alone would check the
    wrong scan). FileScan prints ALL metadata on ONE line, so a
    section ends at the next metadata key, not at the line break
    (r10 review: splitting on newline alone made every
    PartitionFilters 'section' contain the PushedFilters and
    ReadSchema text that follows it — assert_partition_pruning
    false-passed on an unpartitioned scan whose filter was merely
    pushed)."""
    out = []
    for part in plan.split(header)[1:]:
        line = part.splitlines()[0]
        cut = len(line)
        for k in _SCAN_META_KEYS:
            if k != header:
                i = line.find(k)
                if i != -1 and i < cut:
                    cut = i
        out.append(line[:cut])
    return out


def _has_col(section: str, col: str) -> bool:
    """Word-boundary column match (identifier chars delimit)."""
    return re.search(rf"(?<![A-Za-z0-9_]){re.escape(col)}(?![A-Za-z0-9_])", section) is not None


def assert_pushdown(df: DataFrame, cols: list[str]) -> None:
    """Every col must appear in SOME parquet scan's PushedFilters."""
    plan = physical_plan(df)
    sections = _sections(plan, "PushedFilters:")
    if not sections:
        raise AssertionError("no PushedFilters section in plan:\n" + plan)
    missing = [
        c for c in cols if not any(_has_col(s, c) for s in sections)
    ]
    if missing:
        raise AssertionError(
            f"filters not pushed for {missing}: {sections}"
        )


def assert_column_pruning(
    df: DataFrame, expected: list[str], forbidden: list[str]
) -> None:
    """Some scan's ReadSchema must include each expected column, and
    NO scan's ReadSchema may include a forbidden one."""
    plan = physical_plan(df)
    sections = _sections(plan, "ReadSchema:")
    if not sections:
        raise AssertionError("no ReadSchema section in plan:\n" + plan)
    for c in expected:
        if not any(_has_col(s, c) for s in sections):
            raise AssertionError(
                f"column {c} missing from ReadSchema: {sections}"
            )
    for c in forbidden:
        if any(_has_col(s, c) for s in sections):
            raise AssertionError(f"column {c} not pruned: {sections}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"{bad} in plan:\n" + plan)


def assert_broadcast_joins(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(f"expected >= {at_least} broadcast joins, got {n}")


def assert_topk_not_global_sort(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "TakeOrderedAndProject" not in plan:
        raise AssertionError("no TakeOrderedAndProject (top-k) in plan:\n" + plan)


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """At most n shuffle exchanges — the scale contract for operators
    that promise 'no shuffle' (pure per-row projections) or 'one
    shuffle' (single aggregation). Counts EVERY shuffle Exchange
    flavor — hash, range, round-robin/rebalance, AND SinglePartition
    (a global collapse to one partition is the worst shuffle of all
    at 100 TB) — by counting 'Exchange ' nodes and exempting only
    BroadcastExchange, which moves data through the driver broadcast,
    not the shuffle service. ReusedExchange nodes are pointers to an
    exchange already counted — no second data movement."""
    got = count_shuffles(df)
    if got > n:
        raise AssertionError(
            f"expected <= {n} shuffles, got {got}:\n" + physical_plan(df)
        )


def count_shuffles(df: DataFrame) -> int:
    """Number of real shuffle exchanges in the executed plan — the
    ONE counting rule (also used by sources/bucketing.py): every
    'Exchange ' flavor counts except BroadcastExchange (driver
    broadcast, not the shuffle service) and ReusedExchange (a pointer
    to an exchange already counted — no second data movement)."""
    plan = physical_plan(df)
    return (
        plan.count("Exchange ")
        - plan.count("BroadcastExchange ")
        - plan.count("ReusedExchange ")
    )


def assert_partition_pruning(df: DataFrame, col: str) -> None:
    """Some scan must prune on a hive-style partition column (the
    PartitionFilters section of a partitioned parquet read)."""
    plan = physical_plan(df)
    sections = _sections(plan, "PartitionFilters:")
    if not sections:
        raise AssertionError("no PartitionFilters section in plan:\n" + plan)
    if not any(_has_col(s, col) for s in sections):
        raise AssertionError(f"{col} not in PartitionFilters: {sections}")
