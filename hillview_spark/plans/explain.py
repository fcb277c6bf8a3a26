"""Plan-inspection helpers: the 100-TB design contract, checkable.

These are assertions about physical-plan properties that the scale
design in SURVEY.md §4 depends on. tests/test_plans.py uses them;
they are also handy interactively while tuning a query:

    from hillview_spark.plans.explain import assert_pushdown
    assert_pushdown(df, ["l_shipdate"])   # raises if not pushed
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_pushdown(df: DataFrame, cols: list[str]) -> None:
    """Every col must appear in the parquet scan's PushedFilters."""
    plan = physical_plan(df)
    if "PushedFilters:" not in plan:
        raise AssertionError("no PushedFilters section in plan:\n" + plan)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    missing = [c for c in cols if c not in pushed]
    if missing:
        raise AssertionError(f"filters not pushed for {missing}: {pushed}")


def assert_column_pruning(
    df: DataFrame, expected: list[str], forbidden: list[str]
) -> None:
    """The scan's ReadSchema must include expected and exclude
    forbidden columns."""
    plan = physical_plan(df)
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for c in expected:
        if c not in schema:
            raise AssertionError(f"column {c} missing from ReadSchema: {schema}")
    for c in forbidden:
        if c in schema:
            raise AssertionError(f"column {c} not pruned: {schema}")


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
    shuffle' (single aggregation). Counts every Exchange flavor:
    hash/range partitioning AND SinglePartition — a global collapse
    to one partition is the worst shuffle of all at 100 TB, so a
    'zero shuffle' assertion must fail on it too."""
    plan = physical_plan(df)
    got = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )
    if got > n:
        raise AssertionError(f"expected <= {n} shuffles, got {got}:\n" + plan)


def assert_partition_pruning(df: DataFrame, col: str) -> None:
    """The scan must prune on a hive-style partition column (the
    PartitionFilters section of a partitioned parquet read)."""
    plan = physical_plan(df)
    if "PartitionFilters:" not in plan:
        raise AssertionError("no PartitionFilters section in plan:\n" + plan)
    sect = plan.split("PartitionFilters:")[1].splitlines()[0]
    if col not in sect:
        raise AssertionError(f"{col} not in PartitionFilters: {sect}")
