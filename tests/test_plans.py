"""Plan-shape tests: at 100 TB the *plan* is the product. These
assert the physical properties the scale design depends on —
pushdown reaching the parquet scan, broadcast joins for dims,
top-k instead of global sort, no cartesian products."""

from pyspark.sql import functions as F

from hillview_spark.operators import spreadsheet
from hillview_spark.queries import tpch


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, tables):
    plan = plan_of(tpch.q6_revenue_forecast(tables["lineitem"]))
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_column_pruning(spark, tables):
    plan = plan_of(tpch.q6_revenue_forecast(tables["lineitem"]))
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 referenced columns are read, not all 11
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in schema
    for col in ("l_orderkey", "l_returnflag", "l_tax", "l_partkey"):
        assert col not in schema


def test_q5_broadcasts_all_dimensions(spark, tables):
    plan = plan_of(
        tpch.q5_local_supplier(
            tables["customer"], tables["orders"], tables["lineitem"],
            tables["supplier"], tables["nation"], tables["region"],
        )
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_next_k_uses_topk_not_global_sort(spark, tables):
    plan = plan_of(
        spreadsheet.next_k(tables["lineitem"], ["l_returnflag", "l_linestatus"], k=5)
    )
    assert "TakeOrderedAndProject" in plan
    # no full sort-exchange of the aggregated relation
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_whole_stage_codegen_on_hot_path(spark, tables):
    df = tpch.q1_pricing_summary(tables["lineitem"])
    df.collect()  # finalize the adaptive plan so codegen stages appear
    plan = plan_of(df)
    # codegen stages render as "*(n) Operator" in the plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no row-python in the hot path


def test_dedup_join_is_equi_not_cartesian(spark, tables):
    from hillview_spark.functions import dedup

    plan = plan_of(dedup.minhash_lsh_pairs(tables["documents"], 16, 4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
