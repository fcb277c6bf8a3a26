"""Bucketed co-located joins: the fact-fact join runs with zero
shuffle exchanges when both sides are bucketed on the join key."""

import pytest
from pyspark.sql import functions as F

from hillview_spark.sources import bucketing


@pytest.fixture(scope="module")
def bucketed(spark, tables):
    # conftest points spark.sql.warehouse.dir at a temp dir
    bucketing.bucket_table(
        tables["orders"], "orders_b", ["o_orderkey"], num_buckets=8
    )
    bucketing.bucket_table(
        tables["lineitem"], "lineitem_b", ["l_orderkey"], num_buckets=8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o = bucketing.read_bucketed(spark, "orders_b")
    li = bucketing.read_bucketed(spark, "lineitem_b")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # the join itself must not exchange either side
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert bucketing.joins_without_shuffle(
        li.join(o, li.l_orderkey == o.o_orderkey)
    )


def test_bucket_tpch_helper_drop_in(spark, tables):
    """bucket_tpch (r11, VERDICT-r10 #4) is a drop-in load_all
    replacement: facts come back bucketed (their orderkey equi-join
    is exchange-free), dims stay plain, and values match the plain
    layout."""
    t = bucketing.bucket_tpch(
        spark, "/root/testdata/sf0.001", buckets=8, prefix="tpch_b_test"
    )
    try:
        assert set(t) == set(tables)  # full table dict, not just facts
        assert bucketing.joins_without_shuffle(
            t["lineitem"].join(
                t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey
            )
        )
        a = (
            t["lineitem"]
            .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
            .groupBy("o_orderpriority").count().collect()
        )
        b = (
            tables["lineitem"]
            .join(
                tables["orders"],
                tables["lineitem"].l_orderkey == tables["orders"].o_orderkey,
            )
            .groupBy("o_orderpriority").count().collect()
        )
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        spark.sql("DROP TABLE IF EXISTS tpch_b_test_lineitem")
        spark.sql("DROP TABLE IF EXISTS tpch_b_test_orders")


def test_bucketed_join_matches_unbucketed(spark, tables, bucketed):
    o = bucketing.read_bucketed(spark, "orders_b")
    li = bucketing.read_bucketed(spark, "lineitem_b")
    a = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").count().collect()
    )
    b = (
        tables["lineitem"].join(
            tables["orders"],
            tables["lineitem"].l_orderkey == tables["orders"].o_orderkey,
        ).groupBy("o_orderpriority").count().collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
