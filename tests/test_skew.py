"""Salting utilities: results must be identical to unsalted plans
while spreading hot keys across sub-groups."""

from pyspark.sql import functions as F

from hillview_spark.operators import skew


def test_salted_group_count_matches_plain(spark, tables):
    li = tables["lineitem"]
    plain = {
        tuple(r)[:-1]: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    salted = {
        tuple(r)[:-1]: r.cnt
        for r in skew.salted_group_count(li, ["l_returnflag"], salt=8).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    o = tables["orders"].select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").count().collect()
    )
    salted = (
        skew.salted_join(li, o, "l_orderkey", "o_orderkey", salt=4)
        .groupBy("o_orderpriority").count().collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
