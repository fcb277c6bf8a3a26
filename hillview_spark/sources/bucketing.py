"""Bucketed table layout — the shuffle-free co-located join path.

At 100 TB the orders⋈lineitem shuffle dominates query cost. Writing
both fact tables bucketed (and sorted) by the join key pins matching
keys to matching files, so Spark executes the join with ZERO
exchanges: each task reads bucket i of both sides and joins locally.
This is the Spark-native equivalent of the reference's fixed
worker-sharded table placement (Hillview keeps a table's shards
resident on fixed workers and ships queries to data;
platform/.../dataset/remoting distributes over those shards).

Usage (once, at ingest):
    bucket_table(orders, "orders_b", ["o_orderkey"], 64)
    bucket_table(lineitem, "lineitem_b", ["l_orderkey"], 64)
then any equi-join between them on the bucket key is exchange-free
(assert with plans.explain / joins_without_shuffle below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucket_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (+sorted) managed parquet table.
    num_buckets should be sized so one bucket of the largest table
    fits an executor's memory at the target scale."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def joins_without_shuffle(joined: DataFrame) -> bool:
    """True if the join plan contains no shuffle exchange — the
    co-located bucket join succeeded. Delegates to the ONE counting
    rule in plans/explain.py (every shuffle flavor counts;
    BroadcastExchange and ReusedExchange are exempt — a reused
    broadcast is no data movement, and counting it here used to
    misreport a shuffle-free plan)."""
    from hillview_spark.plans.explain import count_shuffles

    return count_shuffles(joined) == 0
