"""Measure the 100x shuffle tail against a bucketed layout
(VERDICT-r9 #7): q21/q9 were the worst scalers at the r9 key-shifted
replica (~16x at 100x data — the lineitem⋈orders fact-fact shuffle).
This probe builds a key-shifted Nx replica of lineitem/orders, writes
it twice — plain parquet and bucketed-by-orderkey managed tables
(sources/bucketing.py) — and interleaves q21/q9 over both layouts in
ONE session, printing medians and per-plan shuffle counts.

Usage: python tools/ab_bucketed_tpch.py [sf_dir] [factor] [repeats]
Replica + warehouse land under ./spark-warehouse and
./.scale_probe (both gitignored).
"""

from __future__ import annotations

import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hillview_spark import session, tables  # noqa: E402
from hillview_spark.plans.explain import count_shuffles  # noqa: E402
from hillview_spark.queries import tpch  # noqa: E402
from hillview_spark.sources import bucketing  # noqa: E402

KEYSPAN = 50_000_000  # > any sf0.1 orderkey; keeps replicas disjoint


def build_replica(spark, sf_dir: str, factor: int, out_dir: str):
    li = tables.load_table(spark, sf_dir, "lineitem")
    od = tables.load_table(spark, sf_dir, "orders")
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * KEYSPAN))
        for i in range(factor)
    ]
    od_parts = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * KEYSPAN))
        for i in range(factor)
    ]
    big_li, big_od = li_parts[0], od_parts[0]
    for p in li_parts[1:]:
        big_li = big_li.unionAll(p)
    for p in od_parts[1:]:
        big_od = big_od.unionAll(p)
    big_li.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    big_od.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    buckets = 32
    out_dir = ".scale_probe"
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # Model the 100-TB regime: at real scale orders is far past ANY
    # broadcast threshold, but at a local 10x replica it still fits
    # 64 MiB and Catalyst broadcasts the fact-fact join away (plan
    # checked: BroadcastHashJoin on o_orderkey) — which would make
    # this probe measure nothing. Auto-broadcast off; the DIMENSION
    # joins keep their explicit F.broadcast() hints (supplier/part/
    # nation), exactly like a production cluster where only the dims
    # fit.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    build_replica(spark, sf_dir, factor, out_dir)
    plain_li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
    plain_od = spark.read.parquet(f"{out_dir}/orders.parquet")
    print(f"replica rows: lineitem={plain_li.count()}, orders={plain_od.count()}")

    # bucketed layout: both facts bucketed+sorted by the join key —
    # the one-time ingest cost that deletes the per-query shuffle
    t0 = time.perf_counter()
    bucketing.bucket_table(plain_li, "li_b", ["l_orderkey"], buckets)
    bucketing.bucket_table(plain_od, "od_b", ["o_orderkey"], buckets)
    print(f"bucket ingest: {time.perf_counter() - t0:.1f}s ({buckets} buckets)")
    buck_li = bucketing.read_bucketed(spark, "li_b")
    buck_od = bucketing.read_bucketed(spark, "od_b")

    sup = tables.load_table(spark, sf_dir, "supplier")
    part = tables.load_table(spark, sf_dir, "part")
    nation = tables.load_table(spark, sf_dir, "nation")

    variants = {
        "q21_plain": lambda: tpch.q21_suppliers_kept_waiting(
            sup, plain_li, plain_od),
        "q21_bucketed": lambda: tpch.q21_suppliers_kept_waiting(
            sup, buck_li, buck_od),
        "q9_plain": lambda: tpch.q9_product_type_profit(
            part, sup, plain_li, plain_od, nation),
        "q9_bucketed": lambda: tpch.q9_product_type_profit(
            part, sup, buck_li, buck_od, nation),
    }
    for name, fn in variants.items():
        print(f"{name}: shuffles={count_shuffles(fn())}")
    # value check: layouts must agree
    for q in ("q21", "q9"):
        a = sorted(map(tuple, variants[f"{q}_plain"]().collect()))
        b = sorted(map(tuple, variants[f"{q}_bucketed"]().collect()))
        print(f"{q}: values match = {a == b} ({len(a)} rows)")

    times = {k: [] for k in variants}
    order = list(variants)
    for i in range(repeats):
        for k in order if i % 2 == 0 else reversed(order):
            t0 = time.perf_counter()
            variants[k]().collect()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"{k}: median={ts[len(ts) // 2]:.3f}s "
              f"all={[round(x, 3) for x in ts]}")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
