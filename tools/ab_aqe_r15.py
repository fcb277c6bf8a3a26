"""Interleaved A/B of the AQE coalescing policy (r15 opt round):

  a: spark.sql.adaptive.coalescePartitions.parallelismFirst=true
     (Spark's default; AQE keeps ~defaultParallelism post-shuffle
     partitions even when the data is tiny)
  b: parallelismFirst=false (the Spark tuning guide's recommended
     production value: coalesce to advisoryPartitionSizeInBytes,
     64 MB default, so tiny shuffles collapse to few tasks)

The conf is a runtime SQL conf, so both arms run in ONE warm
session, alternating a/b inside each repeat (the bench.run_ab
discipline) — box drift hits both arms equally. Representative
set: short floor-bound queries (q3, q16), heavy parallel aggregates
(dedup_simhash, col_stats), a window-heavy query (tfidf_top_terms),
and the best-scaling event queries (events_windows, range_join).

Usage: python tools/ab_aqe_r15.py [--repeats N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from hillview_spark import cache  # noqa: E402
from hillview_spark.session import get_spark  # noqa: E402
from hillview_spark.tables import load_all  # noqa: E402

NAMES = [
    "q3", "q16", "dedup_simhash", "col_stats", "tfidf_top_terms",
    "events_windows", "range_join", "repetition_stats",
]

CONF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main():
    args = sys.argv[1:]
    repeats = 5
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ab-aqe-r15", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_all(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    t["lineitem"].count()
    t["documents"].count()
    queries = bench.headline_queries(t)
    # untimed warm pass under BOTH conf arms
    for val in ("true", "false"):
        spark.conf.set(CONF, val)
        for n in NAMES:
            factory, how = queries[n]
            bench.materialize(factory(), how)
            cache.release_all()
    spark.conf.set(CONF, "true")
    for n in NAMES:
        factory, how = queries[n]
        a, b = [], []
        for _ in range(repeats):
            for val, bucket in (("true", a), ("false", b)):
                spark.conf.set(CONF, val)
                start = time.perf_counter()
                bench.materialize(factory(), how)
                bucket.append(time.perf_counter() - start)
                cache.release_all()
        spark.conf.set(CONF, "true")
        print(
            f"{n:20s} parallelismFirst=true {statistics.median(a):.3f}s"
            f"  false {statistics.median(b):.3f}s"
            f"  (a={[round(x, 3) for x in a]} b={[round(x, 3) for x in b]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
