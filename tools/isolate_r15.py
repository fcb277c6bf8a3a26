"""Isolate bench queries for the r15 optimization round: time a
subset of bench.headline_queries in ONE warm session with
median-of-N, exactly bench.py's methodology (warm pass first, noop/
collect materialization, cache release between queries).

Usage: python tools/isolate_r15.py <name> [name ...] [--repeats N]
       python tools/isolate_r15.py --all          # every bench query

Run on an otherwise-idle box (the README probe discipline).
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


def main():
    args = [a for a in sys.argv[1:]]
    repeats = 5
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="isolate-r15", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_all(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    t["lineitem"].count()
    t["documents"].count()
    queries = bench.headline_queries(t)
    names = list(queries) if "--all" in args else args
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown bench queries: {unknown}")
    # untimed warm pass over the selected queries
    for n in names:
        factory, how = queries[n]
        bench.materialize(factory(), how)
        cache.release_all()
    for n in names:
        factory, how = queries[n]
        samples = []
        for _ in range(repeats):
            start = time.perf_counter()
            bench.materialize(factory(), how)
            samples.append(time.perf_counter() - start)
        cache.release_all()
        print(f"{n}: median={statistics.median(samples):.3f}s "
              f"all={[round(s, 3) for s in samples]}")
    spark.stop()


if __name__ == "__main__":
    main()
