"""Scale-probe the persisted-IVF and PQ search paths (VERDICT-r10
#7): the 10x/100x replica campaign covered 19 anchors but neither
ann_ivf_topk_indexed nor pq_topk. This probe builds a key-shifted Nx
replica of embeddings and measures, interleaved in ONE session:

- ivf_topk_indexed_exact over a persisted index built with Nx the
  cell count (cells grow with the corpus so per-cell size stays
  constant — the 100-TB operating rule), asserting that `cell`
  still reaches the scan as a PartitionFilter at the larger cell
  count (plans/explain.assert_partition_pruning, the honest r10
  assertion), and printing the scanned-fraction n_probe/n_cells.
- pq_topk_exact (the gate's decimal-exact twin) and pq_topk_blas
  (the vectorized scale path) over the replica — ADC is a linear
  scan of the codes, so the honest expectation is ~Nx, against the
  IVF curve which should stay ~flat.

Usage: python tools/scale_probe_ann.py [sf_dir] [factor] [repeats]
Scratch lands under ./.scale_probe_ann (gitignored).
"""

from __future__ import annotations

import shutil
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hillview_spark import session, tables  # noqa: E402
from hillview_spark.functions import similarity  # noqa: E402
from hillview_spark.plans.explain import assert_partition_pruning  # noqa: E402

KEYSPAN = 10_000_000


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_dir = ".scale_probe_ann"
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    emb = tables.load_table(spark, sf_dir, "embeddings")
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * KEYSPAN))
        for i in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionAll(p)
    big.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    big = spark.read.parquet(f"{out_dir}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).first().embedding
    print(f"replica rows: {big.count()} (factor {factor})")

    # --- IVF persisted index: cells scale with the corpus ------------
    cases = {
        "ivf_1x": (emb, 8, f"{out_dir}/ivf_1x"),
        f"ivf_{factor}x": (big, 8 * factor, f"{out_dir}/ivf_{factor}x"),
    }
    searches = {}
    for name, (frame, n_cells, path) in cases.items():
        t0 = time.perf_counter()
        similarity.ivf_write_index_exact(frame, path, n_cells=n_cells, stride=50)
        print(f"{name}: index build {time.perf_counter() - t0:.2f}s "
              f"({n_cells} cells)")
        searches[name] = lambda p=path: similarity.ivf_topk_indexed_exact(
            spark, p, qv, query_id=0, k=10, n_probe=3
        )
        res = searches[name]()
        assert_partition_pruning(res, "cell")
        print(f"{name}: PartitionFilters prune on `cell` OK "
              f"(scan fraction 3/{n_cells})")

    # --- IVF throughput sibling (kmeans + Arrow/BLAS scoring): the
    # actual 100-TB path; the exact twin above is the correctness
    # anchor. Same cells-scale-with-corpus rule.
    for name, (frame, n_cells, path) in {
        "ivf_blas_1x": (emb, 8, f"{out_dir}/ivf_blas_1x"),
        f"ivf_blas_{factor}x": (big, 8 * factor, f"{out_dir}/ivf_blas_{factor}x"),
    }.items():
        t0 = time.perf_counter()
        similarity.ivf_write_index(frame, path, n_cells=n_cells)
        print(f"{name}: index build {time.perf_counter() - t0:.2f}s "
              f"({n_cells} cells)")
        searches[name] = lambda p=path: similarity.ivf_topk_indexed(
            spark, p, qv, k=10, n_probe=3
        )
        assert_partition_pruning(searches[name](), "cell")
        print(f"{name}: PartitionFilters prune on `cell` OK")

    # --- PQ: exact twin + BLAS sibling over both scales --------------
    searches["pq_exact_1x"] = lambda: similarity.pq_topk_exact(
        emb, query_id=0, n_results=10, m=4, k=8, stride=50
    )
    searches[f"pq_exact_{factor}x"] = lambda: similarity.pq_topk_exact(
        big, query_id=0, n_results=10, m=4, k=8, stride=50
    )
    searches["pq_blas_1x"] = lambda: similarity.pq_topk_blas(
        emb, query_id=0, n_results=10, m=4, k=8, stride=50
    )
    searches[f"pq_blas_{factor}x"] = lambda: similarity.pq_topk_blas(
        big, query_id=0, n_results=10, m=4, k=8, stride=50
    )

    times = {k: [] for k in searches}
    order = list(searches)
    for i in range(repeats):
        for k in order if i % 2 == 0 else reversed(order):
            t0 = time.perf_counter()
            searches[k]().collect()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: median={statistics.median(ts):.3f}s "
              f"all={[round(x, 3) for x in sorted(ts)]}")

    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
