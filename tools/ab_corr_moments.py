"""One-off A/B: guarded covar/stddev corr (r9) vs regr_* central-moment
corr (r10 candidate) vs builtin F.corr, interleaved in ONE session.

Usage: python tools/ab_corr_moments.py [sf_dir] [repeats]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hillview_spark import numeric, session, tables  # noqa: E402

COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _finv(df, c):
    return numeric.finite_value(df, c).alias(c)


def safe_corr_r9(a, b):
    a, b = F.col(a), F.col(b)
    both = a.isNotNull() & b.isNotNull()
    ax, bx = F.when(both, a), F.when(both, b)
    den = F.stddev_samp(ax) * F.stddev_samp(bx)
    return F.when(den > 0, F.covar_samp(ax, bx) / den)


def safe_corr_regr(a, b):
    a, b = F.col(a), F.col(b)
    den = F.sqrt(F.regr_sxx(b, a) * F.regr_syy(b, a))
    return F.when(den > 0, F.regr_sxy(b, a) / den)


def matrix_sums(df, ndigits=4):
    """Raw-sums decomposition: 6 simple sums per pair, arithmetic
    finalization. xy is NULL when either side is (pairwise deletion
    for free); x-over-both = x + 0*y."""
    proj = df.select(*[F.col(c).cast("double").alias(c) for c in COLS])
    proj = proj.select(*[_finv(proj, c) for c in COLS])
    aggs = []
    for i, a in enumerate(COLS):
        for b in COLS[i:]:
            x, y = F.col(a), F.col(b)
            xb, yb = x + 0 * y, y + 0 * x
            n = F.count(x * y).cast("double")
            sx, sy = F.sum(xb), F.sum(yb)
            sxx, syy = F.sum(xb * xb), F.sum(yb * yb)
            sxy = F.sum(x * y)
            num = n * sxy - sx * sy
            den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            aggs.append(F.round(F.when(den > 0, num / den), ndigits).alias(f"{a}|{b}"))
    return proj.agg(*aggs)


def matrix(df, corr_fn, ndigits=4):
    proj = df.select(*[_finv(df, c) for c in COLS])
    aggs = [
        F.round(corr_fn(a, b), ndigits).alias(f"{a}|{b}")
        for i, a in enumerate(COLS)
        for b in COLS[i:]
    ]
    return proj.agg(*aggs)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    li = tables.load_table(spark, sf_dir, "lineitem")

    variants = {
        "r9_guarded": lambda: matrix(li, safe_corr_r9),
        "r10_regr": lambda: matrix(li, safe_corr_regr),
        "r10_sums": lambda: matrix_sums(li),
        "builtin": lambda: matrix(li, lambda a, b: F.corr(a, b)),
    }
    # value check first
    vals = {k: v().collect()[0].asDict() for k, v in variants.items()}
    keys = sorted(vals["r9_guarded"])
    mismatch = [
        (k, vals["r9_guarded"][k], vals["r10_regr"][k])
        for k in keys
        if vals["r9_guarded"][k] != vals["r10_regr"][k]
    ]
    print("value mismatches r9 vs regr:", mismatch or "NONE")

    times = {k: [] for k in variants}
    order = list(variants)
    for i in range(repeats):
        for k in order if i % 2 == 0 else reversed(order):
            t0 = time.perf_counter()
            variants[k]().collect()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"{k}: median={ts[len(ts) // 2]:.3f}s all={[round(x, 3) for x in ts]}")


if __name__ == "__main__":
    main()
