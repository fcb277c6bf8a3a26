"""Interleaved A/B/C probe for the simhash fingerprint aggregate
(r15 optimization round).

A (shipped r14): per bit j, sum(when((h>>j)&1 == 1, 1).otherwise(-1))
   — 60 conditional sums per token row.
B (branch-free): per bit j, sum((h>>j)&1) plus one count(*);
   sign(2*b_j - n) == sign(s_j) so the fingerprint is identical —
   same 60 buffers, no conditionals.
C (packed): 3 bit-counts packed per 64-bit long at 21-bit stride
   (20 sum buffers); b_j unpacked after the aggregate. Identical
   fingerprints while any doc has < 2^21 tokens — probe-only unless
   it wins AND the bound is acceptable.

Each variant is asserted to produce IDENTICAL (doc, fingerprint)
rows before timing. Timing: interleaved medians in one session,
noop sink, full simhash_pairs chain per variant.

Usage: python tools/ab_simhash_r15.py [repeats]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from hillview_spark import cache  # noqa: E402
from hillview_spark.session import get_spark  # noqa: E402
from hillview_spark.tables import load_all  # noqa: E402
from hillview_spark.functions.dedup import (  # noqa: E402
    SIMHASH_BITS, _token_hash, tokens,
)

BITS = SIMHASH_BITS


def _toks(df):
    return df.select(
        F.col("doc_id").alias("doc"),
        F.explode(tokens(F.col("text"))).alias("t"),
    ).withColumn("h", _token_hash(F.col("t")))


def simhash_a(df):
    toks = _toks(df)
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(BITS)
    ]
    sums = toks.groupBy("doc").agg(*bit_aggs)
    fp = None
    for j in range(BITS):
        term = F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    return sums.select("doc", fp.alias("fingerprint"))


def simhash_b(df):
    toks = _toks(df)
    bit_aggs = [
        F.sum(F.expr(f"(h >> {j}) & 1")).alias(f"b{j}") for j in range(BITS)
    ] + [F.count(F.lit(1)).alias("n")]
    sums = toks.groupBy("doc").agg(*bit_aggs)
    fp = None
    for j in range(BITS):
        term = F.when(
            F.col(f"b{j}") * 2 > F.col("n"), F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    return sums.select("doc", fp.alias("fingerprint"))


STRIDE = 21  # 3 counters per long, each good to 2^21 tokens/doc
PER = 3


def simhash_c(df):
    toks = _toks(df)
    n_packs = (BITS + PER - 1) // PER
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in range(n_packs):
        expr = None
        for k in range(PER):
            j = p * PER + k
            if j >= BITS:
                break
            term = F.expr(f"((h >> {j}) & 1) << {STRIDE * k}")
            expr = term if expr is None else expr + term
        aggs.append(F.sum(expr).alias(f"p{p}"))
    sums = toks.groupBy("doc").agg(*aggs)
    fp = None
    for j in range(BITS):
        p, k = divmod(j, PER)
        bj = F.expr(f"(p{p} >> {STRIDE * k}) & {(1 << STRIDE) - 1}")
        term = F.when(
            bj * 2 > F.col("n"), F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    return sums.select("doc", fp.alias("fingerprint"))


def simhash_d(df):
    """Two-level multiplicity collapse: groupBy(doc, h).count() first
    (1 cheap buffer per distinct token, dup tokens collapse map-side),
    then the 60 conditional sums weighted by the count run over
    DISTINCT tokens only. Integer arithmetic, so fingerprints are
    exactly variant a's. Re-measured r15 session 4 — the session-2
    measurement landed in a steal spike and was discarded."""
    toks = _toks(df)
    cnt = toks.groupBy("doc", "h").agg(F.count(F.lit(1)).alias("c"))
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, F.col("c")).otherwise(-F.col("c"))
        ).alias(f"s{j}")
        for j in range(BITS)
    ]
    sums = cnt.groupBy("doc").agg(*bit_aggs)
    fp = None
    for j in range(BITS):
        term = F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    return sums.select("doc", fp.alias("fingerprint"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(
        app_name="ab-simhash-r15", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_all(spark, "/root/testdata/sf0.1")
    docs = t["documents"]
    docs.count()

    all_variants = {
        "a": simhash_a, "b": simhash_b, "c": simhash_c, "d": simhash_d,
    }
    which = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else list(all_variants)
    )
    variants = {n: all_variants[n] for n in which}
    # identity check first: every variant must emit identical rows
    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(
            (r.doc, r.fingerprint) for r in fn(docs).collect()
        )
    base = rows[which[0]]
    assert all(rows[n] == base for n in which), "variant outputs differ"
    print(f"identity: OK over {len(base)} docs")

    # timed, interleaved, noop sink
    times = {n: [] for n in variants}
    for n, fn in variants.items():  # warm
        noop(fn(docs))
        cache.release_all()
    order = list(variants)
    for i in range(repeats):
        for n in (order if i % 2 == 0 else order[::-1]):
            start = time.perf_counter()
            noop(variants[n](docs))
            times[n].append(time.perf_counter() - start)
            cache.release_all()
    for n in order:
        print(
            f"simhash_{n}: median={statistics.median(times[n]):.3f}s "
            f"all={sorted(round(x, 3) for x in times[n])}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
