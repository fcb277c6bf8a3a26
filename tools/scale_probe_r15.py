"""Scale-probe the r15 keep='first' de-skew (VERDICT-r14 directive
#2): a deliberately HOT-GRAM corpus — ONE gram (a license-header
stand-in) duplicated at ~10^6 (doc, pos) sites corpus-wide — against
a UNIFORM control corpus with the identical size and per-doc
structure but the duplicated gram spread over 5*10^5 per-pair keys
(every duplicated gram has exactly 2 sites). Both corpora have the
same row count, token count, gram count, and coverage-row count
(10^6), so the ONLY difference is the key distribution.

Measured, interleaved in ONE session (the r14 probe discipline):

1. NEW shape (min-struct on the gram aggregate) on hot vs uniform —
   the flatness claim: a pathological key distribution must not
   change the wall time class.
2. OLD r14 shape (row_number window over gm — inline replica kept
   only for this measurement) on hot vs uniform — the cliff the fix
   removed: all 10^6 sites of the hot gram land in ONE window
   partition, a single-task sort AQE cannot split (AQE CAN split a
   skewed join, which is why the join-only keep='all' path never
   had the cliff; a window pinned to the same keys defeats it).
3. NEW keep='first' vs keep='all' on the hot corpus — the exemption
   itself must cost ~nothing (it rides the existing aggregate).

AQE stays ON (the operating configuration — the point is what AQE
can and cannot rescue); auto-broadcast stays ON for the same reason
(the dup side is 1 row on the hot corpus, 5*10^5 on uniform — part
of the real difference between the corpora, reported as-is; the
old-vs-new comparison on the SAME corpus isolates the window).

Second mode — `--dp [sf_dir] [factor] [repeats]`: the r15 composed
user-level DP releases at 1x vs a key-shifted Nx events replica
(event_id/user_id shifts, the trending-probe regime):
dp_windowed_counts_user_level and dp_windowed_trending_user_level,
medians with every released column forced through an aggregate,
plus the exchange-count invariance assertion (the bound is rank
shuffles + one groupBy — the plan's exchange count must not grow
with data).

Usage: python tools/scale_probe_r15.py [n_docs] [repeats]
       python tools/scale_probe_r15.py --dp [sf_dir] [factor] [repeats]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import Window, functions as F

sys.path.insert(0, ".")
from hillview_spark import cache, session  # noqa: E402
from hillview_spark.functions import dedup  # noqa: E402

RM_FORCE = [("text", "str"), ("n_tokens_kept", "num"),
            ("n_tokens_removed", "num")]


def med(f, repeats, force):
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        df = f()
        aggs = []
        for c, kind in force:
            col = F.length(F.col(c)) if kind == "str" else F.col(c)
            aggs.append(F.sum(col).alias(c))
        df.agg(*aggs).collect()
        cache.release_all()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def remove_spans_window_shape(df, n=5, min_sites=2):
    """Inline replica of the r14 keep='first' pipeline (row_number
    window over gm) — exists ONLY to measure the cliff the r15
    min-struct shape removed."""
    toked = dedup._tokenized(df, "doc_id", "text")
    g = cache.persist(dedup._positioned_grams(toked, n))
    dup = (
        g.groupBy("gm")
        .agg(F.count(F.lit(1)).alias("sites"))
        .where(F.col("sites") >= min_sites)
        .select("gm")
    )
    cov = g.join(dup, ["gm"])
    w = Window.partitionBy("gm").orderBy("doc", "pos")
    cov = (
        cov.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") > 1)
        .select("doc", "pos")
    )
    return dedup._cut_spans(
        df, dedup._merge_islands(cov, n), "doc_id", "text"
    )


def remove_spans_twopass_shape(df, n=5, min_sites=2):
    """Candidate C: pure-HashAggregate keep='first' — min(struct)
    keeps every aggregate buffer fixed-width EXCEPT the struct
    itself, which pushes the partial aggregate to SortAggregate (a
    per-partition sort of the whole gram frame). This shape stays
    hash-aggregated end to end at the price of a second tiny join:
    pass 1 takes min(doc) per gram; the coverage join carries it;
    pass 2 takes min(pos) among the first doc's sites (a filtered
    aggregate whose output is one row per duplicated gram); the
    exemption is a plain column predicate."""
    toked = dedup._tokenized(df, "doc_id", "text")
    g = cache.persist(dedup._positioned_grams(toked, n))
    dup = (
        g.groupBy("gm")
        .agg(F.count(F.lit(1)).alias("sites"), F.min("doc").alias("__fdoc"))
        .where(F.col("sites") >= min_sites)
        .select("gm", "__fdoc")
    )
    cov = g.join(dup, ["gm"])
    fpos = (
        cov.where(F.col("doc") == F.col("__fdoc"))
        .groupBy("gm")
        .agg(F.min("pos").alias("__fpos"))
    )
    cov = cov.join(fpos, ["gm"]).where(
        ~((F.col("doc") == F.col("__fdoc"))
          & (F.col("pos") == F.col("__fpos")))
    ).select("doc", "pos")
    return dedup._cut_spans(
        df, dedup._merge_islands(cov, n), "doc_id", "text"
    )


def main_dp():
    from hillview_spark import tables
    from hillview_spark.plans import explain as ex
    from hillview_spark.streaming import events as ev

    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ev1 = tables.load_table(spark, sf_dir, "events")
    keyspan = 10_000_000
    parts = [ev1]
    for i in range(1, factor):
        parts.append(
            ev1.withColumn("event_id", F.col("event_id") + F.lit(i * keyspan))
            .withColumn("user_id", F.col("user_id") + F.lit(i * keyspan))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    path = ".scale_probe_r15/events_xN.parquet"
    out.write.mode("overwrite").parquet(path)
    evN = spark.read.parquet(path)
    print(f"events replica rows: {evN.count()} (x{factor})")

    CNT_FORCE = [("noisy_events", "num")]
    TRD_FORCE = [("noisy_count", "num"), ("value", "str")]
    mk_cnt = lambda d: ev.dp_windowed_counts_user_level(  # noqa: E731
        d, unit="hour", epsilon=1.0, seed=7, k=1, max_windows=56
    )
    mk_trd = lambda d: ev.dp_windowed_trending_user_level(  # noqa: E731
        d, unit="day", epsilon=2.0, delta=0.05, seed=7, k=1,
        max_windows=20,
    )
    # exchange-count invariance: the composed plan is rank shuffles +
    # one groupBy, independent of data volume
    for mk, force, label in (
        (mk_cnt, CNT_FORCE, "counts_user_level"),
        (mk_trd, TRD_FORCE, "trending_user_level"),
    ):
        n1 = ex.count_shuffles(mk(ev1))
        nN = ex.count_shuffles(mk(evN))
        assert n1 == nN, (label, n1, nN)
        print(f"{label}: exchange count {n1} at 1x == {nN} at {factor}x")
        med(lambda: mk(ev1), 1, force)  # warm
        med(lambda: mk(evN), 1, force)
        t1 = [med(lambda: mk(ev1), 1, force) for _ in range(repeats)]
        tN = [med(lambda: mk(evN), 1, force) for _ in range(repeats)]
        m1, mN = statistics.median(t1), statistics.median(tN)
        print(
            f"{label}: 1x {m1:.2f}s -> {factor}x {mN:.2f}s "
            f"(ratio {mN / m1:.2f}) all_1x={[round(t,2) for t in t1]} "
            f"all_{factor}x={[round(t,2) for t in tN]}"
        )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # 8 tokens/doc, 4 5-grams/doc; gram 3 (positions 3..7) is the
    # duplicated one, flanked by per-doc-unique tokens.
    hot = ids.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.concat(F.lit("a"), "doc_id"), F.concat(F.lit("b"), "doc_id"),
            F.lit("L0"), F.lit("L1"), F.lit("L2"), F.lit("L3"), F.lit("L4"),
            F.concat(F.lit("c"), "doc_id"),
        ).alias("text"),
    )
    pair = (F.col("doc_id") / 2).cast("long")
    uni = ids.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.concat(F.lit("a"), "doc_id"), F.concat(F.lit("b"), "doc_id"),
            F.concat(F.lit("p"), pair, F.lit("x0")),
            F.concat(F.lit("p"), pair, F.lit("x1")),
            F.concat(F.lit("p"), pair, F.lit("x2")),
            F.concat(F.lit("p"), pair, F.lit("x3")),
            F.concat(F.lit("p"), pair, F.lit("x4")),
            F.concat(F.lit("c"), "doc_id"),
        ).alias("text"),
    )
    hot_p = ".scale_probe_r15/hot.parquet"
    uni_p = ".scale_probe_r15/uni.parquet"
    hot.write.mode("overwrite").parquet(hot_p)
    uni.write.mode("overwrite").parquet(uni_p)
    hot, uni = spark.read.parquet(hot_p), spark.read.parquet(uni_p)
    print(f"docs per corpus: {hot.count()} (hot gram sites = {n_docs})")

    mk_new = lambda d: dedup.remove_repeated_spans(  # noqa: E731
        d, n=5, min_sites=2, keep="first"
    )
    mk_all = lambda d: dedup.remove_repeated_spans(  # noqa: E731
        d, n=5, min_sites=2, keep="all"
    )
    cases = [
        ("minstruct_hot", lambda: mk_new(hot)),
        ("window_hot", lambda: remove_spans_window_shape(hot)),
        ("twopass_hot", lambda: remove_spans_twopass_shape(hot)),
        ("all_hot", lambda: mk_all(hot)),
        ("minstruct_uni", lambda: mk_new(uni)),
        ("window_uni", lambda: remove_spans_window_shape(uni)),
        ("twopass_uni", lambda: remove_spans_twopass_shape(uni)),
        ("all_uni", lambda: mk_all(uni)),
    ]
    # one untimed warm pass (page cache + JIT), then INTERLEAVE the
    # shapes round-robin — separate-session / sequential-block probe
    # runs on this box swung 1.3-2.5x on identical code (r14 lesson)
    samples = {name: [] for name, _ in cases}
    for name, f in cases:
        med(f, 1, RM_FORCE)
    for _ in range(repeats):
        for name, f in cases:
            samples[name].append(med(f, 1, RM_FORCE))
    res = {}
    for name, ts in samples.items():
        res[name] = statistics.median(ts)
        print(f"{name}: median={res[name]:.2f}s all={[round(t, 2) for t in ts]}")
    print(
        f"hot-gram: window {res['window_hot']:.2f}s vs minstruct "
        f"{res['minstruct_hot']:.2f}s vs twopass "
        f"{res['twopass_hot']:.2f}s (keep_all floor "
        f"{res['all_hot']:.2f}s); uniform: window "
        f"{res['window_uni']:.2f}s vs minstruct "
        f"{res['minstruct_uni']:.2f}s vs twopass "
        f"{res['twopass_uni']:.2f}s (keep_all floor "
        f"{res['all_uni']:.2f}s); hot/uniform flatness: window "
        f"{res['window_hot'] / res['window_uni']:.2f}, minstruct "
        f"{res['minstruct_hot'] / res['minstruct_uni']:.2f}, twopass "
        f"{res['twopass_hot'] / res['twopass_uni']:.2f}"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dp":
        main_dp()
    else:
        main()
