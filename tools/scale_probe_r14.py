"""Scale-probe the r14 changes (the measured-scale discipline):

1. The full-md5 seed-confirmation DELTA (VERDICT-r13 What's-wrong #1
   asked to "measure the delta at sf0.1"): repeated_spans now groups
   and joins on the (gh, gm) pair — one extra 32-hex column through
   the one groupBy — vs an inline replica of the r13 gh-only
   pipeline (same helpers, gm dropped). Both timed at 1x and the Nx
   key-shifted replica with auto-broadcast OFF.

2. The two new operators at 1x vs Nx, same regime:
   - remove_repeated_spans(keep='first'): detection + a rank over
     the gram key the coverage join already co-locates + the cut.
   - remove_contaminated_spans: train grams scale xN, the eval gram
     set stays the 1x slice (benchmarks don't grow with the corpus);
     eval probe rides the broadcast hint.

Replica semantics as in scale_probe_r13: documents replicate with
doc_id shifts and IDENTICAL text, so at Nx EVERY gram is duplicated
and every position covered — the WORST-CASE coverage load (real
corpora sit far below it); measured ratios upper-bound the
data-proportional cost. Plan assertions ride along: no cartesian /
no shuffled NLJ at either scale.

Usage: python tools/scale_probe_r14.py [sf_dir] [factor] [repeats]
Scratch lands under ./.scale_probe_r14 (gitignored).
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hillview_spark import cache, session, tables  # noqa: E402
from hillview_spark.functions import dedup  # noqa: E402
from hillview_spark.plans import explain as ex  # noqa: E402

KEYSPAN = 10_000_000


def replicate(df, factor, shift_cols):
    parts = [df]
    for i in range(1, factor):
        p = df
        for c in shift_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * KEYSPAN))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def med(f, repeats, force):
    """Median wall time of materializing f() with every released
    column forced through an aggregate (the r13 probe-honesty rule:
    a bare count() lets Catalyst prune released columns and even
    eliminate joins, silently benchmarking a different plan)."""
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


def repeated_spans_gh_only(df, n=5, min_sites=2):
    """Inline replica of the r13 pipeline — seed groups and coverage
    join keyed on the 60-bit prefix ALONE (derived from gm, then gm
    dropped before the shuffle). Exists only to measure what the
    exactness fix costs."""
    toked = dedup._tokenized(df, "doc_id", "text")
    g = cache.persist(
        dedup._positioned_grams(toked, n)
        .withColumn(
            "gh", F.conv(F.substring("gm", 1, 15), 16, 10).cast("bigint")
        )
        .drop("gm")
    )
    dup = (
        g.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("sites"))
        .where(F.col("sites") >= min_sites)
        .select("gh")
    )
    cov = g.join(dup, "gh").select("doc", "pos")
    return dedup._report_spans(dedup._merge_islands(cov, n), toked, "doc_id")


SPAN_FORCE = [("span_tokens", "num"), ("n_dup_grams", "num"),
              ("span_text", "str")]
RM_FORCE = [("text", "str"), ("n_tokens_kept", "num"),
            ("n_tokens_removed", "num")]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_dir = ".scale_probe_r14"
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs1 = tables.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    path = f"{out_dir}/documents_x{factor}.parquet"
    replicate(docs1, factor, ["doc_id"]).write.mode("overwrite").parquet(
        path
    )
    docsN = spark.read.parquet(path)
    print(f"documents replica rows: {docsN.count()}")

    # --- 1. the full-md5 exactness delta -----------------------------
    for mk in (
        lambda d: dedup.repeated_spans(d, n=5, min_sites=2),
        lambda d: repeated_spans_gh_only(d),
    ):
        for d in (docs1, docsN):
            plan = ex.physical_plan(mk(d))
            assert "CartesianProduct" not in plan
            assert "ShuffledNestedLoop" not in plan
    new1 = med(lambda: dedup.repeated_spans(docs1, n=5, min_sites=2),
               repeats, SPAN_FORCE)
    old1 = med(lambda: repeated_spans_gh_only(docs1), repeats, SPAN_FORCE)
    newN = med(lambda: dedup.repeated_spans(docsN, n=5, min_sites=2),
               repeats, SPAN_FORCE)
    oldN = med(lambda: repeated_spans_gh_only(docsN), repeats, SPAN_FORCE)
    print(
        f"md5-confirm delta broadcast-off: 1x {old1:.2f}s -> {new1:.2f}s "
        f"({(new1 / old1 - 1) * 100:+.1f}%); {factor}x {oldN:.2f}s -> "
        f"{newN:.2f}s ({(newN / oldN - 1) * 100:+.1f}%); new-shape "
        f"scale ratio {newN / new1:.2f} (worst-case full coverage)"
    )

    # --- 2a. keep-one policy -----------------------------------------
    k1 = lambda: dedup.remove_repeated_spans(
        docs1, n=5, min_sites=2, keep="first"
    )
    kN = lambda: dedup.remove_repeated_spans(
        docsN, n=5, min_sites=2, keep="first"
    )
    for df in (k1(), kN()):
        ex.assert_no_cartesian(df)
    a1 = med(k1, repeats, RM_FORCE)
    aN = med(kN, repeats, RM_FORCE)
    print(
        f"remove_repeated_spans keep='first' broadcast-off: 1x "
        f"{a1:.2f}s -> {factor}x {aN:.2f}s (ratio {aN / a1:.2f}; the "
        f"per-gram rank rides the coverage join's partitioning)"
    )

    # --- 2b. surgical decontamination (train xN, eval fixed) ----------
    ev_docs = docs1.where(F.col("doc_id") % 20 == 0)
    c1 = lambda: dedup.remove_contaminated_spans(
        docs1.where(F.col("doc_id") % 20 != 0), ev_docs, n=5
    )
    cN = lambda: dedup.remove_contaminated_spans(
        docsN.where(F.col("doc_id") % 20 != 0), ev_docs, n=5
    )
    for df in (c1(), cN()):
        ex.assert_no_cartesian(df)
    b1 = med(c1, repeats, RM_FORCE)
    bN = med(cN, repeats, RM_FORCE)
    print(
        f"remove_contaminated_spans broadcast-hint {factor}x-train: 1x "
        f"{b1:.2f}s -> {factor}x {bN:.2f}s (ratio {bN / b1:.2f}; eval "
        f"grams fixed at the 1x slice)"
    )

    # --- optional: the r14 late-block release at the same replica ----
    if "--late" in sys.argv:
        import re

        from hillview_spark.streaming import events as ev

        def n_hash_exchanges(df):
            plan = ex.physical_plan(df)
            ids = re.findall(
                r"Exchange hashpartitioning[^\n]*plan_id=(\d+)", plan
            )
            return len(set(ids))

        events1 = tables.load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "ts", "value"
        )
        epath = f"{out_dir}/events_x{factor}.parquet"
        replicate(events1, factor, ["event_id", "user_id"]).write.mode(
            "overwrite"
        ).parquet(epath)
        eventsN = spark.read.parquet(epath)
        print(f"events replica rows: {eventsN.count()}")
        # cell count = windows x distinct types = CONSTANT across
        # replicas; only the scan + partial aggregate scales — the
        # whole claim, so the exchange count must not move either
        t1f = lambda: ev.dp_windowed_trending(
            events1, unit="day", col="event_type", epsilon=1.0,
            delta=0.05, seed=7,
        )
        tNf = lambda: ev.dp_windowed_trending(
            eventsN, unit="day", col="event_type", epsilon=1.0,
            delta=0.05, seed=7,
        )
        assert n_hash_exchanges(t1f()) == n_hash_exchanges(tNf())
        tf = [("noisy_count", "num")]
        w1 = med(t1f, repeats, tf)
        wN = med(tNf, repeats, tf)
        print(
            f"dp_windowed_trending broadcast-off: 1x {w1:.2f}s -> "
            f"{factor}x {wN:.2f}s (ratio {wN / w1:.2f}; cells constant, "
            f"events x{factor}, exchange count asserted equal)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
