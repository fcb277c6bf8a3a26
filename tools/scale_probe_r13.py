"""Scale-probe the r13 additions (the VERDICT-r12 measured-scale
discipline): exact-substring dedup (repeated_spans /
remove_repeated_spans) and the continual bounded-MEAN release
(dp_windowed_mean), at 1x and Nx key-shifted replicas in ONE session
with auto-broadcast OFF (spark.sql.autoBroadcastJoinThreshold=-1) —
the 100-TB operating regime where any implicit small-side broadcast
degrades to a shuffle (or, unguarded, a cartesian).

Replica semantics, stated honestly:
- documents replicate with doc_id shifts and IDENTICAL text, so at
  Nx EVERY gram is corpus-duplicated and every position covered —
  the WORST-CASE coverage load for the island merge (real corpora
  sit far below it). Distinct grams stay constant; gram rows and
  covered positions scale xN, so the measured ratio upper-bounds
  the operator's data-proportional cost.
- events replicate with event_id AND user_id shifts (user
  population grows, per-user history constant); dp_windowed_mean's
  cell count is windows x types = CONSTANT across replicas, so only
  the scan+partial-aggregate side scales — the mechanism's whole
  scale claim.

Plan assertions, not just timing: no cartesian / no shuffled NLJ at
either scale for the span ops; dp_windowed_mean's DISTINCT
hash-exchange count identical at 1x and Nx (one groupBy shuffle is a
property of the plan SHAPE, not the data size).

Usage: python tools/scale_probe_r13.py [sf_dir] [factor] [repeats]
Scratch lands under ./.scale_probe_r13 (gitignored).
"""

from __future__ import annotations

import re
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hillview_spark import cache, session, tables  # noqa: E402
from hillview_spark.functions import dedup  # noqa: E402
from hillview_spark.plans import explain as ex  # noqa: E402
from hillview_spark.streaming import events as ev  # noqa: E402

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


def med(f, repeats, force=None):
    """Median wall time of materializing f(). A bare .count() is NOT
    an honest driver here: Catalyst prunes unreferenced columns (the
    span_text slice, the noise expressions) and can eliminate a left
    join against a unique-keyed aggregate outright — the first probe
    run measured remove_repeated_spans FASTER at 10x because count()
    had optimized away the entire spans side. `force` names columns
    to aggregate (sum of length for strings, sum otherwise), so every
    measured plan computes the full released values."""
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        df = f()
        if force:
            aggs = []
            for c, kind in force:
                col = F.length(F.col(c)) if kind == "str" else F.col(c)
                aggs.append(F.sum(col).alias(c))
            df.agg(*aggs).collect()
        else:
            df.count()
        cache.release_all()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def n_hash_exchanges(df):
    # DISTINCT hashpartitioning exchanges only (shared cached
    # subtrees print once per consumer; SinglePartition exchanges
    # excluded — see scale_probe_r12's rationale)
    plan = ex.physical_plan(df)
    ids = re.findall(r"Exchange hashpartitioning[^\n]*plan_id=(\d+)", plan)
    return len(set(ids))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_dir = ".scale_probe_r13"
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs1 = tables.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    events1 = tables.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    fixtures = {}
    for name, df, shifts in (
        ("documents", docs1, ["doc_id"]),
        ("events", events1, ["event_id", "user_id"]),
    ):
        path = f"{out_dir}/{name}_x{factor}.parquet"
        replicate(df, factor, shifts).write.mode("overwrite").parquet(path)
        fixtures[name] = spark.read.parquet(path)
        print(f"{name} replica rows: {fixtures[name].count()}")

    # --- repeated_spans: inverted-index + per-doc island merge ------
    sp1 = lambda: dedup.repeated_spans(docs1, n=5, min_sites=2)
    spN = lambda: dedup.repeated_spans(fixtures["documents"], n=5,
                                       min_sites=2)
    for df in (sp1(), spN()):
        plan = ex.physical_plan(df)
        assert "CartesianProduct" not in plan, "cartesian under -1!"
        assert "ShuffledNestedLoop" not in plan
    span_force = [("span_tokens", "num"), ("n_dup_grams", "num"),
                  ("span_text", "str")]
    t1 = med(sp1, repeats, force=span_force)
    tN = med(spN, repeats, force=span_force)
    print(
        f"repeated_spans broadcast-off: 1x {t1:.2f}s -> {factor}x "
        f"{tN:.2f}s (ratio {tN / t1:.2f}; identical-text replicas "
        f"make EVERY gram duplicated — worst-case coverage)"
    )

    # --- remove_repeated_spans: + span join-back + per-row cut -------
    rm1 = lambda: dedup.remove_repeated_spans(docs1, n=5, min_sites=2)
    rmN = lambda: dedup.remove_repeated_spans(
        fixtures["documents"], n=5, min_sites=2
    )
    for df in (rm1(), rmN()):
        ex.assert_no_cartesian(df)
    rm_force = [("text", "str"), ("n_tokens_kept", "num"),
                ("n_tokens_removed", "num")]
    r1 = med(rm1, repeats, force=rm_force)
    rN = med(rmN, repeats, force=rm_force)
    print(
        f"remove_repeated_spans broadcast-off: 1x {r1:.2f}s -> "
        f"{factor}x {rN:.2f}s (ratio {rN / r1:.2f})"
    )

    # --- optional: the late-block keys at the same replica ------------
    if "--late" in sys.argv:
        # contamination: TRAIN scales xN, the eval gram set stays the
        # 1x slice (the realistic direction — benchmarks don't grow
        # with the corpus); the eval probe must stay a broadcast
        ev_docs = docs1.where(F.col("doc_id") % 20 == 0)
        c1 = lambda: dedup.contamination_spans(
            docs1.where(F.col("doc_id") % 20 != 0), ev_docs, n=5
        )
        cN = lambda: dedup.contamination_spans(
            fixtures["documents"].where(F.col("doc_id") % 20 != 0),
            ev_docs, n=5,
        )
        for df in (c1(), cN()):
            ex.assert_no_cartesian(df)
        cf = [("span_tokens", "num"), ("span_text", "str")]
        x1 = med(c1, repeats, force=cf)
        xN = med(cN, repeats, force=cf)
        print(
            f"contamination_spans broadcast-hint 10x-train: 1x "
            f"{x1:.2f}s -> {factor}x {xN:.2f}s (ratio {xN / x1:.2f}; "
            f"eval grams fixed at the 1x slice)"
        )
        from hillview_spark.operators import privacy as priv

        d1 = lambda: ev.dp_windowed_distinct(events1, epsilon=1.0, seed=7)
        dN = lambda: ev.dp_windowed_distinct(
            fixtures["events"], epsilon=1.0, seed=7
        )
        assert n_hash_exchanges(d1()) == n_hash_exchanges(dN())
        df_ = [("noisy_distinct", "num")]
        y1 = med(d1, repeats, force=df_)
        yN = med(dN, repeats, force=df_)
        print(
            f"dp_windowed_distinct broadcast-off: 1x {y1:.2f}s -> "
            f"{factor}x {yN:.2f}s (ratio {yN / y1:.2f}; distinct sets "
            f"bound the state, users x{factor})"
        )
        u1 = lambda: priv.dp_histogram_unknown_domain(
            events1, "user_id", epsilon=1.0, delta=1e-14, seed=7
        )
        uN = lambda: priv.dp_histogram_unknown_domain(
            fixtures["events"], "user_id", epsilon=1.0, delta=1e-14,
            seed=7,
        )
        assert n_hash_exchanges(u1()) == n_hash_exchanges(uN())
        uf = [("noisy_count", "num")]
        z1 = med(u1, repeats, force=uf)
        zN = med(uN, repeats, force=uf)
        print(
            f"dp_active_users broadcast-off: 1x {z1:.2f}s -> "
            f"{factor}x {zN:.2f}s (ratio {zN / z1:.2f}; domain "
            f"x{factor} users, one groupBy)"
        )

    # --- dp_windowed_mean: one shuffle at ANY size --------------------
    dm1 = lambda: ev.dp_windowed_mean(events1, epsilon=1.0, seed=7)
    dmN = lambda: ev.dp_windowed_mean(
        fixtures["events"], epsilon=1.0, seed=7
    )
    e1, eN = n_hash_exchanges(dm1()), n_hash_exchanges(dmN())
    assert e1 == eN, (
        f"dp_windowed_mean hash-exchange count grew with data: "
        f"{e1} at 1x vs {eN} at {factor}x"
    )
    dm_force = [("noisy_sum", "num"), ("noisy_count", "num"),
                ("noisy_mean", "num")]
    m1 = med(dm1, repeats, force=dm_force)
    mN = med(dmN, repeats, force=dm_force)
    print(
        f"dp_windowed_mean broadcast-off: 1x {m1:.2f}s -> {factor}x "
        f"{mN:.2f}s (ratio {mN / m1:.2f}; hash-exchanges {e1} == {eN} "
        f"at both scales; cells constant, users x{factor})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
