"""Scale-probe text_collocations and events_funnel (VERDICT-r11 #6):
the r11 README curve used sf0.01 -> sf0.1, which is
overhead-dominated for these two. This probe builds key-shifted Nx
replicas (documents: doc_id shift; events: event_id AND user_id
shift, so per-user history stays constant and the USER population
grows — the realistic scale direction for a funnel) and measures
both ops at 1x and Nx in ONE session with auto-broadcast OFF
(spark.sql.autoBroadcastJoinThreshold=-1), the 100-TB regime where
the |V| unigram joins and the per-step funnel joins must survive as
shuffle joins.

Plan assertion, not just timing: the funnel's scale claim is that
consecutive stages REUSE the per-user hash partitioning (each
stage's persisted (user, first-completion) frame carries the
partitioning of its own aggregate into the next join). If that
holds, the exchange count in the physical plan is a constant of the
plan SHAPE — asserted identical at 1x and Nx — and never grows with
data. Collocations' no-cartesian claim is asserted under the
disabled threshold too (the scalar totals ride an EXPLICIT broadcast
hint, which must keep working when auto-broadcast is off).

Usage: python tools/scale_probe_r12.py [sf_dir] [factor] [repeats]
Scratch lands under ./.scale_probe_r12 (gitignored).
"""

from __future__ import annotations

import re
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from hillview_spark import cache, session, tables  # noqa: E402
from hillview_spark.functions import text  # noqa: E402
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


def med(f, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        f().count()
        cache.release_all()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def n_hash_exchanges(df):
    # the partitioning-reuse claim is about DATA shuffles, so count
    # DISTINCT hashpartitioning exchanges only (the tree printer
    # expands a shared cached subtree once per consumer, so raw line
    # counts double-report a plan_id). SinglePartition exchanges are
    # excluded on purpose: the per-step 1-row counts contribute a
    # constant, and at the larger input Catalyst additionally injects
    # runtime bloom-filter SUBQUERIES (bloom_filter_agg over a
    # SinglePartition exchange) for the shuffle joins — a size-
    # thresholded OPTIMIZATION that would break naive parity.
    plan = ex.physical_plan(df)
    ids = re.findall(r"Exchange hashpartitioning[^\n]*plan_id=(\d+)", plan)
    return len(set(ids))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_dir = ".scale_probe_r12"
    spark = session.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs1 = tables.load_table(spark, sf_dir, "documents")
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

    # --- collocations: shuffle must be data-proportional ------------
    col1 = lambda: text.collocations(docs1, min_count=5)
    colN = lambda: text.collocations(fixtures["documents"], min_count=5)
    for df in (col1(), colN()):
        plan = ex.physical_plan(df)
        assert "CartesianProduct" not in plan, "cartesian under -1!"
        assert "ShuffledNestedLoop" not in plan
    t1 = med(col1, repeats)
    tN = med(colN, repeats)
    print(
        f"collocations broadcast-off: 1x {t1:.2f}s -> {factor}x "
        f"{tN:.2f}s (ratio {tN / t1:.2f}; key-shifted text repeats, "
        f"so distinct n-grams constant, counts x{factor})"
    )

    # --- optional: the wider event suite at the same replica ---------
    if "--suite" in sys.argv:
        suite = {
            "cohort_retention": lambda e: ev.cohort_retention(e),
            "windowed_anomaly": lambda e: ev.windowed_anomaly(e),
            "transition_counts": lambda e: ev.transition_counts(e),
            "rolling_actives_exact": lambda e: ev.rolling_active_users(
                e, window_days=7
            ),
            "rolling_actives_bitmap": (
                lambda e: ev.rolling_active_users_sketch(
                    e, window_days=7, exact=True
                )
            ),
            "dp_windowed_sum": lambda e: ev.dp_windowed_sum(
                e, epsilon=1.0, seed=7
            ),
        }
        for name, mk in suite.items():
            s1 = med(lambda: mk(events1), repeats)
            sN = med(lambda: mk(fixtures["events"]), repeats)
            print(
                f"{name} broadcast-off: 1x {s1:.2f}s -> {factor}x "
                f"{sN:.2f}s (ratio {sN / s1:.2f})"
            )

    # --- funnel: partitioning reuse across stages --------------------
    fun1 = lambda: ev.funnel_counts(events1)
    funN = lambda: ev.funnel_counts(fixtures["events"])
    e1, eN = n_hash_exchanges(fun1()), n_hash_exchanges(funN())
    assert e1 == eN, (
        f"funnel hash-exchange count grew with data: {e1} at 1x vs "
        f"{eN} at {factor}x — partitioning reuse broke"
    )
    for df in (fun1(), funN()):
        ex.assert_no_cartesian(df)
    cache.release_all()
    f1 = med(fun1, repeats)
    fN = med(funN, repeats)
    print(
        f"funnel broadcast-off: 1x {f1:.2f}s -> {factor}x {fN:.2f}s "
        f"(ratio {fN / f1:.2f}; hash-exchanges {e1} == {eN} at both "
        f"scales, users x{factor})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
