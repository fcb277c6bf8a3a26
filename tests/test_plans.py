"""Plan-shape tests: at 100 TB the *plan* is the product. These
assert the physical properties the scale design depends on —
pushdown reaching the parquet scan, broadcast joins for dims,
top-k instead of global sort, no cartesian products — via the
hillview_spark.plans.explain helpers."""

import pytest
from pyspark.sql import functions as F

from hillview_spark.plans import explain as ex
from hillview_spark.operators import spreadsheet
from hillview_spark.queries import tpch


def test_q6_filters_pushed_to_scan(spark, tables):
    ex.assert_pushdown(
        tpch.q6_revenue_forecast(tables["lineitem"]),
        ["l_shipdate", "l_discount", "l_quantity"],
    )


def test_q6_column_pruning(spark, tables):
    ex.assert_column_pruning(
        tpch.q6_revenue_forecast(tables["lineitem"]),
        expected=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        forbidden=["l_orderkey", "l_returnflag", "l_tax", "l_partkey"],
    )


def test_q5_broadcasts_all_dimensions(spark, tables):
    df = tpch.q5_local_supplier(
        tables["customer"], tables["orders"], tables["lineitem"],
        tables["supplier"], tables["nation"], tables["region"],
    )
    ex.assert_broadcast_joins(df, at_least=3)
    ex.assert_no_cartesian(df)


def test_next_k_uses_topk_not_global_sort(spark, tables):
    df = spreadsheet.next_k(
        tables["lineitem"], ["l_returnflag", "l_linestatus"], k=5
    )
    ex.assert_topk_not_global_sort(df)
    # no full sort-exchange before the top-k
    plan = ex.physical_plan(df)
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_whole_stage_codegen_on_hot_path(spark, tables):
    df = tpch.q1_pricing_summary(tables["lineitem"])
    df.collect()  # finalize the adaptive plan so codegen stages appear
    plan = ex.physical_plan(df)
    # codegen stages render as "*(n) Operator" in the plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no row-python in the hot path


def test_dedup_join_is_equi_not_cartesian(spark, tables):
    from hillview_spark.functions import dedup

    ex.assert_no_cartesian(dedup.minhash_lsh_pairs(tables["documents"], 16, 4))


def test_knn_join_lsh_is_equi_not_cartesian(spark, tables):
    from hillview_spark.functions import similarity

    ex.assert_no_cartesian(
        similarity.knn_join(tables["embeddings"], k=3, planes=4, exact=False)
    )


def test_assert_helpers_raise_on_violation(spark, tables):
    # a filter on a computed value cannot push down — helper must say so
    from pyspark.sql import functions as F

    df = tables["lineitem"].where(
        F.sha2(F.col("l_returnflag"), 256) == "x"
    )
    # l_shipdate has no predicate at all -> cannot be in PushedFilters
    with pytest.raises(AssertionError):
        ex.assert_pushdown(df, ["l_shipdate"])
    cart = tables["nation"].crossJoin(tables["region"])
    with pytest.raises(AssertionError):
        ex.assert_no_cartesian(cart)


def test_range_filter_array_all_ranges_pushed(spark, tables):
    from hillview_spark.operators import filters

    df = tables["lineitem"].where(
        filters.range_filter_array([
            {"col": "l_quantity", "lo": 10, "hi": 30},
            {"col": "l_extendedprice", "lo": 1000.0, "hi": 20000.0},
            {"col": "l_shipdate", "lo": "1996-01-01", "hi": "1996-12-31"},
        ])
    ).select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
    ex.assert_pushdown(df, ["l_quantity", "l_extendedprice", "l_shipdate"])


def test_heavy_hitters_single_scan(spark, tables):
    """The total-count side must reuse the grouped exchange — one scan
    of the input, not a separate count() job."""
    from hillview_spark.operators import heavy_hitters

    df = heavy_hitters.heavy_hitters(tables["documents"], ["lang"], epsilon=0.1)
    df.collect()
    assert "ReusedExchange" in ex.physical_plan(df)


def test_string_quantiles_no_single_partition_sort(spark, tables):
    """Every Window over the distinct-value set must be partitioned
    (by spark_partition_id); the only unpartitioned window allowed is
    the prefix-sum over the tiny per-partition-count relation."""
    from hillview_spark.operators import stats

    df = stats.string_quantiles(tables["customer"], "c_name", 8)
    df.collect()
    plan = ex.physical_plan(df)
    # the row_number ranking window must carry a partition column
    import re

    for m in re.finditer(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert spec.split(",")[0].strip().startswith("__pid"), (
            "ranking window not partitioned: " + spec
        )


def test_q4_semi_join_no_materialization(spark, tables):
    df = tpch.q4_late_orders(tables["orders"], tables["lineitem"])
    plan = ex.physical_plan(df)
    assert "LeftSemi" in plan
    ex.assert_no_cartesian(df)


def test_q10_broadcast_customer_and_topk(spark, tables):
    df = tpch.q10_returned_items(
        tables["customer"], tables["orders"], tables["lineitem"]
    )
    ex.assert_broadcast_joins(df, at_least=1)
    ex.assert_topk_not_global_sort(df)
    # the returnflag filter reaches the scan
    ex.assert_pushdown(df, ["l_returnflag"])


def test_q14_broadcast_part(spark, tables):
    df = tpch.q14_promo_revenue(tables["lineitem"], tables["part"])
    ex.assert_broadcast_joins(df, at_least=1)
    ex.assert_pushdown(df, ["l_shipdate"])


def test_dedup_corpus_chain_no_cartesian(spark, tables):
    """The end-to-end dedup chain must stay inverted-index joins all
    the way down — no cartesian anywhere in the composed plan."""
    from hillview_spark.functions import dedup

    ex.assert_no_cartesian(dedup.dedup_corpus(tables["documents"].limit(50)))


def test_q7_broadcasts_nation_sides(spark, tables):
    df = tpch.q7_volume_shipping(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["supplier"], tables["nation"],
    )
    ex.assert_broadcast_joins(df, at_least=2)
    ex.assert_no_cartesian(df)


def test_q18_having_before_join_and_topk(spark, tables):
    df = tpch.q18_large_orders(
        tables["customer"], tables["orders"], tables["lineitem"]
    )
    ex.assert_topk_not_global_sort(df)
    plan = ex.physical_plan(df)
    # the sum_qty HAVING runs on the aggregate, not after the join:
    # the Filter over sum_qty must appear below (after, in the
    # bottom-up plan text) the first HashAggregate
    assert "TakeOrderedAndProject" in plan


def test_q19_or_predicate_single_scan(spark, tables):
    df = tpch.q19_discounted_revenue(tables["lineitem"], tables["part"])
    plan = ex.physical_plan(df)
    # one scan of lineitem (no union-of-scans for the OR branches)
    assert plan.count("Scan parquet") <= 2  # lineitem + part only
    ex.assert_broadcast_joins(df, at_least=1)


def test_q22_anti_join_with_pushed_date(spark, tables):
    df = tpch.q22_sales_opportunity(tables["customer"], tables["orders"])
    plan = ex.physical_plan(df)
    assert "LeftAnti" in plan
    # the recency predicate reaches the orders parquet scan
    pushed_sections = plan.split("PushedFilters:")[1:]
    assert any("o_orderdate" in s.splitlines()[0] for s in pushed_sections)


def test_decontaminate_broadcasts_eval_set(spark, tables):
    from hillview_spark.functions import curation

    docs = tables["documents"]
    df = curation.decontaminate(
        docs.where(F.col("doc_id") % 20 != 0),
        docs.where(F.col("doc_id") % 20 == 0),
        n=5,
    )
    plan = ex.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    ex.assert_no_cartesian(df)


def test_q2_decorrelated_min_broadcasts_dims(spark, tables):
    df = tpch.q2_min_cost_supplier(
        tables["part"], tables["supplier"], tables["nation"],
        tables["region"], tables["lineitem"],
    )
    ex.assert_broadcast_joins(df, at_least=2)
    ex.assert_no_cartesian(df)
    ex.assert_topk_not_global_sort(df)


def test_q9_single_fact_shuffle(spark, tables):
    df = tpch.q9_product_type_profit(
        tables["part"], tables["supplier"], tables["lineitem"],
        tables["orders"], tables["nation"],
    )
    # part/supplier/nation all broadcast; lineitem⋈orders is the
    # only shuffled join
    ex.assert_broadcast_joins(df, at_least=2)
    plan = ex.physical_plan(df)
    assert plan.count("SortMergeJoin") <= 1


def test_q13_outer_join_keeps_zero_order_customers(spark, tables):
    df = tpch.q13_customer_order_distribution(
        tables["customer"], tables["orders"]
    )
    plan = ex.physical_plan(df)
    assert "LeftOuter" in plan
    # the priority exclusion pushes to the orders scan
    pushed = plan.split("PushedFilters:")[1:]
    assert any("o_orderpriority" in s.splitlines()[0] for s in pushed)


def test_q16_anti_join_no_row_explosion(spark, tables):
    df = tpch.q16_supplier_part_counts(
        tables["part"], tables["supplier"], tables["lineitem"]
    )
    plan = ex.physical_plan(df)
    assert "LeftAnti" in plan
    ex.assert_no_cartesian(df)


def test_q21_one_aggregate_not_double_self_join(spark, tables):
    df = tpch.q21_suppliers_kept_waiting(
        tables["supplier"], tables["lineitem"], tables["orders"]
    )
    plan = ex.physical_plan(df)
    # the EXISTS / NOT EXISTS pair is fused into a single per-order
    # aggregate: lineitem is scanned once, not three times
    assert plan.count("Scan parquet") <= 3  # lineitem + orders + supplier
    ex.assert_no_cartesian(df)


def test_clean_lines_is_pure_projection(spark, tables):
    """C4 line cleaning promises zero shuffle: split -> array filter
    -> re-join is one projection over the scan."""
    from hillview_spark.functions import curation

    df = curation.clean_lines(
        tables["documents"].withColumn(
            "text", F.regexp_replace("text", " value ", ".\n")),
        min_words=3,
    )
    ex.assert_max_shuffles(df, 0)


def test_pq_encode_is_pure_projection(spark, tables):
    """PQ encoding is m*k decimal dots per row — no shuffle at all."""
    from hillview_spark.functions import similarity

    df = similarity.pq_encode_exact(tables["embeddings"], m=4, k=8, stride=50)
    ex.assert_max_shuffles(df, 0)
    ex.assert_no_cartesian(df)


def test_cap_per_group_two_phase_bounded_shuffles(spark, tables):
    from hillview_spark.functions import curation

    df = curation.cap_per_group(tables["documents"], "source", 5)
    ex.assert_no_cartesian(df)
    # phase-1 local window + phase-2 per-group window
    ex.assert_max_shuffles(df, 2)


def test_funnel_counts_single_scan_no_join(spark, tables):
    """r16: the funnel is ONE IN-pushdown scan + one corpus shuffle
    (plus the K tiny count branches) — the r11 per-step join chain is
    gone. A join reappearing here means the fold rewrite regressed."""
    from hillview_spark.plans.explain import physical_plan
    from hillview_spark.streaming import events as ev

    df = ev.funnel_counts(tables["events"])
    plan = physical_plan(df)
    assert "Join" not in plan, "funnel must not join step frames"
    # the K count branches each print the ONE cached relation's
    # child, so count distinct scan lines: the r11 shape had K
    # distinct scans (one per step type's pushed filter)
    scans = {l[l.index("FileScan"):] for l in plan.splitlines()
             if "FileScan parquet" in l}
    assert len(scans) == 1, f"funnel must scan events once, got {len(scans)}"
    assert "In(event_type" in plan, "step filter must reach the scan"


def test_ivf_indexed_search_prunes_partitions(spark, tables, tmp_path):
    """The persisted IVF layout must turn n_probe into PARTITION
    pruning: the data scan lists the probed cells as PartitionFilters
    and the result matches the unindexed IVF search exactly."""
    from hillview_spark.functions import similarity

    emb = tables["embeddings"]
    qv = emb.where(F.col("vec_id") == 0).first().embedding
    search = emb.where("vec_id <> 0")
    path = str(tmp_path / "ivf_index")
    similarity.ivf_write_index(search, path, n_cells=8)
    got = similarity.ivf_topk_indexed(spark, path, qv, k=10, n_probe=4)
    ex.assert_partition_pruning(got, "cell")
    live = similarity.ivf_topk(search, qv, k=10, n_cells=8, n_probe=4)
    assert [(r.vec_id, r.cosine) for r in got.collect()] == [
        (r.vec_id, r.cosine) for r in live.collect()
    ]
    # the centroid sidecar is memoized per index path: a repeat probe
    # serves centroids from the session cache (no second sidecar
    # read), still returning identical results; rewriting the index
    # invalidates the memo
    assert path in similarity._IVF_CENTROID_CACHE
    again = similarity.ivf_topk_indexed(spark, path, qv, k=10, n_probe=4)
    assert [(r.vec_id, r.cosine) for r in again.collect()] == [
        (r.vec_id, r.cosine) for r in live.collect()
    ]
    similarity.ivf_write_index(search, path, n_cells=8)
    assert path not in similarity._IVF_CENTROID_CACHE


def test_dp_histogram_scale_profile(spark, tables):
    """DP histogram at 100 TB: one scan reading only the target
    column, one O(buckets) aggregation shuffle, noise joined as a
    broadcast spine (never a shuffle), plus the O(buckets)-row
    ordering exchange — nothing else."""
    from hillview_spark.operators import privacy

    df = privacy.dp_histogram(
        tables["lineitem"], "l_quantity",
        lo=1.0, hi=51.0, granularity=1.0, epsilon=1.0, buckets=10, seed=7,
    )
    ex.assert_column_pruning(df, ["l_quantity"], ["l_orderkey", "l_comment"])
    ex.assert_no_cartesian(df)
    ex.assert_broadcast_joins(df, at_least=1)
    # agg exchange + the tiny final-order exchange over 10 rows
    ex.assert_max_shuffles(df, 2)


def test_dp_windowed_counts_single_shuffle(spark, tables):
    """The continual release is one groupBy shuffle; the noise is a
    per-row expression on the aggregate output (no join, no second
    exchange)."""
    from hillview_spark.streaming import events as ev

    df = ev.dp_windowed_counts(tables["events"], "hour", 1.0, seed=3)
    ex.assert_max_shuffles(df, 1)
    ex.assert_no_cartesian(df)


def test_dp_windowed_counts_user_level_plan(spark, tables):
    """r15: the contribution-bounded composition stays JVM-side end
    to end — the cap is two window ranks (the local one keyed by
    input partition, so a hot user/window pair cannot become one
    task) plus the optional distinct-window keep-set semi-join; the
    release is windowed_counts' one groupBy with codegen cell noise.
    No cartesian, no Python, anywhere."""
    from hillview_spark.streaming import events as ev

    df = ev.dp_windowed_counts_user_level(
        tables["events"], unit="hour", epsilon=1.0, seed=3,
        k=1, max_windows=56,
    )
    ex.assert_no_cartesian(df)
    plan = ex.physical_plan(df)
    assert "Python" not in plan
    # the local phase must rank within input partitions (the
    # cap_per_group skew discipline): the pre-shuffle partition id
    # appears as a window partition key
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan
    # the composed trending release inherits the same discipline
    tr = ev.dp_windowed_trending_user_level(
        tables["events"], unit="day", epsilon=2.0, delta=0.05,
        seed=3, k=1, max_windows=20,
    )
    ex.assert_no_cartesian(tr)
    assert "Python" not in ex.physical_plan(tr)


def test_bm25_search_plan_broadcast_stats_topk(spark, tables):
    """BM25 never shuffles user data: per-doc tf/dl are array
    expressions, the 1-row stats relation broadcasts back, and top_n
    is a per-partition heap. The only exchanges are the scalar-agg
    collapse (SinglePartition) and, with top_n, the tiny final
    gather."""
    from hillview_spark.functions import search

    df = search.bm25_search(tables["documents"], ["spark", "hash"])
    plan = ex.physical_plan(df)
    # the 1-row stats side joins as a broadcast nested loop — the
    # correct plan for a scalar crossJoin (same shape as q22)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    ex.assert_max_shuffles(df, 1)  # the SinglePartition stats agg only
    top = search.bm25_search(tables["documents"], ["spark"], top_n=10)
    ex.assert_topk_not_global_sort(top)


def test_dp_session_heatmap_single_scan_broadcast_noise(spark, tables):
    """The composed private session (quantize -> filter -> noisy
    heatmap) stays one fact scan + one O(cells) groupBy shuffle;
    the noise spine joins in as a broadcast literal relation."""
    import __spark_entry__ as entry_mod

    df = entry_mod._dp_session_view(tables["lineitem"]).heatmap(
        "l_quantity", "l_discount", xb=5, yb=4
    )
    # 1 = the O(cells) groupBy; the 2nd is the presentation orderBy
    # range-exchange over the 20-row RESULT (O(cells), not O(rows))
    ex.assert_max_shuffles(df, 2)
    ex.assert_no_cartesian(df)
    assert "BroadcastHashJoin" in ex.physical_plan(df)


def test_dp_prefix_counts_single_count_shuffle(spark, tables):
    """The continual counter's data path is ONE groupBy shuffle for
    the hourly counts (the window prefix-sum reuses that
    partitioning); the O(windows x types) noise spine broadcasts."""
    from hillview_spark.streaming import events as ev

    df = ev.dp_prefix_counts(tables["events"], 1.0, seed=3)
    # two REAL exchanges, both over map-side-combined aggregate rows
    # (O(hours x types), never O(events)): the (hour, type) groupBy
    # and the re-key to (type) for the window prefix sum. The plan
    # string shows each twice — the persisted `cum` relation embeds
    # its build plan inside InMemoryRelation and the live DAG prints
    # it again — so the textual count is at most 4.
    ex.assert_no_cartesian(df)
    plan = ex.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert ex.count_shuffles(df) <= 4
    # and the noise spine must broadcast, never shuffle-join
    assert "BroadcastExchange" in plan


def test_media_dims_histogram_scale_profile(spark, tables):
    """Multimodal sketch shape: synthesize reads ONLY the id column
    (column pruning reaches the scan), probe runs in Arrow batches
    (ArrowEvalPython/mapInPandas, never row-python), and the
    histogram shuffles once on the tiny (kind, w, h) key after
    map-side partial aggregation."""
    from hillview_spark.functions import multimodal as mm

    df = mm.dims_histogram(mm.synthesize_media(tables["documents"]))
    ex.assert_column_pruning(
        df, expected=["doc_id"], forbidden=["text", "source", "lang"]
    )
    ex.assert_max_shuffles(df, 1)
    plan = ex.physical_plan(df)
    assert "BatchEvalPython" not in plan  # Arrow batches only
    assert "partial_count" in plan or "HashAggregate" in plan


def test_geo_polygon_counts_scale_profile(spark, tables):
    """Choropleth sketch shape: the ray-cast assignment is one Arrow
    map over a pruned 2-column scan, then a single O(|regions|)
    shuffle."""
    from hillview_spark.functions import geo

    import __spark_entry__ as entry_mod

    df = geo.count_by_region(
        tables["customer"], "c_acctbal", "c_nationkey",
        entry_mod.GEO_POLYGON_REGIONS,
    )
    ex.assert_column_pruning(
        df,
        expected=["c_acctbal", "c_nationkey"],
        forbidden=["c_name", "c_address", "c_phone"],
    )
    ex.assert_max_shuffles(df, 1)
    assert "BatchEvalPython" not in ex.physical_plan(df)


def test_cosine_topk_guard_is_hoisted_below_scoring(spark, tables):
    """r9 hoist regression pin (VERDICT r8 #4): the malformed-vector
    quarantine must be cheap array predicates on the INPUT column
    (forall/exists — no zip_with), never a Filter above the scoring
    Project that would re-evaluate the non-codegen dot-product fold.
    The old shape rendered `Filter … zip_with(…)`; the fixed plan has
    no Filter containing the fold at all, and ends in a top-k."""
    from hillview_spark.functions import similarity

    df = similarity.cosine_topk(tables["embeddings"], query_id=1, k=5)
    plan = ex.physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    bad = [
        ln for ln in plan.splitlines()
        if "Filter" in ln and "zip_with" in ln
    ]
    assert not bad, f"dot fold re-evaluated in a Filter: {bad[:1]}"


def test_r11_event_ops_plan_shapes(spark, tables):
    """r11 scale claims as plan assertions: the event analytics ops
    pre-aggregate (or pre-partition) so window machinery never sees
    raw-event-order state, and nothing falls back to a cartesian or
    per-row Python."""
    from hillview_spark.streaming import events as ev

    e = tables["events"]
    # anomaly: ONE groupBy shuffle + ONE window repartition, no joins
    df = ev.windowed_anomaly(e)
    ex.assert_max_shuffles(df, 2)
    ex.assert_no_cartesian(df)
    assert "Python" not in ex.physical_plan(df)
    # transitions: user partition + (from,to) aggregate, one sort
    df = ev.transition_counts(e)
    ex.assert_max_shuffles(df, 2)
    ex.assert_no_cartesian(df)
    assert "Python" not in ex.physical_plan(df)
    # retention (r15 one-shuffle rewrite): ONE corpus-scale shuffle
    # (groupBy(user) collect_set(day), map-side dedup) + the tiny
    # (cohort, offset) aggregate; no join, no persist, no Python —
    # the former distinct + first-seen aggregate + user join are gone
    df = ev.cohort_retention(e)
    plan = ex.physical_plan(df)
    ex.assert_max_shuffles(df, 2)
    ex.assert_no_cartesian(df)
    assert "Join" not in plan, plan[:500]
    assert "Python" not in plan


def test_collocations_plan_no_cartesian_data_joins(spark, tables):
    """The PMI join tree: corpus totals ride 1-row broadcast crosses
    (BroadcastNestedLoopJoin over a single aggregate row is fine);
    what must NEVER appear is a CartesianProduct or a non-broadcast
    nested loop over data-sized relations."""
    from hillview_spark.functions import text

    df = text.collocations(tables["documents"], min_count=2)
    plan = ex.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    # every nested-loop join must be a broadcast of a 1-row aggregate
    # (the nu/nb totals), never a shuffled loop join
    assert "ShuffledNestedLoop" not in plan

def test_rolling_actives_sketch_plan_shapes(spark, tables):
    """r12: the sketch-merged MAU sibling's scale claim as a plan
    assertion — the window explode must operate on the PERSISTED
    per-day sketch frame (InMemoryTableScan feeds Generate), never on
    user-level rows, and the whole plan stays JVM-side with no joins
    beyond the anchor semi-shape."""
    from hillview_spark.streaming import events as ev

    e = tables["events"]
    for exact in (True, False):
        df = ev.rolling_active_users_sketch(e, window_days=7, exact=exact)
        plan = ex.physical_plan(df)
        ex.assert_no_cartesian(df)
        assert "Python" not in plan
        # both consumers (explode + anchors) read the cached sketches
        assert plan.count("InMemoryTableScan") >= 2, plan[:500]
        # the explode's input is the aggregated frame: Generate sits
        # ABOVE the cache read, not above the parquet scan
        gen = plan.index("Generate")
        assert "InMemoryTableScan" in plan[gen:], plan[gen:gen + 400]


def test_dp_windowed_mean_single_shuffle(spark, tables):
    """r13: the continual MEAN release computes BOTH aggregates in
    the one groupBy shuffle (not a sum-release x count-release join);
    each cell's two noise draws are per-row expressions on the
    aggregate output — no second exchange, no cartesian, no Python."""
    from hillview_spark.streaming import events as ev

    df = ev.dp_windowed_mean(
        tables["events"], "hour", "value", lo=0.0, hi=250.0,
        epsilon=1.0, seed=3,
    )
    ex.assert_max_shuffles(df, 1)
    ex.assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_repeated_spans_inverted_index_no_cartesian(spark, tables):
    """r13: exact-substring dedup must keep the dedup-family shape —
    the seed discovery is ONE groupBy over positioned grams and the
    coverage mark-up an equi-join back (never all-pairs), the island
    merge a per-doc window; no cartesian anywhere, no Python."""
    from hillview_spark.functions import dedup

    df = dedup.repeated_spans(tables["documents"], n=5, min_sites=2)
    ex.assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    rm = dedup.remove_repeated_spans(tables["documents"], n=5, min_sites=2)
    ex.assert_no_cartesian(rm)
    # r15 de-skew (VERDICT-r14 What's-wrong #1): the keep-one exempt
    # site is min(struct(doc,pos)) folded into the detection's gram
    # aggregate — NO per-gm rank anywhere (a row_number window over
    # gm was a single-task sort on a hot boilerplate gram), and the
    # exemption costs zero extra shuffles vs keep='all'.
    ko = dedup.remove_repeated_spans(
        tables["documents"], n=5, min_sites=2, keep="first"
    )
    ex.assert_no_cartesian(ko)
    assert "row_number" not in ex.physical_plan(ko)
    assert ex.count_shuffles(ko) == ex.count_shuffles(rm)


def test_contamination_spans_broadcasts_eval_grams(spark, tables):
    """r13: the eval gram set must ride a broadcast semi-join when
    broadcast_eval=True (the decontaminate discipline), and the
    shuffle-join fallback must stay cartesian-free — in BOTH modes
    the train side is the inverted-index pipeline, never all-pairs."""
    from pyspark.sql import functions as F

    from hillview_spark.functions import dedup

    docs = tables["documents"]
    ev_docs = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    bc = dedup.contamination_spans(train, ev_docs, n=5)
    ex.assert_no_cartesian(bc)
    ex.assert_broadcast_joins(bc, at_least=1)
    sh = dedup.contamination_spans(
        train, ev_docs, n=5, broadcast_eval=False
    )
    ex.assert_no_cartesian(sh)
    assert "Python" not in ex.physical_plan(bc)
    # r14: the EDIT half inherits the same discipline — eval grams
    # broadcast, no cartesian, shuffle-fallback cartesian-free
    rm = dedup.remove_contaminated_spans(train, ev_docs, n=5)
    ex.assert_no_cartesian(rm)
    ex.assert_broadcast_joins(rm, at_least=1)
    rm_sh = dedup.remove_contaminated_spans(
        train, ev_docs, n=5, broadcast_eval=False
    )
    ex.assert_no_cartesian(rm_sh)


def test_dp_windowed_trending_single_shuffle_no_python(spark, tables):
    """r14: the continual unknown-domain release is ONE groupBy to
    O(windows x values) cells; noise and threshold are codegen'd
    expressions on the aggregate output — no join, no second
    exchange, no Python."""
    from hillview_spark.streaming import events as ev

    df = ev.dp_windowed_trending(
        tables["events"], unit="day", col="event_type",
        epsilon=1.0, delta=0.05, seed=7,
    )
    ex.assert_max_shuffles(df, 1)
    ex.assert_no_cartesian(df)
    assert "Python" not in ex.physical_plan(df)


def test_dp_active_users_single_shuffle_no_python(spark, tables):
    """r13: the stability histogram is ONE groupBy over the unknown
    domain; noise and threshold are codegen'd expressions on the
    aggregate output — no join, no second exchange, no Python."""
    from hillview_spark.operators import privacy

    df = privacy.dp_histogram_unknown_domain(
        tables["events"], "user_id", epsilon=1.0, delta=1e-14, seed=7
    )
    ex.assert_max_shuffles(df, 1)
    ex.assert_no_cartesian(df)
    assert "Python" not in ex.physical_plan(df)
