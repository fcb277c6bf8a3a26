"""TableView facade: the Hillview UI interaction model — a stack of
derived views with sketches against the current view, fused by
Catalyst into single scans."""

from hillview_spark.api import TableView
from hillview_spark.plans import explain as ex


def test_get_spark_reasserts_semantic_confs(spark):
    """r11 session review: getOrCreate silently ignores every config
    when a session already exists, so get_spark() now re-asserts the
    two SEMANTIC confs (UTC session TZ — the instant mapping every
    oracle comparison assumes — and parquet nanosAsLong, without
    which events.parquet cannot load) on the session it actually got.
    Simulated here by perturbing the live session's TZ and calling
    get_spark() again."""
    from hillview_spark.session import get_spark

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        s = get_spark()
        assert s is spark
        assert s.conf.get("spark.sql.session.timeZone") == "UTC"
        assert s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_view_stack_fuses_into_one_scan(spark):
    t = TableView.parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    v = (
        t.filter_range("l_quantity", 5, 45)
        .filter_string("l_returnflag", "A", mode="exact")
        .with_column("revenue", "l_extendedprice * (1 - l_discount)")
        .project(["l_orderkey", "revenue", "l_quantity"])
    )
    plan = ex.physical_plan(v.df)
    assert plan.count("FileScan") == 1  # whole stack = one scan
    ex.assert_pushdown(v.df, ["l_quantity", "l_returnflag"])


def test_exploration_session(spark):
    t = TableView.parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    n_all = t.df.count()
    v = t.filter_range("l_quantity", 10, 20)
    n_view = v.df.count()
    assert 0 < n_view < n_all

    h = v.histogram("l_extendedprice", 20).collect()
    assert sum(r.cnt for r in h) == n_view

    page1 = v.page(["l_returnflag", "l_linestatus"], k=2)
    rows1 = page1.collect()
    assert len(rows1) == 2
    last = rows1[-1]
    # reference UI contract (NextKSketch.java:100-103): the anchor is
    # INCLUSIVE — page 2 starts with page 1's last row, then continues
    page2 = v.page(
        ["l_returnflag", "l_linestatus"], k=2,
        start=(last.l_returnflag, last.l_linestatus),
    ).collect()
    assert (page2[0].l_returnflag, page2[0].l_linestatus) == (
        last.l_returnflag, last.l_linestatus,
    )
    assert all(
        (r.l_returnflag, r.l_linestatus) >= (last.l_returnflag, last.l_linestatus)
        for r in page2
    )
    # inclusive=False composes strictly-after pagination
    page2x = v.page(
        ["l_returnflag", "l_linestatus"], k=2,
        start=(last.l_returnflag, last.l_linestatus), inclusive=False,
    ).collect()
    assert all(
        (r.l_returnflag, r.l_linestatus) > (last.l_returnflag, last.l_linestatus)
        for r in page2x
    )

    hh = v.heavy_hitters(["l_returnflag"], epsilon=0.2).collect()
    assert hh and all(r.cnt >= 0.2 * n_view for r in hh)


def test_set_ops_between_views(spark):
    t = TableView.parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    en = t.filter_string("lang", "en", mode="exact").project(["doc_id"])
    src0 = t.filter_string("source", "src0", mode="exact").project(["doc_id"])
    inter = en.intersect(src0).df.count()
    assert inter == t.df.where("lang = 'en' AND source = 'src0'").count()


def test_find_and_stats(spark):
    t = TableView.parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    assert t.find("text", "spark").first().match_count > 0
    s = t.col_stats(["n_chars"]).first()
    assert s.present_count == t.df.count()


def test_view_brush_search_quantize_scroll(spark, tables):
    from hillview_spark.api import TableView

    v = TableView(tables["lineitem"])
    brushed = v.brush([
        {"col": "l_quantity", "lo": 10, "hi": 30},
        {"col": "l_discount", "lo": 0.02, "hi": 0.05},
    ])
    assert 0 < brushed.df.count() < v.df.count()

    docs = TableView(tables["documents"])
    hits = docs.search(["text", "source"], "merge")
    assert hits.df.count() > 0

    qv = v.quantize("l_quantity", 0.0, 50.0, 10)
    qvals = {r.l_quantity for r in qv.df.select("l_quantity").distinct().collect()}
    assert qvals <= {i * 5.0 for i in range(10)}

    sq = v.scroll_quantiles(["l_returnflag", "l_linestatus"], 4)
    assert sq.count() >= 1


def test_every_query_key_has_an_oracle():
    """VERDICT-r6 directive #8: every queries() key must ship an
    oracle_sql() entry (full-hash, or declared rows+schema-only for
    iterative ops) and vice versa — an oracle-less key would silently
    bypass the driver's correctness gate."""
    import __spark_entry__ as entry_mod

    q, o = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert q == o, f"missing oracles: {sorted(q - o)}; orphans: {sorted(o - q)}"
