"""Edge-parity for the CORE sketch/map/curation families (round 9).

After the r9 exploration-family module, these were the largest gate-key
families whose oracle contracts had never been exercised off the
generated fixtures: the stats/distinct sketches, the filter maps, the
string/date histogram family, the spreadsheet find/convert/project
maps, the documents curation chain, and the lineitem range/interval
surfaces.  The campaign rule (every family probed for the first time
has found a divergence ~20% of the time: r7 orders_rollup, r8 CSV
trimming, r9 top_customers/part_type) says these stay unpinned at our
peril.

Same mechanics as test_oracle_edges_exploration: adversarial tables
written as PARQUET so the tests drive the gate's REAL closures
(entry queries()[key](spark, edge_dir)) against the REAL oracle_sql()
strings over the same files — no mirrored plans to drift.

Adversarial shapes per family:
- lineitem: NULL part keys / quantities / prices / dates, NaN and
  ±Inf quantity+price (finite-guard rule), -0.0 (filter-only; see the
  ±0.0 domain test below), negative order keys (systematic sampling's
  modulo sign), range-filter boundary values (exactly lo and hi), a
  1.5e15 price magnitude.  Identity keys (l_orderkey, l_linenumber)
  stay non-NULL: the sampled-coin contract is loud on NULL keys.
- orders/customer/part: the exploration module's shapes (non-finite
  prices, NULL keys/statuses/dates/types, unicode, padding) plus ''
  names/segments for the string-quantile rank surfaces.
- documents: near-dup shingle clusters, eval-split ids (%20==0),
  repeated cross-doc segments, ' value ' line-split texts, NBSP
  between regex tokens (\\s must NOT match U+00A0 in either engine),
  CJK + emoji text (no Latin case-mapping exotica — the case-folding
  oracle domain pins those separately), NULL/''/whitespace docs,
  case- and padding-distinct lang/source groups, a NULL source group.
- events: NULL and unicode event types, tied counts.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

import __spark_entry__ as entry_mod

_NAN, _INF = float("nan"), float("inf")
_TS = lambda y, m, d, h=8: datetime.datetime(y, m, d, h, 30)


def _lineitem_rows():
    flags = "NRA"
    stat = "OF"
    rows = []
    for i in range(24):
        # half the dates inside the range filter's 1996 window, half
        # outside; quantities sweep across the [10, 20] band
        year = 1996 if i % 2 == 0 else (1994 if i % 4 == 1 else 1997)
        rows.append(
            (
                i + 1,
                i % 8,
                i % 4,
                1 + i % 7,
                5.0 + 1.25 * i,
                900.0 + 211.5 * i,
                (i % 10) / 100.0,
                (i % 8) / 100.0,
                flags[i % 3],
                stat[i % 2],
                _TS(year, 1 + i % 12, 1 + i % 27),
            )
        )
    rows += [
        # NULLs in every non-identity column: excluded from distinct
        # counts, range filters, and min/max on BOTH engines
        (100, None, 0, 1, None, None, None, None, None, None, None),
        # non-finite quantity/price: missing under the finite rule —
        # never in a range-filter result, never a data-range extreme,
        # never a corr sample
        (101, 3, 1, 2, _NAN, _INF, 0.0, 0.0, "N", "O", _TS(1996, 6, 15)),
        (102, 3, 1, 3, -_INF, _NAN, 0.05, 0.01, "R", "F", _TS(1996, 6, 16)),
        # -0.0 quantity: filter-only here (not extremal: row 104's -5.0
        # is the min) — ±0.0 group/extreme representatives are outside
        # the oracle domain (test_negative_zero_value_domain)
        (103, 4, 2, 1, -0.0, -12.5, 0.0, 0.0, "A", "O", _TS(1995, 3, 3)),
        # boundary rows: range filters are INCLUSIVE at both ends on
        # both engines; 1.5e15 exercises magnitude without overflow
        (104, 4, 2, 2, -5.0, 1.5e15, 0.0, 0.0, "A", "F",
         datetime.datetime(1996, 1, 1, 0, 0, 0)),
        (105, 5, 3, 4, 20.0, 19999.99, 0.07, 0.02, "N", "O",
         datetime.datetime(1996, 12, 31, 0, 0, 0)),
        (106, 5, 3, 5, 10.0, 1000.0, 0.01, 0.0, "R", "F", _TS(1996, 7, 3)),
        # negative order keys: % keeps the dividend's sign on both
        # engines (-200 % 100 = 0 samples; -251 % 100 = -51 does not)
        (-200, 5, 3, 1, 10.0, 1000.0, 0.0, 0.0, "R", "F", _TS(1996, 7, 4)),
        (-251, 6, 3, 2, 15.0, 2.0, 0.0, 0.0, "N", "O", _TS(1996, 7, 5)),
    ]
    return rows


def _orders_rows():
    _D = lambda d: datetime.datetime(2024, 1 + (d % 12), 1 + (d % 27), 8, 30)
    rows = [
        (
            i,
            i % 7,
            ["O", "F", "P"][i % 3],
            round(100.0 + 37.5 * i, 2),
            _D(i),
            f"{i % 3}-PRIO",
        )
        for i in range(30)
    ]
    rows += [
        (100, 0, "O", _INF, _D(2), "0-PRIO"),
        (101, 1, "F", -_INF, _D(3), "1-PRIO"),
        (102, 2, "O", _NAN, _D(4), "2-PRIO"),
        (103, None, None, None, None, None),
        (104, 3, "F", 750.0, None, "1-PRIO"),
        # padded/unicode statuses and priorities: distinct raw groups,
        # and the bounded-histogram boundary comparisons see them
        # (' 0-PRIO\t' < '1' is excluded; '优先' > '5' lands in the
        # last bucket) in identical UTF-8 binary order on both engines
        (105, 4, " O ", 810.5, _D(5), " 0-PRIO\t"),
        (106, 5, "Ƒ", 920.25, _D(6), "优先-priority"),
        (107, 6, "O\nF", 1000.0, _D(7), 'say "go"'),
        (108, 6, "a,b", 0.0, _D(8), ""),
        # extreme proleptic-Gregorian dates truncate identically
        (109, 0, "O", 10.0, datetime.datetime(1, 1, 1, 0, 0, 0), "x"),
        (110, 1, "F", 11.0, datetime.datetime(1582, 10, 5, 12, 0), "x"),
        (111, 2, "O", 12.0,
         datetime.datetime(9999, 12, 31, 23, 59, 59, 999999), "x"),
        (112, 3, "F", 13.0,
         datetime.datetime(1969, 12, 31, 23, 59, 59, 999999), "x"),
    ]
    return rows


def _customer_rows():
    rows = [
        (i, f"Customer#{i:09d}", i % 5, round(1000.0 * i, 2), "BUILDING")
        for i in range(8)
    ]
    rows += [
        # '' sorts before every non-empty name in the quantile ranks;
        # padded/unicode names are distinct rank entries (no trimming)
        (8, "", 1, 10.0, ""),
        (9, "  padded name  ", 2, _NAN, "MACHINERY"),
        (10, "Ünïcode Client 七", 3, _INF, "AUTOMOBILE"),
        (11, None, 4, -_INF, None),  # NULL name: excluded from ranks
        (12, "zzz last", None, 0.0, "FURNITURE"),  # NULL nationkey
    ]
    return rows


def _part_rows():
    rows = [
        (
            i,
            f"part {i}",
            f"Brand#{i % 5}",
            ["ECONOMY BRUSHED", "STANDARD POLISHED", "LARGE PLATED"][i % 3],
            1 + i % 50,
            round(900.0 + 1.1 * i, 2),
        )
        for i in range(24)
    ]
    rows += [
        # non-finite prices: excluded from the singleton histogram's
        # range AND its buckets on both engines
        (100, "bad inf", "Brand#9", "ECONOMY BRUSHED", 3, _INF),
        (101, "bad -inf", "Brand#9", "STANDARD POLISHED", 4, -_INF),
        (102, "bad nan", "Brand#9", "LARGE PLATED", 5, _NAN),
        (103, "null type", "Brand#9", None, None, None),
        (104, "uni", "Brand#9", " ECONOMY BRUSHED ", 7, 500.0),
        (105, "uni2", "Brand#9", "磨光-TYPE", 8, 600.0),
        # an isolated price: a count-1 bucket whose singleton value
        # must surface identically
        (106, "lonely", "Brand#1", "LARGE PLATED", 9, 1500.0),
    ]
    return rows


_VOCAB = "spark merge the big agg join of the value table in a pass . "


def _documents_rows():
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    tail = "phi chi psi omega extra1 extra2 extra3 extra4 extra5 extra6"
    rows = [
        # near-dup shingle cluster: 1 == 2 exactly, 3 one token off,
        # 21 the shared 20-token prefix — LSH candidates, verify,
        # components, and representatives all see a real cluster
        (1, f"{base} {tail}", "en", "web", 300),
        (2, f"{base} {tail}", "en", "web", 300),
        (3, f"{base} {tail[:-7]} changed", "en", "web", 300),
        (21, base, "en", "web", 200),
        # eval-split docs (%20==0): doc 20 contaminates the cluster
        # via its shared leading 5-gram; doc 40 contaminates nothing
        (20, "alpha beta gamma delta epsilon unique eval suffix words",
         "en", "eval", 100),
        (40, "совершенно unrelated eval document nothing shared here at all",
         "ru", "eval", 100),
        # vocabulary mass: 'spark'/'merge'/stopwords cross the
        # term_count >= 5 bar; these also carry the quality-filter
        # stopword/punct signals and the find/set-operation hits
        (4, _VOCAB * 3, "en", "web", 250),
        (5, _VOCAB * 2 + "spark merge it is for the win .", "en", "web", 220),
        (6, "Spark MERGE shouting case hit for the contains filter and "
            "the agg join regex with the usual ten token floor klaxon",
         "en", "web", 150),
        (7, "agg   merge with multiple spaces between regex tokens and "
            "a lot of it to say about the quality of the gate",
         "en", "web", 140),
        (8, "aggjoin fused word must not match and agg join with a "
            "no-break space must not match \\s either engine agrees",
         "en", "web", 140),
        # line-cleaning shapes: ' value ' splits into lines; only
        # >=3-word punctuation-terminated lines survive
        (10, "one two three value four five six value seven eight.",
         "en", "news", 60),
        (11, "short value lines value here value everywhere", "en",
         "news", 50),
        # repeated cross-doc segment: docs 12/13 share their first
        # 10-token segment, so it is dropped for both
        (12, "common shared segment words one two three four five six "
             "unique tail for twelve here now", "en", "news", 120),
        (13, "common shared segment words one two three four five six "
             "different ending for thirteen instead", "en", "news", 120),
        # source 'web' already has > 5 docs: the per-group cap binds
        (14, "filler web doc to push the cap over the limit .", "en",
         "web", 60),
        (15, "another filler web doc for the cap group too .", "en",
         "web", 60),
        # edge rows: NULL / empty / whitespace text, CJK + emoji,
        # padding- and case-distinct lang/source, NULL source
        (30, None, None, "web", None),
        (31, "", "en", "src0", 0),
        (32, "   ", "EN", "src0", 3),
        (33, "优先 排序 文本 😀 emoji only tokens here", " en ", "src 0", 40),
        (34, "null source doc with the merge word inside it .", "", None, 50),
    ]
    return rows


def _events_rows():
    _D = lambda d: datetime.datetime(2024, 1 + (d % 12), 1 + (d % 27), 8, 30)
    rows = [
        (i, _D(i), i % 4, ["click", "view", "error"][i % 3], 1.0 * i, "{}")
        for i in range(21)
    ]
    rows += [
        (100, _D(1), None, None, 2.0, "{}"),        # NULL type: not IN
        (101, _D(2), 1, "视图", 1.0, None),          # unicode: not IN
        (102, None, 3, "click", _NAN, "{}"),         # NULL ts still counts
        (103, _D(3), 3, "purchase", None, "{}"),     # not in the IN list
    ]
    return rows


_SCHEMAS = {
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "orders": (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    ),
    "customer": (
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string"
    ),
    "part": (
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double"
    ),
    "documents": (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ),
    "events": (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    ),
}

_ROWS = {
    "lineitem": _lineitem_rows,
    "orders": _orders_rows,
    "customer": _customer_rows,
    "part": _part_rows,
    "documents": _documents_rows,
    "events": _events_rows,
}


@pytest.fixture(scope="module")
def core_edge_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("edge-core")
    for name, mk in _ROWS.items():
        df = spark.createDataFrame(mk(), _SCHEMAS[name])
        df.coalesce(1).write.mode("overwrite").parquet(
            str(base / f"{name}.parquet")
        )
    return str(base)


@pytest.fixture(scope="module")
def core_edge_con(core_edge_dir):
    con = duckdb.connect()
    for name in _ROWS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{core_edge_dir}/{name}.parquet/*.parquet')"
        )
    return con


_KEYS = [
    # lineitem: ranges, intervals, sampling, distinct, sampled corr
    "distinct_count",
    "range_filter",
    "range_filter_array",
    "interval_column",
    "data_range_interval",
    "systematic_sample",
    "corr_matrix_sampled",
    # orders: string/date histograms, conversion, summary/profile
    "histogram_string",
    "histogram_string_bounded",
    "histogram_date_month",
    "convert_column",
    "table_summary",
    "table_profile",
    # customer: rank/quantile boundary surfaces
    "row_quantiles",
    "string_quantiles",
    # part: singleton histogram, threshold, projection
    "histogram_singleton",
    "num_items_threshold",
    "project_columns",
    # documents: search/set/filter/curation/dedup chain
    "distinct_values",
    "set_operation",
    "string_filter_regex",
    "string_columns_filter",
    "find_substring",
    "text_vocab",
    "text_quality_filter",
    "corpus_clean_lines",
    "remove_repeated_segments",
    "corpus_cap_per_group",
    "decontaminate_train",
    "decontaminate_bloom",
    "dedup_components",
    "dedup_representatives",
    "dedup_lsh_verify",
    # events
    "exact_freq",
    # standalone DP keys (the composed DP sessions were edge-pinned in
    # r8; these are the per-mechanism keys): data values quantize onto
    # FIXED grids baked into the oracles, so out-of-range / NULL /
    # non-finite rows exercise the r8 exclusion rule, while the noise
    # spine is value-independent PRF math both engines re-derive
    "dp_histogram_quantity",
    "dp_cdf_quantity",
    "dp_quantiles_quantity",
    "dp_count_lineitem",
    "dp_distinct_custkey",
    "dp_histogram_mktsegment",
    "dp_windowed_counts",
    "dp_windowed_histogram",
    "dp_prefix_counts",
]


@pytest.mark.parametrize("key", _KEYS)
def test_core_family_matches_oracle_on_edges(
    spark, core_edge_dir, core_edge_con, key
):
    sdf = entry_mod.queries()[key](spark, core_edge_dir)
    cols = sorted(sdf.columns)
    got = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
    rel = core_edge_con.sql(entry_mod.oracle_sql()[key])
    dcols = list(rel.columns)
    assert sorted(dcols) == cols, f"{key}: column drift {dcols} vs {cols}"
    order = [dcols.index(c) for c in cols]
    want = sorted(
        repr(tuple(row[i] for i in order)) for row in rel.fetchall()
    )
    assert got == want, f"{key} diverged on the core edge tables"


def test_remove_repeated_segments_single_null_doc(spark, tmp_path):
    """A LONE NULL-text doc (no other empty-ish docs to share its ''
    segment with): Spark coalesces NULL->'' and keeps one ('', 1) row
    when the '' segment stays under min_df — the oracle must mirror
    that with coalesce(text,'') in its tk CTE. The main fixture can't
    see this: its three empty-ish docs (NULL/''/'   ') share the ''
    segment and all drop on both engines (r10 advice)."""
    rows = [
        (1, None, "en", "web", 10),
        (2, "totally unique words for document two here now ok fine",
         "en", "web", 20),
        (3, "other distinct text for document three goes right here yes",
         "en", "web", 30),
    ]
    base = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, _SCHEMAS["documents"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(base)
    sdf = entry_mod.queries()["remove_repeated_segments"](
        spark, str(tmp_path)
    )
    cols = sorted(sdf.columns)
    got = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
    # the NULL doc must SURVIVE with its single empty segment
    # (columns sorted: clean_text, doc_id, n_kept_segments)
    assert "('', 1, 1)" in got, got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{base}/*.parquet')"
    )
    rel = con.sql(entry_mod.oracle_sql()["remove_repeated_segments"])
    dcols = list(rel.columns)
    order = [dcols.index(c) for c in cols]
    want = sorted(
        repr(tuple(row[i] for i in order)) for row in rel.fetchall()
    )
    assert got == want


@pytest.fixture(scope="module")
def core_empty_dir(spark, tmp_path_factory):
    """The same six tables, zero rows — aggregation identities must
    agree: counts 0, moments/ranges NULL, bucket/noise spines still
    emit their full range (the DP oracles' k-adic draws and the
    singleton histogram's generate_series are data-independent),
    find_substring still reports one 0-count row, and everything
    row-shaped is empty-to-empty."""
    base = tmp_path_factory.mktemp("edge-core-empty")
    for name in _ROWS:
        spark.createDataFrame([], _SCHEMAS[name]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(base / f"{name}.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def core_empty_con(core_empty_dir):
    con = duckdb.connect()
    for name in _ROWS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{core_empty_dir}/{name}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("key", _KEYS)
def test_core_family_matches_oracle_on_empty_tables(
    spark, core_empty_dir, core_empty_con, key
):
    sdf = entry_mod.queries()[key](spark, core_empty_dir)
    cols = sorted(sdf.columns)
    got = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
    rel = core_empty_con.sql(entry_mod.oracle_sql()[key])
    dcols = list(rel.columns)
    order = [dcols.index(c) for c in cols]
    want = sorted(
        repr(tuple(row[i] for i in order)) for row in rel.fetchall()
    )
    assert got == want, f"{key} diverged on empty tables"


_DEGEN_KEYS = [
    # the keys whose math divides by a variance/spread — the r9
    # degenerate probes found Spark 4's builtin corr JOB-FATAL
    # (ANSI DIVIDE_BY_ZERO) on a constant column, and pca's old
    # `sd or 1.0` fallback fabricating 0.0 coordinates at n=1 where
    # the analytic oracle NULLs
    "corr_matrix",
    "corr_matrix_sampled",
    "pca_project",
    "jl_project",
    "category_centroids",
    "basic_col_stats",
    "quantiles_price",
    "histogram1d_numeric",
    "histogram_singleton",
    "data_range",
    "histogram_quantiles",
]


@pytest.fixture(
    scope="module", params=["constant", "single_row", "all_null"]
)
def degen_env(request, spark, tmp_path_factory):
    """Three degenerate shapes: every numeric column CONSTANT over 5
    rows (zero variance), exactly ONE row (undefined sample stddev),
    and ALL-NULL value columns with live identity keys (aggregates
    over zero present values). Same tables, written as parquet for
    the real closures. A broader probe ran ALL the core keys over
    the all-null shape divergence-free before this pin was cut to
    the variance family."""
    import datetime as _dt

    n = 1 if request.param == "single_row" else 5
    ts_li = _dt.datetime(1996, 6, 1, 8, 30)
    ts_o = _dt.datetime(2024, 1, 1, 8, 30)
    if request.param == "all_null":
        rows = {
            "lineitem": [
                (i, None, None, 1, None, None, None, None, None, None,
                 None)
                for i in range(1, n + 1)
            ],
            "orders": [
                (i, None, None, None, None, None) for i in range(1, n + 1)
            ],
            "customer": [
                (i, None, None, None, None) for i in range(1, n + 1)
            ],
            "part": [
                (i, None, None, None, None, None) for i in range(1, n + 1)
            ],
            "documents": [
                (i, None, None, None, None) for i in range(1, n + 1)
            ],
            "events": [
                (i, None, None, None, None, None) for i in range(1, n + 1)
            ],
        }
        base = tmp_path_factory.mktemp("edge-degen-all-null")
        for name, rs in rows.items():
            spark.createDataFrame(rs, _SCHEMAS[name]).coalesce(
                1
            ).write.mode("overwrite").parquet(str(base / f"{name}.parquet"))
        con = duckdb.connect()
        for name in rows:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM"
                f" read_parquet('{base}/{name}.parquet/*.parquet')"
            )
        return str(base), con
    rows = {
        "lineitem": [
            (i, 2, 3, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", ts_li)
            for i in range(1, n + 1)
        ],
        "orders": [
            (i, 1, "O", 100.0, ts_o, "1-PRIO") for i in range(1, n + 1)
        ],
        "customer": [
            (i, f"Customer#{i}", 1, 100.0, "BUILDING")
            for i in range(1, n + 1)
        ],
        "part": [
            (i, f"part {i}", "Brand#1", "ECONOMY BRUSHED", 5, 900.0)
            for i in range(1, n + 1)
        ],
        "documents": [
            (i, "alpha beta gamma", "en", "web", 20)
            for i in range(1, n + 1)
        ],
        "events": [
            (i, ts_o, 1, "click", 1.5, "{}") for i in range(1, n + 1)
        ],
    }
    base = tmp_path_factory.mktemp(f"edge-degen-{request.param}")
    for name, rs in rows.items():
        spark.createDataFrame(rs, _SCHEMAS[name]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(base / f"{name}.parquet"))
    con = duckdb.connect()
    for name in rows:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{base}/{name}.parquet/*.parquet')"
        )
    return str(base), con


@pytest.mark.parametrize("key", _DEGEN_KEYS)
def test_degenerate_inputs_match_oracle(spark, degen_env, key):
    degen_dir, con = degen_env
    sdf = entry_mod.queries()[key](spark, degen_dir)
    cols = sorted(sdf.columns)
    got = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
    rel = con.sql(entry_mod.oracle_sql()[key])
    dcols = list(rel.columns)
    order = [dcols.index(c) for c in cols]
    want = sorted(
        repr(tuple(row[i] for i in order)) for row in rel.fetchall()
    )
    assert got == want, f"{key} diverged on degenerate input"


def test_negative_zero_value_domain(spark):
    """±0.0 as a GROUP KEY / DISTINCT representative is outside the
    oracle value domain, and this test is the pin that documents why:
    Spark normalizes -0.0 to +0.0 in aggregation keys (SPARK-32110);
    DuckDB preserves the sign bit and reports whichever representative
    it saw.  COUNTS agree everywhere — only the rendered key differs —
    so the engine contract (README, value-domain contracts) is: group
    keys and min/max representatives are compared under -0.0 == +0.0;
    fixtures must not rely on the sign of zero surviving aggregation.
    """
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, -0.0), (2, 0.0), (3, 5.0)], "id long, x double"
    )
    [g] = [
        r
        for r in df.groupBy("x").agg(F.count(F.lit(1)).alias("c")).collect()
        if r.c == 2
    ]
    # Spark's normalized representative is +0.0…
    assert repr(g.x) == "0.0" and g.c == 2
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?,?)", [(1, -0.0), (2, 0.0), (3, 5.0)]
    )
    [(dx, dc)] = [
        r for r in con.sql("SELECT x, count(*) FROM t GROUP BY x").fetchall()
        if r[1] == 2
    ]
    # …DuckDB's is its first-seen -0.0: equal under ==, distinct repr
    assert dx == 0.0 and dc == 2 and repr(dx) == "-0.0"
