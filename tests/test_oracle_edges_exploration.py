"""Edge-parity for the EXPLORATION query family (round 9).

The r8 probe found the only two divergences of the round exactly here:
`top_customers_revenue` and `part_type_stats` crashed their DuckDB
oracles on non-finite doubles (naked CAST(x AS DECIMAL(18,2))) — the
same class orders_rollup had in r7. This module closes the whole
family: adversarial orders/customer/part (Inf/NaN prices, NULL keys /
statuses / dates / types, unicode, whitespace-padded strings) written
as PARQUET so the tests drive the gate's REAL closures
(entry queries()[key](spark, edge_dir)) against the REAL oracle_sql()
strings over the same files — no mirrored plans to drift.

Covers the five exploration keys + orders_rollup + csv_roundtrip_orders
(directive #3), so every member of the family stays pinned.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

import __spark_entry__ as entry_mod

_D = lambda d: datetime.datetime(2024, 1 + (d % 12), 1 + (d % 27), 8, 30)

_NAN, _INF = float("nan"), float("inf")


def _orders_rows():
    rows = [
        (
            i,
            i % 7,  # joins onto customer c_custkey 0..6
            ["O", "F", "P"][i % 3],
            round(100.0 + 37.5 * i, 2),
            _D(i),
            f"{i % 3}-PRIO",
        )
        for i in range(30)
    ]
    rows += [
        # non-finite totalprice: MISSING under the engine-wide finite
        # rule — must not crash either engine's DECIMAL cast or poison
        # the customer-revenue sums (the r8 probe bug)
        (100, 0, "O", _INF, _D(2), "0-PRIO"),
        (101, 1, "F", -_INF, _D(3), "1-PRIO"),
        (102, 2, "O", _NAN, _D(4), "2-PRIO"),
        # NULLs in every non-key column; NULL custkey never joins
        (103, None, None, None, None, None),
        # NULL date: a NULL month_start group of its own
        (104, 3, "F", 750.0, None, "1-PRIO"),
        # unicode + whitespace-padded status/priority survive grouping
        # and the CSV faithful round-trip unmangled
        (105, 4, " O ", 810.5, _D(5), " 0-PRIO\t"),
        (106, 5, "Ƒ", 920.25, _D(6), "优先-priority"),
        # embedded newline, quote, comma: the CSV writer must quote
        # these; '' must round-trip as '' (not NULL) in faithful mode.
        # A literal field EQUAL to the '\N' sentinel is the writer's
        # one documented ambiguity (write_csv docstring) — pinned
        # separately in test_csv_sentinel_collision_reads_null below.
        (107, 6, "O\nF", 1000.0, _D(7), 'say "go"'),
        (108, 6, "a,b", 0.0, _D(8), ""),
        # extreme timestamps (r9 probe: both engines truncate
        # proleptic-Gregorian identically, incl. inside the 1582 gap)
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
        for i in range(7)
    ]
    rows += [
        # customers with no orders; unicode/whitespace names group
        # as distinct keys (no trimming anywhere in the engine)
        (7, "Ünïcode Client 七", 1, 0.0, "AUTOMOBILE"),
        (8, "  padded name  ", 2, _NAN, "MACHINERY"),
        (9, None, 3, _INF, None),  # NULL name still groups by custkey
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
        # non-finite retailprice: excluded from sum_price, still
        # COUNTed in n_parts (present-vs-finite distinction)
        (100, "bad inf", "Brand#9", "ECONOMY BRUSHED", 3, _INF),
        (101, "bad -inf", "Brand#9", "STANDARD POLISHED", 4, -_INF),
        (102, "bad nan", "Brand#9", "LARGE PLATED", 5, _NAN),
        # NULL type is its own group; NULL size/price are skipped by
        # min/max/sum but counted by COUNT(*)
        (103, "null type", "Brand#9", None, None, None),
        # unicode + padded type strings are distinct groups
        (104, "uni", "Brand#9", " ECONOMY BRUSHED ", 7, 500.0),
        (105, "uni2", "Brand#9", "磨光-TYPE", 8, 600.0),
    ]
    return rows


def _events_rows():
    rows = [
        (i, _D(i), i % 4, "click", 1.0 * i, "{}")
        for i in range(20)
    ]
    rows += [
        # NULL user_id is a real group in GROUP BY on both engines
        (100, _D(1), None, "view", 2.0, "{}"),
        (101, _D(2), None, "view", _NAN, None),
        # heavy user 3 w/ NULL ts rows: topk counts rows, not times
        (102, None, 3, "purchase", _INF, "{}"),
        (103, None, 3, "purchase", None, "{}"),
    ]
    return rows


def _documents_rows():
    rows = [
        (i, f"doc text {i}", ["en", "de", "fr"][i % 3],
         f"src{i % 2}", 10 + i)
        for i in range(12)
    ]
    rows += [
        (100, None, None, None, None),      # all-NULL metadata group
        (101, "", "en", "src0", 0),         # empty text still counted
        (102, "dup", "EN", "src0", 3),      # case-distinct lang group
        (103, "uni", " en ", "src 0", 3),   # padded groups stay distinct
    ]
    return rows


_SCHEMAS = {
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
    "events": (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    ),
    "documents": (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ),
}

_ROWS = {
    "orders": _orders_rows,
    "customer": _customer_rows,
    "part": _part_rows,
    "events": _events_rows,
    "documents": _documents_rows,
}


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    """Edge tables as parquet, one file per table, so the gate's real
    closures (which read parquet via _t) run unmodified."""
    base = tmp_path_factory.mktemp("edge-exploration")
    for name, mk in _ROWS.items():
        df = spark.createDataFrame(mk(), _SCHEMAS[name])
        df.coalesce(1).write.mode("overwrite").parquet(
            str(base / f"{name}.parquet")
        )
    return str(base)


@pytest.fixture(scope="module")
def edge_expl_con(edge_dir):
    con = duckdb.connect()
    for name in _ROWS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{edge_dir}/{name}.parquet/*.parquet')"
        )
    return con


_KEYS = [
    "top_customers_revenue",
    "part_type_stats",
    "events_user_topk",
    "docs_source_lang_matrix",
    "orders_status_by_month",
    "orders_rollup",
    "csv_roundtrip_orders",
]


@pytest.mark.parametrize("key", _KEYS)
def test_exploration_family_matches_oracle_on_edges(
    spark, edge_dir, edge_expl_con, key
):
    sdf = entry_mod.queries()[key](spark, edge_dir)
    cols = sorted(sdf.columns)
    got = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
    rel = edge_expl_con.sql(entry_mod.oracle_sql()[key])
    dcols = list(rel.columns)
    assert sorted(dcols) == cols, f"{key}: column drift {dcols} vs {cols}"
    order = [dcols.index(c) for c in cols]
    want = sorted(
        repr(tuple(row[i] for i in order)) for row in rel.fetchall()
    )
    assert got == want, f"{key} diverged on the exploration edge tables"


def test_csv_sentinel_collision_reads_null(spark, tmp_path):
    # The ONE documented faithful-mode ambiguity (write_csv
    # docstring): a literal field equal to the '\N' null sentinel
    # reads back as NULL. Pin it so a future "fix" that silently
    # changes the contract (e.g. re-escaping the sentinel and thereby
    # altering the written bytes) shows up here.
    from hillview_spark.sources import readers, writers

    df = spark.createDataFrame(
        [(1, "\\N"), (2, None), (3, "ok")], "id long, s string"
    )
    path = str(tmp_path / "sentinel_csv")
    writers.write_csv(df, path, null_value="\\N")
    back = readers.read_csv(
        spark, path, schema="id long, s string", multiline=True,
        null_value="\\N",
    )
    got = {r.id: r.s for r in back.collect()}
    assert got == {1: None, 2: None, 3: "ok"}
