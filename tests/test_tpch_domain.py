"""Enforce the TPC-H oracle-domain exemption (r10, VERDICT-r9 #3).

The 22 TPC-H gate queries are deliberately BENCHMARK-VERBATIM: unlike
every other oracle family they carry no finite-guards or NULL-key
defenses, on the declared premise (README "oracle domain" note) that
the TPC-H fixture is spec-shaped — every numeric column finite, every
join/sort/group key and date NOT NULL. Until r10 that premise was
asserted, not enforced; this test checks it against the real gate
parquet, turning the only undefended edge-campaign exemption into a
verified fact. If a future testdata regeneration breaks the premise,
this fails loudly instead of the gate hash-diverging mysteriously.

DuckDB scans (no Spark session): the premise is a property of the
fixture bytes, and the whole sweep is milliseconds at the gate SF.
"""

from __future__ import annotations

import os

import duckdb
import pytest

GATE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# every column the 22 TPC-H oracles aggregate, divide by, join on,
# group by, or sort on — one entry per table: (not-null cols,
# finite double cols). NOT NULL subsumes finiteness for keys/dates/
# strings; doubles additionally need isfinite.
_DOMAIN = {
    "lineitem": (
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ),
    "orders": (
        [
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
        ["o_totalprice"],
    ),
    "part": (
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
         "p_retailprice"],
        ["p_retailprice"],
    ),
    "customer": (
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
         "c_mktsegment"],
        ["c_acctbal"],
    ),
    "supplier": (
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        ["s_acctbal"],
    ),
    "nation": (["n_nationkey", "n_name", "n_regionkey"], []),
    "region": (["r_regionkey", "r_name"], []),
}


@pytest.mark.parametrize("table", sorted(_DOMAIN))
def test_tpch_fixture_satisfies_declared_domain(table):
    path = os.path.join(GATE_SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no {table} at {GATE_SF_DIR}")
    notnull, finite = _DOMAIN[table]
    checks = [
        f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}"
        for c in notnull
    ] + [
        f"SUM(CASE WHEN NOT isfinite({c}) THEN 1 ELSE 0 END) AS fin_{c}"
        for c in finite
    ]
    row = duckdb.sql(
        f"SELECT {', '.join(checks)} FROM '{path}'"
    ).fetchone()
    bad = {
        name: v
        for name, v in zip(
            [f"null:{c}" for c in notnull]
            + [f"nonfinite:{c}" for c in finite],
            row,
        )
        # COUNT(*)=0 table: SUMs are NULL — vacuously in-domain
        if v
    }
    assert not bad, (
        f"{table} at {GATE_SF_DIR} violates the declared TPC-H oracle "
        f"domain (benchmark-verbatim premise): {bad}"
    )


def test_tpch_fixture_keys_unique():
    """Every TPC-H oracle joins facts to these tables on their key; a
    duplicate key would silently double-count the join. lineitem is
    deliberately NOT here: the synthetic fixture carries no lineitem
    row identity ((l_orderkey, l_linenumber) duplicates exist) and no
    oracle assumes one — lineitem is only ever aggregated."""
    for table, key in [
        ("orders", "(o_orderkey)"),
        ("part", "(p_partkey)"),
        ("customer", "(c_custkey)"),
        ("supplier", "(s_suppkey)"),
        ("nation", "(n_nationkey)"),
        ("region", "(r_regionkey)"),
    ]:
        path = os.path.join(GATE_SF_DIR, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        n, d = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT {key}) FROM '{path}'"
        ).fetchone()
        assert n == d, f"{table}: {n} rows but {d} distinct {key}"
