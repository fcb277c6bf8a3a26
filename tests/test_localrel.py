"""localrel.local_df: the JVM-literal local-relation helper (r15
optimization round). Contract: BIT-IDENTICAL rows to createDataFrame
for every supported input, a plan with zero Python at execution
time when the literal path fires, and a silent createDataFrame
fallback everywhere else."""

import datetime
import math
import struct

import pytest

from hillview_spark.localrel import local_df


@pytest.fixture(scope="module")
def spark():
    from hillview_spark.session import get_spark

    s = get_spark(master="local[2]", shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _bits(x):
    return struct.pack("d", x) if isinstance(x, float) else x


def test_identity_with_createdataframe(spark):
    rows = [
        (0, -6.626677895188479e-05, None, "a'b\\c\nd", True),
        (1, 1.7976931348623157e308, 5.0, "", False),
        (2, -0.0, math.pi, None, None),
    ]
    ddl = "i int, x double, y double, s string, b boolean"
    a, b = _rows(local_df(spark, rows, ddl)), _rows(
        spark.createDataFrame(rows, ddl)
    )
    assert [[_bits(v) for v in r] for r in a] == [
        [_bits(v) for v in r] for r in b
    ]


def test_array_fields_and_order(spark):
    rows = [([1.5, -2.25e-300, 0.0],), ([],), (None,)]
    ddl = "arr array<double>"
    assert _rows(local_df(spark, rows, ddl)) == _rows(
        spark.createDataFrame(rows, ddl)
    )
    # row order must be preserved (spines rely on it pre-orderBy)
    many = [(i, float(i) / 7) for i in range(40)]
    got = _rows(local_df(spark, many, "i int, v double"))
    assert got == many


def test_literal_plan_has_no_python_scan(spark):
    df = local_df(spark, [(1, 2.0)], "i int, v double")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" not in plan
    assert "EvalPython" not in plan
    # the createDataFrame path (what the fallback uses) DOES carry one
    cdf = spark.createDataFrame([(1, 2.0)], "i int, v double")
    cplan = cdf._sc._jvm.PythonSQLUtils.explainString(
        cdf._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" in cplan


def test_fallbacks_are_correct(spark):
    # unsupported type (timestamp) -> fallback, still correct
    ts = datetime.datetime(2020, 1, 2, 3, 4, 5)
    rows = [(ts, 1)]
    got = _rows(local_df(spark, rows, "t timestamp_ntz, i int"))
    assert got == [(ts, 1)]
    # non-finite double -> Arrow path (no SQL literal), bits intact
    rows = [(float("nan"),), (float("inf"),)]
    got = _rows(local_df(spark, rows, "x double"))
    assert math.isnan(got[0][0]) and math.isinf(got[1][0])
    # over the cell budget -> Arrow path, rows and order intact
    many = [(i,) for i in range(50)]
    got = _rows(local_df(spark, many, "i bigint", max_cells=10))
    assert got == many
    # empty -> fallback with intact schema
    empty = local_df(spark, [], "a int, b string")
    assert empty.columns == ["a", "b"] and empty.count() == 0


def test_arrow_path_identity_and_plan(spark):
    # past max_cells with mixed NULL/NaN/strings/arrays: the Arrow
    # local table must match createDataFrame bit-for-bit AND plan as
    # LocalTableScan (no Python-RDD scan at execution)
    rows = [
        (i, float(i) / 7 if i % 5 else float("nan"),
         None if i % 7 == 0 else f"s'{i}\\x",
         None if i % 11 == 0 else [i * 0.5, None, -0.0])
        for i in range(200)
    ]
    ddl = "i int, x double, s string, arr array<double>"
    a = _rows(local_df(spark, rows, ddl, max_cells=10))
    b = _rows(spark.createDataFrame(rows, ddl))
    def bits(r):
        return [
            [None if v is None else _bits(v) for v in c]
            if isinstance(c, list) else _bits(c) if isinstance(c, float)
            else c
            for c in r
        ]
    assert [bits(r) for r in a] == [bits(r) for r in b]
    df = local_df(spark, rows, ddl, max_cells=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" not in plan and "EvalPython" not in plan
    assert "LocalTableScan" in plan
    # schema types survive the Arrow round-trip exactly
    assert df.schema == spark.createDataFrame(rows, ddl).schema


def test_hostile_field_names_on_literal_path(spark):
    # ADVICE r15: via heavy_hitters_sampled the struct field names
    # come from USER column schemas — a quote used to be a
    # ParseException and a backslash silently renamed the field
    # (e.g. 'a'||'b' concatenated). Names must round-trip exactly
    # on the literal path.
    from pyspark.sql.types import StructField, StructType, IntegerType

    names = ["a'b", "c\\d", "e'':\\'f", "plain"]
    st = StructType([StructField(n, IntegerType()) for n in names])
    df = local_df(spark, [(1, 2, 3, 4), (5, 6, 7, 8)], st)
    assert df.columns == names
    assert _rows(df) == [(1, 2, 3, 4), (5, 6, 7, 8)]
    # still the literal plan (not a fallback that hides the bug)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ExistingRDD" not in plan and "EvalPython" not in plan


def test_exact_freq_still_nullsafe(spark):
    # exact_freq routes its candidate list through local_df; the None
    # candidate (NULL match) must survive the literal path
    from hillview_spark.operators import heavy_hitters as hh

    df = spark.createDataFrame(
        [("x",), (None,), (None,), ("y",)], "v string"
    )
    out = {r.value: r.cnt for r in hh.exact_freq(df, "v", ["x", None, "z"]).collect()}
    assert out == {"x": 1, None: 2, "z": 0}
