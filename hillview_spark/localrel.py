"""JVM-literal local relations: build a small DataFrame from driver
rows WITHOUT the Python-RDD scan `createDataFrame` plans.

`spark.createDataFrame(rows, schema)` wraps the rows in a Python RDD
(`applySchemaToPythonRDD` -> `Scan ExistingRDD`): every ACTION on any
plan containing it launches a Python worker round-trip just to
deserialize a handful of literal rows. For the noise spines /
candidate lists / spec relations that join into hot query paths this
tax is paid once per query execution — measured ~0.5 s per action on
the dp_histogram spine (10 rows!) at sf0.1, the single largest
non-compute cost in that query.

`local_df` instead plans `range(1) -> inline(array(named_struct...))`
— pure JVM literals, folded into whole-stage codegen, zero Python at
execution time. The WHOLE literal tree is shipped as ONE SQL
expression string (a single py4j call): a first cut that built the
tree from per-value `F.lit` Columns spent ~10 ms of py4j round-trips
PER ROW, which at a few hundred rows cost more than the Python-RDD
tax it removed (measured: dedup_corpus 2.1 s -> 5.6 s before this
rewrite).

Exactness: doubles are rendered with repr() and parsed back via
CAST(str AS DOUBLE) — Python repr emits the shortest string that
round-trips, and both engines parse with IEEE round-to-nearest, so
the bits are identical (the DP spines' oracle determinism rides on
this).

Past `max_cells` (measured crossover ~100-300 cells: JVM analysis of
the literal tree grows with cells while the alternatives are one
constant transfer) and for non-finite doubles (no SQL literal), the
rows ship as ONE pyarrow Table instead: `createDataFrame(pa.Table)`
plans a `LocalTableScan` — the batch crosses to the JVM once at
BUILD time and, like the literal path, no Python worker runs at
execution (measured on a 4000-row spine: 271 ms/action as a
Python-RDD scan vs 76-149 ms as LocalTableScan, plan build 766 ms
as literals vs 44 ms as Arrow). Arrow preserves None vs NaN and
exact double bits natively. Value types outside
None/bool/int/float/str and flat arrays thereof — and any Arrow
conversion failure — fall back to `createDataFrame`. Every path is
correct: this helper is a pure execution-shape swap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, ByteType, DataType, DoubleType, FloatType,
    IntegerType, LongType, ShortType, StringType, StructType,
)

try:
    import pyarrow as _pa
except ImportError:  # pragma: no cover - pyspark[sql] ships pyarrow
    _pa = None

_SCALAR_OK = (
    BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType,
)

# rows x fields budget for the inline-literal plan; above it the
# Arrow local table is the better engine (plan build grows with the
# literal tree; the Arrow batch is one constant-cost transfer)
MAX_CELLS = 256


def _supported(dt: DataType) -> bool:
    if isinstance(dt, _SCALAR_OK):
        return True
    if isinstance(dt, ArrayType):
        return isinstance(dt.elementType, _SCALAR_OK)
    return False


def _scalar_sql(v, dt: DataType) -> str | None:
    """SQL literal text for one scalar, or None if unrenderable."""
    s = dt.simpleString()
    if v is None:
        return f"CAST(NULL AS {s})"
    if isinstance(v, bool):
        if not isinstance(dt, BooleanType):
            return None
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        if isinstance(dt, (FloatType, DoubleType)):
            v = float(v)
        elif not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            return None
        else:
            return f"CAST({v} AS {s})"
    if isinstance(v, float):
        if not isinstance(dt, (FloatType, DoubleType)):
            return None
        if not math.isfinite(v):
            return None  # 'inf'/'nan' don't parse as SQL doubles
        # repr round-trips the exact IEEE bits through parse
        return f"CAST('{v!r}' AS {s})"
    if isinstance(v, str):
        if not isinstance(dt, StringType):
            return None
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    return None


def _value_sql(v, dt: DataType) -> str | None:
    if isinstance(dt, ArrayType):
        s = dt.simpleString()
        if v is None:
            return f"CAST(NULL AS {s})"
        if not isinstance(v, (list, tuple)):
            return None
        if len(v) == 0:
            return f"CAST(array() AS {s})"
        parts = [_scalar_sql(x, dt.elementType) for x in v]
        if any(p is None for p in parts):
            return None
        return "array(" + ", ".join(parts) + ")"
    return _scalar_sql(v, dt)


def _arrow_scalar_type(dt: DataType):
    if isinstance(dt, BooleanType):
        return _pa.bool_()
    if isinstance(dt, ByteType):
        return _pa.int8()
    if isinstance(dt, ShortType):
        return _pa.int16()
    if isinstance(dt, IntegerType):
        return _pa.int32()
    if isinstance(dt, LongType):
        return _pa.int64()
    if isinstance(dt, FloatType):
        return _pa.float32()
    if isinstance(dt, DoubleType):
        return _pa.float64()
    if isinstance(dt, StringType):
        return _pa.string()
    return None


def _arrow_df(spark: SparkSession, rows, st: StructType) -> DataFrame | None:
    """LocalTableScan relation via one pyarrow Table, or None when
    the types/values don't convert cleanly (caller falls back)."""
    if _pa is None:
        return None
    arrays, names = [], []
    try:
        for i, f in enumerate(st.fields):
            dt = f.dataType
            if isinstance(dt, ArrayType):
                at = _pa.list_(_arrow_scalar_type(dt.elementType))
            else:
                at = _arrow_scalar_type(dt)
            if at is None:
                return None
            arrays.append(_pa.array([r[i] for r in rows], type=at))
            names.append(f.name)
        return spark.createDataFrame(_pa.Table.from_arrays(arrays, names))
    except Exception:
        return None


def local_df(
    spark: SparkSession,
    rows,
    schema: str | StructType,
    max_cells: int = MAX_CELLS,
) -> DataFrame:
    """A DataFrame of literal `rows` (sequence of tuples/lists) with
    `schema` (DDL string or StructType): inline JVM literals when
    small and simple enough, an Arrow-fed LocalTableScan when larger
    but still simply typed, else createDataFrame. Row order is
    preserved on every path."""
    st = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    rows = list(rows)
    n_cells = len(rows) * len(st.fields)
    if n_cells == 0 or not all(
        _supported(f.dataType) for f in st.fields
    ) or any(len(r) != len(st.fields) for r in rows):
        return spark.createDataFrame(rows, st)
    if n_cells <= max_cells:
        struct_sqls = []
        for r in rows:
            parts = []
            for v, f in zip(r, st.fields):
                vs = _value_sql(v, f.dataType)
                if vs is None:
                    # unrenderable value (non-finite double):
                    # the Arrow path below handles it exactly
                    struct_sqls = None
                    break
                # field names are usually internal spine/spec
                # identifiers, but heavy_hitters_sampled routes USER
                # column names through here — escape them exactly
                # like _scalar_sql escapes string values (ADVICE r15:
                # a quote in a column name was a ParseException, and
                # a backslash silently renamed the field)
                nm = f.name.replace("\\", "\\\\").replace("'", "\\'")
                parts.append(f"'{nm}', {vs}")
            if struct_sqls is None:
                break
            struct_sqls.append("named_struct(" + ", ".join(parts) + ")")
        if struct_sqls is not None:
            expr = "inline(array(" + ", ".join(struct_sqls) + "))"
            return spark.range(0, 1, 1, 1).select(F.expr(expr))
    adf = _arrow_df(spark, rows, st)
    if adf is not None:
        return adf
    return spark.createDataFrame(rows, st)
