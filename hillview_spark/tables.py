"""Table catalog over the driver-generated parquet star schema.

Mirrors Hillview's file-set loading (reference:
platform/src/main/java/org/hillview/storage/ParquetFileLoader.java)
but as plain ``spark.read.parquet`` so Catalyst gets column pruning
and predicate pushdown on the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS); Spark refuses it unless
        # nanos are read as long. Runtime-settable, so set it here
        # defensively — callers may hand us a vanilla SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long (see session.py). Keep
    # the exact nanos in <col>_ns and expose a micros timestamp under
    # the original name. Integer `div` (double division would lose
    # sub-µs precision at 1e18 nanos) and a TIMESTAMP_NTZ base (so
    # the wall-clock value is session-timezone-independent).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", ns_to_ntz("ts_ns")
        )
    return df


def ns_to_ntz(ns_col_name: str):
    """Epoch-nanos bigint → TIMESTAMP_NTZ at micros, exactly and
    independent of the session timezone. FLOOR division (via pmod),
    not bare `div`: `div` truncates toward zero, which would shift
    pre-epoch nanos up by as much as 1us (and put ts_ns = -1 exactly
    AT the epoch) — and would disagree with the streaming path's
    identical normalization (streaming/events.py)."""
    return F.expr(
        f"timestampadd(MICROSECOND,"
        f" ({ns_col_name} - pmod({ns_col_name}, 1000)) div 1000,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}
