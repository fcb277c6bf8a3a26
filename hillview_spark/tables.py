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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long (see session.py). Keep
    # the exact nanos in <col>_ns and expose a micros timestamp under
    # the original name — Spark's native resolution.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}
