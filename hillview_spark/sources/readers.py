"""Source loaders — the Hillview storage layer re-expressed as
Spark readers.

Reference semantics (platform/src/main/java/org/hillview/storage/):
- ParquetFileLoader.java → read_parquet
- CsvFileLoader.java (header/no-header, schema or inference,
  parse-error tolerance) → read_csv
- JsonFileLoader.java → read_json
- OrcFileLoader.java → read_orc
- jdbc/* → read_jdbc
- GrokLogs.java / HillviewLogs.java (regex-dissected log lines with
  a parse-errors column) → read_logs

Every reader returns a plain DataFrame so Catalyst pushdown/pruning
applies; Hillview's "lazy column loading" is exactly parquet/ORC
column pruning, which Spark does natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Grok-ish patterns for the common log shapes Hillview ships
# (GrokLogs.java registers %{SYSLOG}, %{RFC5424}, hillview's own).
LOG_PATTERNS = {
    # 2020-01-01 12:00:00,123 LEVEL [module] message
    "hillview": (
        r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[.,]\d+)\s+(\w+)\s+\[([^\]]*)\]\s*(.*)$",
        ["ts_raw", "level", "module", "message"],
    ),
    # syslog-ish: Jan  1 12:00:00 host proc[pid]: message
    "syslog": (
        r"^(\w{3}\s+\d+\s+\d{2}:\d{2}:\d{2})\s+(\S+)\s+([^:\[]+)(?:\[(\d+)\])?:\s*(.*)$",
        ["ts_raw", "host", "proc", "pid", "message"],
    ),
}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    infer: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with Hillview's tolerance: malformed rows are kept
    (PERMISSIVE) with a _corrupt_record column rather than failing
    the load — mirrors CsvFileLoader's parse-error counting."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """Federated table load (storage/jdbc). Partitioned reads split
    the table across executors on a numeric key — the Spark-native
    version of Hillview's per-worker JDBC sharding."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_logs(spark: SparkSession, path: str, pattern: str = "hillview") -> DataFrame:
    """Regex-dissected log lines (GrokLogs): unparsed lines survive
    with parse_error=true and the raw line intact, mirroring
    Hillview's ParseErrorsSketch accounting."""
    regex, fields = LOG_PATTERNS[pattern]
    lines = spark.read.text(path)
    cols = [
        F.regexp_extract(F.col("value"), regex, i + 1).alias(name)
        for i, name in enumerate(fields)
    ]
    parsed = lines.select(
        F.col("value").alias("raw_line"),
        (~F.col("value").rlike(regex)).alias("parse_error"),
        *cols,
    )
    return parsed


def file_metadata(spark: SparkSession, path: str) -> DataFrame:
    """File listing with sizes (FileSizeSketch): uses Spark's
    input_file metadata over the matched files."""
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path"), F.col("length").alias("n_bytes"), F.col("modificationTime")
    )
