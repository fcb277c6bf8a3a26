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

# Grok-style named pattern library for the common log shapes Hillview
# ships (storage/GrokLogs.java registers the grok default patterns
# plus resources/patterns/log-patterns: SYSLOG, HADOOP and its
# aliases, RFC5424; COMBINEDAPACHELOG comes from the grok defaults).
# Each entry: (java_regex, [field or "field:type", ...], ts_format).
# Types cast after extraction: int -> long, double -> double; the
# ts_raw field additionally parses to a `ts` TIMESTAMP column when
# ts_format is given (None = format not statically known).
LOG_PATTERNS = {
    # 2020-01-01 12:00:00,123 LEVEL [module] message (HillviewLogs.java)
    "hillview": (
        r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[.,]\d+)\s+(\w+)\s+\[([^\]]*)\]\s*(.*)$",
        ["ts_raw", "level", "module", "message"],
        None,  # separator varies (.|,) — normalize downstream
    ),
    # syslog-ish: Jan  1 12:00:00 host proc[pid]: message (%{SYSLOG})
    "syslog": (
        r"^(\w{3}\s+\d+\s+\d{2}:\d{2}:\d{2})\s+(\S+)\s+([^:\[]+)(?:\[(\d+)\])?:\s*(.*)$",
        ["ts_raw", "host", "proc", "pid:int", "message"],
        None,  # no year in syslog timestamps
    ),
    # %{HADOOP} (also DATANODELOG/HBASELOG/YARNLOG/OOZIELOG/
    # ZOOKEEPERLOG/HDFSNAMENODELOG/HDFSDATANODELOG aliases):
    # 2020-01-01 12:00:00,123 LEVEL message
    "hadoop": (
        r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})\s+"
        r"(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\s+(.*)$",
        ["ts_raw", "level", "message"],
        "yyyy-MM-dd HH:mm:ss,SSS",
    ),
    # grok default %{COMBINEDAPACHELOG}
    "apache_combined": (
        r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+)(?: HTTP/(\S+))?" '
        r'(\d{3}) (\S+) "([^"]*)" "([^"]*)"$',
        ["client_ip", "ident", "auth", "ts_raw", "verb", "request",
         "http_version", "response:int", "bytes:int", "referrer", "agent"],
        "dd/MMM/yyyy:HH:mm:ss Z",
    ),
    # RFC 5424 (resources/patterns/log-patterns %{RFC5424}):
    # <pri>version ISO8601 host app procid msgid sd message
    "rfc5424": (
        r"^<(\d{1,3})>(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) (\[.*\]|-)\s*(.*)$",
        ["priority:int", "version:int", "ts_raw", "hostname", "appname",
         "procid", "message_id", "structured_data", "message"],
        None,  # ISO8601 with offset — parsed via to_timestamp default
    ),
    # %{VSANTRACE} (log-patterns:VSANTRACE): ISO-T ts, [counter],
    # [cpuN], [op who what on other], command:line, {args}
    "vsantrace": (
        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+) \[(\d+)\]"
        r" \[cpu(\d+)\] \[([^\] ]+)(?: ([^\] ]+))?(?: ([^\] ]+))?"
        r"(?: ([^\] ]+))?(?: ([^\]]+))?\] ([^:]+:\d+): (\{.*\})$",
        ["ts_raw", "counter:int", "cpu:int", "operation", "who",
         "what", "on", "other", "command", "arguments"],
        None,  # ISO8601 — parsed via to_timestamp default
    ),
    # %{BLOCKTRACE} (blktrace output): dev major,minor cpu seq
    # rel-time pid ACTION OP [offset [+ size]] [process] extra
    "blocktrace": (
        r"^(\d+),(\d+)\s+(\d+)\s+(\d+)\s+(-?\d+\.\d+)\s+(\d+)\s+"
        r"([A-Z]+)\s+([A-Z]+)(?:\s+(\d+))?(?:\s+\+\s+(\d+))?\s+"
        r"(\[[^\]]*\])(.*)$",
        ["device_major:int", "device_minor:int", "cpu:int",
         "sequence:int", "time:double", "pid:int", "action", "op",
         "offset:int", "size:int", "process", "extra"],
        None,  # relative seconds, no wall-clock ts
    ),
    # %{NSXT_PROTON} / %{NSXT_PROXY}: ISO ts [host] - "VERB uri
    # HTTP/v" response bytes first second
    "nsxt_proton": (
        r'^(\S+) - "(?:(\w+) (\S+)(?: HTTP/(\S+))?|-)"'
        r"\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)$",
        ["ts_raw", "verb", "uri", "http_version", "response:int",
         "bytes:int", "first", "second"],
        None,  # ISO8601 with Z
    ),
    "nsxt_proxy": (
        r'^(\S+) (\S+) - "(?:(\w+) (\S+)(?: HTTP/(\S+))?|-)"'
        r"\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)$",
        ["ts_raw", "hostname", "verb", "uri", "http_version",
         "response:int", "bytes:int", "first", "second"],
        None,  # ISO8601 with Z
    ),
    # RFC3339-timestamped application logs:
    # 2020-01-01T12:00:00.123Z LEVEL logger message
    "app_rfc3339": (
        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2}))"
        r"\s+(\w+)\s+(\S+)\s+(.*)$",
        ["ts_raw", "level", "logger", "message"],
        None,  # ISO8601 — parsed via to_timestamp default
    ),
}

# The reference's pattern library names each Hadoop-family service
# log separately, all delegating to %{HADOOP}
# (platform/src/main/resources/patterns/log-patterns:19-25) — accept
# the same names so a Hillview user's pattern string works verbatim.
for _alias in (
    "datanodelog", "hbaselog", "yarnlog", "oozielog", "zookeeperlog",
    "hdfsnamenodelog", "hdfsdatanodelog",
):
    LOG_PATTERNS[_alias] = LOG_PATTERNS["hadoop"]

# Patterns whose ts_raw is ISO8601 and parses with Spark's default
# to_timestamp (no explicit format string needed).
_ISO_TS_PATTERNS = {
    "rfc5424", "app_rfc3339", "vsantrace", "nsxt_proton", "nsxt_proxy",
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
    keep_corrupt: bool | None = None,
    multiline: bool = False,
    null_value: str | None = None,
    faithful_ts: bool | None = None,
) -> DataFrame:
    """CSV with Hillview's tolerance: malformed rows are kept
    (PERMISSIVE) with a _corrupt_record column rather than failing
    the load — mirrors CsvFileLoader's parse-error counting.

    multiline=True parses quoted embedded newlines per standard CSV
    (without it a writer-quoted multi-line field SHREDS into garbage
    rows). The trade-off is real at scale: a multiLine file cannot be
    split on newlines, so each file parses as one stream — keep file
    sizes bounded, or keep embedded newlines out of 100-TB CSV.
    null_value: the NULL sentinel matching write_csv's (e.g. '\\N'),
    which lets '' and NULL round-trip distinctly.
    faithful_ts: parse timestamps with write_csv's strict
    microsecond patterns. None (default) = on iff null_value is set;
    pass True to read faithful-writer output without a NULL
    sentinel, False to force the generic Spark timestamp parse.

    keep_corrupt controls whether the _corrupt_record column appears
    in the RESULT. Default: yes on the inferred path (exploratory
    loads surface parse errors), no when the caller pinned a schema
    (the contract is "exactly the columns I declared"; malformed rows
    still come back as padded-NULL rows). Either way the column is in
    the READ schema — Spark only materializes it when the schema
    contains it, so dropping it afterwards is a projection, not a
    semantics change."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    # faithful_ts has its own flag (r10 advice): it was gated on
    # null_value, conflating two unrelated options — a caller
    # reading faithful-writer microsecond timestamps with
    # null_value=None had those columns misparsed as string. The
    # patterns are STRICT (fixed 6-digit fraction, 'T' separator),
    # so they cannot simply apply unconditionally — generic
    # 'yyyy-MM-dd HH:mm:ss' CSVs would stop parsing. Default None
    # keeps the historical coupling (faithful iff null_value set).
    if faithful_ts is None:
        faithful_ts = null_value is not None

    def _parse_options(r):
        # ONE copy of the parse-option block for the data reader AND
        # the inference pre-read below (r11 review): the r10 silent-
        # dtype-corruption bug was exactly these options drifting
        # between the two readers, and the faithful_ts change had to
        # edit both blocks in lockstep again — now it can't drift.
        if multiline:
            r = r.option("multiLine", True)
        if faithful_ts:
            from hillview_spark.sources.writers import (
                CSV_TS_FORMAT,
                CSV_TS_NTZ_FORMAT,
            )

            r = r.option("timestampFormat", CSV_TS_FORMAT).option(
                "timestampNTZFormat", CSV_TS_NTZ_FORMAT
            )
        if null_value is not None:
            r = r.option("nullValue", null_value)
        return r

    reader = _parse_options(reader)
    if schema:
        caller_declared = "_corrupt_record" in schema
        if not caller_declared:
            schema = schema + ", _corrupt_record string"
        df = reader.schema(schema).csv(path)
        if keep_corrupt or caller_declared:
            return df
        return df.drop("_corrupt_record")
    if infer:
        # the inference pre-read must carry the SAME parse options as
        # the data read (r10 review): without nullValue the sentinel
        # ('\\N') makes every nullable int/double column infer as
        # string (values then come back as strings — silent dtype
        # corruption), without multiLine a quoted embedded newline
        # shreds the inference rows, and without the faithful
        # timestamp formats 6-digit-microsecond columns infer as
        # string
        inf_reader = _parse_options(
            spark.read.option("header", header)
            .option("sep", delimiter)
            .option("inferSchema", True)
        )
        inferred = inf_reader.csv(path).schema
        from pyspark.sql.types import StringType, StructField, StructType

        full = StructType(
            [f for f in inferred.fields if f.name != "_corrupt_record"]
            + [StructField("_corrupt_record", StringType())]
        )
        df = reader.schema(full).csv(path)
        if keep_corrupt is False:
            return df.drop("_corrupt_record")
        return df
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
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(the numeric key range to split into partitions)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def dissect_lines(df: DataFrame, col: str, pattern: str) -> DataFrame:
    """Dissect a string column of log lines with a named LOG_PATTERNS
    entry (the reusable core of read_logs — works on any DataFrame,
    e.g. a Kafka value column or a parquet-stored raw-log table).
    Unparsed lines survive with parse_error=true and the raw line
    intact, mirroring Hillview's ParseErrorsSketch accounting. Typed
    fields (``name:int`` etc.) cast after extraction — a non-numeric
    capture (e.g. apache '-' bytes) becomes NULL, not a load failure;
    a `ts` TIMESTAMP column is derived from ts_raw when the
    pattern's format is known. All extraction is codegen'd
    regexp_extract — one scan, no UDF.

    Missing = NULL, uniformly: regexp_extract returns '' both for
    every group of an UNPARSED line and for an absent optional group
    of a parsed one, while typed fields became NULL through the cast
    — so '' leaked into string aggregates as a real category for
    exactly the rows whose numeric twin said NULL (the empty-token
    defect class, r10 review). Empty extractions are nullif'd to
    NULL on both engines (the DuckDB oracle mirrors with
    NULLIF(regexp_extract(...), ''))."""
    regex, fields, ts_format = LOG_PATTERNS[pattern]
    cols = []
    for i, spec in enumerate(fields):
        name, _, dtype = spec.partition(":")
        c = F.nullif(F.regexp_extract(F.col(col), regex, i + 1), F.lit(""))
        if dtype == "int":
            c = c.try_cast("long")
        elif dtype == "double":
            c = c.try_cast("double")
        cols.append(c.alias(name))
    parsed = df.select(
        F.col(col).alias("raw_line"),
        (~F.col(col).rlike(regex)).alias("parse_error"),
        *cols,
    )
    if ts_format is not None:
        parsed = parsed.withColumn(
            "ts", F.try_to_timestamp(F.col("ts_raw"), F.lit(ts_format))
        )
    elif pattern in _ISO_TS_PATTERNS:
        parsed = parsed.withColumn("ts", F.try_to_timestamp(F.col("ts_raw")))
    return parsed


def read_logs(spark: SparkSession, path: str, pattern: str = "hillview") -> DataFrame:
    """Regex-dissected log lines (GrokLogs): spark.read.text +
    dissect_lines with a named LOG_PATTERNS entry (hillview, syslog,
    hadoop, apache_combined, rfc5424, app_rfc3339)."""
    return dissect_lines(spark.read.text(path), "value", pattern)


def file_metadata(spark: SparkSession, path: str) -> DataFrame:
    """File listing with sizes (FileSizeSketch): uses Spark's
    input_file metadata over the matched files."""
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path"), F.col("length").alias("n_bytes"), F.col("modificationTime")
    )
