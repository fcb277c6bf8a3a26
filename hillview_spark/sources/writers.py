"""Sinks — Hillview's SaveAsFileSketch / CsvFileWriter / OrcFileWriter
as Spark writers. Partitioned, distributed writes; the `partition_by`
columns become directory partitions so downstream scans prune."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Microsecond-lossless CSV timestamp patterns for the faithful-mode
# round-trip (write_csv/read_csv share them): Spark's defaults carry
# only .SSS, truncating the last three digits of Spark's
# microsecond-precision timestamps on write.
CSV_TS_NTZ_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
CSV_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    null_value: str | None = None,
    faithful_ts: bool | None = None,
) -> None:
    """CSV writer. Plain CSV cannot distinguish NULL from '' (both
    default to an empty cell) — pass null_value (e.g. the MySQL-
    convention '\\N') to write NULLs as a sentinel and '' as a quoted
    empty, making the write->read round-trip FAITHFUL for string
    columns when read_csv gets the same null_value. The residual
    ambiguity is a literal field equal to the sentinel (it reads back
    NULL); pick a sentinel outside the data domain. Embedded newlines
    are quoted per standard CSV either way — reading them back needs
    read_csv(multiline=True).

    The faithful combo also disables the writer's whitespace
    trimming: Spark's CSV WRITE options ignoreLeading/
    TrailingWhiteSpace default TRUE, so ' padded ' would silently
    write as 'padded' and the round-trip would corrupt exactly the
    strings it claims to preserve (the read side defaults to no
    trimming, so only the writer needs the override). It also pins
    MICROSECOND timestamp formats (r9 probe): Spark's default CSV
    timestamp patterns carry 3 fractional digits, so 23:59:59.999999
    silently came back .999000 — read_csv applies the same patterns
    so the round-trip is lossless at Spark's full timestamp
    precision.
    faithful_ts: write the strict microsecond timestamp patterns on
    their own (r10 advice — they rode null_value before). None
    (default) = on iff null_value is set; True/False = explicit.
    read_csv takes the same flag."""
    w = df.write.mode(mode).option("header", header)
    if null_value is not None:
        w = (
            w.option("nullValue", null_value)
            .option("emptyValue", '""')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
        )
    # faithful_ts decoupled from null_value (r10 advice, mirror of
    # read_csv): default None keeps the historical coupling; pass
    # True to write microsecond timestamps without a NULL sentinel
    if faithful_ts is None:
        faithful_ts = null_value is not None
    if faithful_ts:
        w = w.option("timestampFormat", CSV_TS_FORMAT).option(
            "timestampNTZFormat", CSV_TS_NTZ_FORMAT
        )
    w.csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
