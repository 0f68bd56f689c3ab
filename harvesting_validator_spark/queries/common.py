"""Shared helpers for driver-contract queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def money(col) -> "F.Column":
    """Exact-decimal cast for currency math so SUM() is order-independent
    (double summation order varies across partitions/engines; decimal sums
    are exact, so Spark and the DuckDB oracle agree bit-for-bit)."""
    return F.col(col).cast("decimal(18,2)") if isinstance(col, str) else col.cast("decimal(18,2)")


def dround(col, scale: int = 6) -> "F.Column":
    return F.round(col.cast("double"), scale)


def md5_int(col) -> "F.Column":
    """First 8 hex chars of md5 -> bigint. DuckDB mirror:
    ('0x' || substr(md5(x), 1, 8))::BIGINT — verified identical."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def tokens(col="text") -> "F.Column":
    """Whitespace tokenization; DuckDB mirror: string_split(text, ' ')."""
    return F.split(F.col(col), " ")


def epoch_us(col="ts") -> "F.Column":
    """Epoch microseconds for a parquet TIMESTAMP_NTZ column. The session
    timezone is pinned to UTC (session.py), so NTZ -> TIMESTAMP is a
    no-op reinterpretation and matches DuckDB's naive epoch_us(ts)."""
    return F.unix_micros(F.col(col).cast("timestamp"))
