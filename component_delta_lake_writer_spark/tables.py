"""Loaders for the driver's synthetic tables (TESTDATA.md).

One place to normalize physical quirks so every operator sees clean,
oracle-comparable types:

- ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark cannot read
  natively; the session reads it as int64 ns (``nanosAsLong``) and we
  expose both ``ts`` (TIMESTAMP_NTZ at microsecond precision — what
  DuckDB sees after its silent ns→µs truncation) and ``ts_us``
  (exact int64 microseconds, the safe arithmetic form).
- all timestamps stay NTZ (naive) so collected values are identical
  to DuckDB's regardless of driver-host timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts_us", F.expr("ts DIV 1000")).withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all synthetic tables as temp views for SQL-spelled plans."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
