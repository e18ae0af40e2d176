"""Parquet scan (operator S2).

Reference: ``conn.read_parquet(files_paths)`` over N local files as a
single relation (src/component.py:79-81); schema comes from the
footer, passed through untouched.

Spark-first: ``spark.read.parquet(*paths)`` — vectorized reader,
column pruning + predicate pushdown into the footer/row-group level
for free. ``merge_schema`` surfaces the reader-side union-of-schemas
for heterogeneous file sets (reference requires one shared schema;
we're strictly more capable but default to its behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(
    spark: SparkSession,
    paths: list[str] | str,
    merge_schema: bool = False,
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated synthetic table (TESTDATA.md)."""
    return spark.read.parquet(table_path(sf_dir, name))
