"""CSV scans (operators S1 + the all-string staging read of E2).

Reference behavior being re-expressed:
- S1 typed scan: ``read_csv([urls], column_names=…, dtypes=…)`` over
  header-less CSV slices (src/component.py:75-78) — explicit schema,
  inference disabled.
- staging read: every column STRING (src/component.py:138-139), typing
  deferred to the cast projection (src/component.py:196-204).

Spark-first: ``spark.read.schema(...).csv(paths)`` — the schema
reaches the scan (no inference pass over 100 TB), and the downstream
cast/select projection is pruned+pushed by Catalyst. Multi-file slice
lists map to the reader's multi-path form, preserving the reference's
``FILES = (…)`` exact-subset semantics (src/component.py:160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from component_delta_lake_writer_spark.config import ColumnSpec
from component_delta_lake_writer_spark.functions.cast import schema_for


def read_csv_typed(
    spark: SparkSession,
    paths: list[str] | str,
    columns: list[ColumnSpec],
    header: bool = False,
    delimiter: str = ",",
    quote: str = '"',
) -> DataFrame:
    """S1: explicit-schema CSV scan; never infers."""
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.schema(schema_for(columns))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("sep", delimiter)
        .option("quote", quote)
        # RFC-4180 doubled-quote escaping ("" inside a quoted field),
        # the convention of the reference's CSV stack — Spark's default
        # is backslash-escape, which silently mis-parses such fields.
        .option("escape", quote)
        .csv(paths)
    )


def read_csv_all_string(
    spark: SparkSession,
    paths: list[str] | str,
    n_columns: int,
    header: bool = False,
    delimiter: str = ",",
    quote: str = '"',
) -> DataFrame:
    """E2 staging read: positional ``_c0.._cN`` all-STRING columns."""
    if isinstance(paths, str):
        paths = [paths]
    schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(n_columns)]
    )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("quote", quote)
        .option("escape", quote)  # RFC-4180, see read_csv_typed
        .csv(paths)
    )
