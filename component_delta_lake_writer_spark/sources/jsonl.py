"""JSON-lines source (S-family extension).

The reference's input surface is CSV/parquet staging (src/component.py:
69-81); large-scale training-data pipelines overwhelmingly ship raw
corpora as (gzipped) JSONL, so the engine treats it as a first-class
scan. Spark-first rules at 100 TB:

- **Explicit schema always** — schema inference is a full extra pass
  over the corpus before the real scan; at multi-TB that doubles the
  read. Callers pass the StructType (or ColumnSpec list via
  ``schema_for_columns``).
- **Multi-file + gzip transparently** — a directory of ``*.jsonl.gz``
  slices scans as one DataFrame; gzip slices are non-splittable, so at
  scale slice count = parallelism (same note as the CSV staging path).
- **Corrupt-record policy is explicit** — PERMISSIVE with a
  ``_corrupt_record`` column by default (training corpora always have
  some malformed rows; silently dropping them skews the mix), or
  DROPMALFORMED when the caller opts in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from component_delta_lake_writer_spark.config import ColumnSpec
from component_delta_lake_writer_spark.functions.cast import base_type_to_spark

CORRUPT_COL = "_corrupt_record"


def schema_for_columns(
    columns: list[ColumnSpec], with_corrupt_col: bool = True
) -> T.StructType:
    """Keboola base-dtype columns → JSONL read schema (same dtype map
    as the typed CSV scan, reference component.py:200-206)."""
    from component_delta_lake_writer_spark.functions.cast import schema_for

    fields = list(schema_for(columns).fields)
    if with_corrupt_col:
        fields.append(T.StructField(CORRUPT_COL, T.StringType(), nullable=True))
    return T.StructType(fields)


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    drop_malformed: bool = False,
) -> DataFrame:
    """Scan JSONL (optionally .gz) files under ``path`` with an
    explicit schema — no inference pass."""
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    reader = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    paths = path if isinstance(path, list) else [path]
    # pass the LIST: *unpacking binds the second path to the
    # `schema` positional of DataFrameReader.json (ParseException)
    return reader.json(paths)


def read_jsonl_typed(
    spark: SparkSession,
    path: str | list[str],
    columns: list[ColumnSpec],
    drop_malformed: bool = False,
) -> DataFrame:
    """Typed JSONL scan from manifest-style column specs; malformed
    rows surface in ``_corrupt_record`` unless dropped."""
    schema = schema_for_columns(columns, with_corrupt_col=not drop_malformed)
    df = read_jsonl(spark, path, schema, drop_malformed)
    return df
