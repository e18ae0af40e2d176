"""Keboola base-type cast matrix (operator P2/F1).

The reference types staged data in a generated cast projection
``CAST(_cN AS {dtype}) AS {col_name}`` (src/component.py:196-204) over
an all-STRING staging table (src/component.py:138-139), using the
manifest base types STRING INTEGER NUMERIC FLOAT BOOLEAN DATE
TIMESTAMP (src/component.py:72). Spark-first equivalent: a
``df.select`` of ``col.cast(T).alias(name)`` — a narrow, codegen'd
projection Catalyst folds into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from component_delta_lake_writer_spark.config import ColumnSpec
from component_delta_lake_writer_spark.errors import UserException

_BASE_TYPES: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INTEGER": T.LongType(),
    "FLOAT": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
}


def base_type_to_spark(dtype: str, length: str | None = None) -> T.DataType:
    """Map a Keboola base dtype (+ optional NUMERIC precision) to Spark."""
    up = dtype.upper()
    if up == "NUMERIC":
        if length:
            parts = [p.strip() for p in length.split(",")]
            try:
                precision = int(parts[0])
                scale = int(parts[1]) if len(parts) > 1 else 0
            except ValueError:
                raise UserException(
                    f"Invalid NUMERIC length {length!r}: expected "
                    "'precision[,scale]'."
                ) from None
            if not (1 <= precision <= 38) or not (0 <= scale <= precision):
                raise UserException(
                    f"Invalid NUMERIC precision/scale {length!r}: "
                    "precision must be 1-38 and scale 0-precision."
                )
            return T.DecimalType(precision, scale)
        return T.DecimalType(38, 9)
    try:
        return _BASE_TYPES[up]
    except KeyError:
        raise UserException(f"Unknown base type: {dtype!r}") from None


def cast_projection(
    df: DataFrame,
    columns: list[ColumnSpec],
    positional: bool = True,
    keep: list[str] | None = None,
) -> DataFrame:
    """The typed view of staged data.

    ``positional=True`` mirrors the native path's ``_c0.._cN`` staging
    columns (src/component.py:200-204); ``False`` casts in place by
    name (the external path's typed read, src/component.py:72-78).
    ``keep`` passes extra columns through untouched (e.g. file-metadata
    bookkeeping for the preserve-order scan).
    """
    exprs: list[Column] = []
    for i, spec in enumerate(columns):
        src = F.col(f"_c{i}") if positional else F.col(spec.name)
        exprs.append(src.cast(base_type_to_spark(spec.dtype, spec.length)).alias(spec.name))
    for extra in keep or []:
        exprs.append(F.col(extra))
    return df.select(*exprs)


def schema_for(columns: list[ColumnSpec]) -> T.StructType:
    """Explicit StructType for a manifest column list — schema is law,
    never inferred (reference disables inference: src/component.py:77,168)."""
    return T.StructType(
        [
            T.StructField(c.name, base_type_to_spark(c.dtype, c.length), True)
            for c in columns
        ]
    )
