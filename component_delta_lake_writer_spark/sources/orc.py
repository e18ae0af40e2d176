"""ORC source/sink (S-family extension).

The reference stages CSV/parquet only (src/component.py:69-81), but a
drop-in engine meets corpora where they live — ORC is the other
columnar format common in Hadoop-era lakes. Spark's ORC support is
native (vectorized reader, predicate pushdown via ORC bloom/min-max
stripes, column pruning), so this is a thin declarative wrapper: the
value is the probe proving filters reach the ORC scan just like
parquet's PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """Multi-file ORC scan; pass ``schema`` to skip footer inference
    on wide directories (same rule as every other scan here)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    paths = path if isinstance(path, list) else [path]
    # pass the LIST: *unpacking binds the second path to the
    # `mergeSchema` positional of DataFrameReader.orc
    return reader.orc(paths)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "zstd"
) -> None:
    """ORC write (zstd default — ORC's native zlib is slower at the
    same ratio on modern cores)."""
    df.write.mode(mode).option("compression", compression).orc(path)
