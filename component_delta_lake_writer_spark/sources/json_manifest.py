"""JSON manifest scan (operator S3 + projection P3).

Reference: ``FROM read_json('s3://…/manifest')`` reads the slice
manifest (a JSON document whose ``entries`` is a list of structs with
a ``url`` field) and projects the URLs with a list comprehension
(src/component.py:275-279).

Spark-first: ``spark.read.json`` with an explicit schema (inference
off — schema is law per SURVEY §1.2), ``explode`` the entries array,
project ``url``. On a cluster this runs as a distributed scan even
for many manifests at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField(
            "entries",
            T.ArrayType(
                T.StructType([T.StructField("url", T.StringType(), True)])
            ),
            True,
        )
    ]
)


def read_manifest_urls(spark: SparkSession, path: str) -> DataFrame:
    """Returns a one-column ``url`` DataFrame, in manifest order."""
    return (
        spark.read.schema(MANIFEST_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .select(F.explode("entries").alias("e"))
        .select(F.col("e.url").alias("url"))
    )
