"""PySpark-native analytics engine with the capability surface of
keboola/component-delta-lake-writer, rebuilt Spark-first.

The reference (see /root/reference, ~556 LoC Python) composes DuckDB
(local scans), delta-rs (Delta writes) and a Databricks SQL warehouse
(generated DDL/DML). This engine replaces all three with one
SparkSession: declarative DataFrame/SQL plans optimized by Catalyst,
a managed Parquet table layer with an ACID-ish JSON commit log for the
load modes (error | append | overwrite | upsert), and an extension
surface of large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming).
"""

from component_delta_lake_writer_spark.session import get_spark, stop_spark
from component_delta_lake_writer_spark.errors import UserException

__all__ = ["get_spark", "stop_spark", "UserException"]
__version__ = "0.1.0"
