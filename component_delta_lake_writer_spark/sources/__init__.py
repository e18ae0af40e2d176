from component_delta_lake_writer_spark.sources.csv import (
    read_csv_all_string,
    read_csv_typed,
)
from component_delta_lake_writer_spark.sources.parquet import read_parquet
from component_delta_lake_writer_spark.sources.json_manifest import (
    read_manifest_urls,
)

__all__ = [
    "read_csv_all_string",
    "read_csv_typed",
    "read_parquet",
    "read_manifest_urls",
]
