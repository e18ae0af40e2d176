from component_delta_lake_writer_spark.plans.query_registry import (
    ORACLES,
    QUERIES,
    query,
)
from component_delta_lake_writer_spark.plans import write_checks  # noqa: F401  (registers)
from component_delta_lake_writer_spark.plans import extra_queries  # noqa: F401  (registers)

__all__ = ["QUERIES", "ORACLES", "query"]
