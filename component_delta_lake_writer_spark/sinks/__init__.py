from component_delta_lake_writer_spark.sinks.managed_table import ManagedTable

__all__ = ["ManagedTable"]
