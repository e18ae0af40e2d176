from component_delta_lake_writer_spark.operators.merge import merge_upsert

__all__ = ["merge_upsert"]
