from component_delta_lake_writer_spark.functions.cast import (
    base_type_to_spark,
    cast_projection,
)

__all__ = ["base_type_to_spark", "cast_projection"]
