from component_delta_lake_writer_spark.streaming.structured import (
    stream_hourly_rollup,
)

__all__ = ["stream_hourly_rollup"]
