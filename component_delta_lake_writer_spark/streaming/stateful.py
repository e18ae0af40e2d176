"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (SURVEY §2.7 / build brief: custom stateful
operators on Structured Streaming).

State per user = the open session (last event time, session counter,
event count, session start); each micro-batch folds its events into
the state, emits every session it saw (closed ones finally, the open
one as an update — output mode ``update``). With an availableNow
drain of a static source this yields exactly the batch sessionizer's
result, which the tests assert.

Scale posture: state is O(users), keyed and partitioned by user_id by
the streaming engine; per-batch work is Arrow-batched pandas. On a
live source add a watermark + ``GroupStateTimeout.EventTimeTimeout``
to close idle sessions and evict state.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)
STATE_SCHEMA = "last_ts long, session_id long, n_events long, start_us long"


def _sessionize_group(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t) for t in pdf["ts_us"])
        ts_list.sort()

        if state.exists:
            last_ts, session_id, n_events, start_us = state.get
        else:
            last_ts, session_id, n_events, start_us = None, 0, 0, None

        out: list[tuple[int, int, int, int, int]] = []
        for t in ts_list:
            if last_ts is None or (t - last_ts) > gap_us:
                if last_ts is not None:
                    out.append((user_id, session_id, n_events, start_us, last_ts))
                session_id += 1
                n_events = 0
                start_us = t
            n_events += 1
            last_ts = t
        if last_ts is not None:
            # the (still open) current session, emitted as an update
            out.append((user_id, session_id, n_events, start_us, last_ts))

        state.update((last_ts, session_id, n_events, start_us))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "n_events", "start_us", "end_us"]
        )

    return fn


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_seconds: int = 1800,
    state_partitions: int | None = None,
) -> DataFrame:
    """availableNow drain of the events feed through the stateful
    sessionizer; returns the materialized session table.

    ``state_partitions`` sizes the state store (see
    structured.scoped_state_partitions) — each state partition costs a
    state-store commit plus one Arrow worker per micro-batch, so local
    drains want single digits while a real cluster wants hundreds."""
    from component_delta_lake_writer_spark.streaming.structured import (
        _stage_events_dir,
        scoped_state_partitions,
    )

    src_dir = _stage_events_dir(sf_dir)
    schema = spark.read.parquet(os.path.join(src_dir, "events.parquet")).schema
    from component_delta_lake_writer_spark.tables import ts_us_expr

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(src_dir)
        .withColumn("ts_us", ts_us_expr(schema["ts"].dataType.simpleString()))
        .select("user_id", "ts_us")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group(gap_seconds * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from component_delta_lake_writer_spark.streaming.structured import (
        _drain_to_memory,
        _tag,
    )

    return _drain_to_memory(
        spark, sessions, f"stream_sessions_{_tag(sf_dir)}", "update",
        state_partitions,
    )
