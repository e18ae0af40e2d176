"""Tests for the runner (E1/E2), actions (E3), and stateful streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_stateful_stream_equals_batch_sessionize(spark):
    """The applyInPandasWithState sessionizer must produce exactly the
    batch window-function result (Structured Streaming unification)."""
    from component_delta_lake_writer_spark.operators.sessions import session_stats
    from component_delta_lake_writer_spark.streaming.stateful import (
        stream_sessionize,
    )
    from component_delta_lake_writer_spark.tables import load_table

    batch = session_stats(load_table(spark, SF_SMALL, "events"), gap_seconds=1800)
    stream = stream_sessionize(spark, SF_SMALL, gap_seconds=1800)
    cols = ["user_id", "session_id", "n_events", "start_us", "end_us"]
    b = sorted(tuple(r) for r in batch.select(*cols).collect())
    s = sorted(tuple(r) for r in stream.select(*cols).collect())
    assert b == s


def test_actions_dispatch(spark):
    from component_delta_lake_writer_spark.actions import execute_action
    from component_delta_lake_writer_spark.errors import UserException
    from component_delta_lake_writer_spark.tables import register_views

    register_views(spark, SF_SMALL)
    tables = {r.value for r in execute_action(spark, "list_uc_tables").collect()}
    assert {"orders", "lineitem", "events"} <= tables
    cols = execute_action(spark, "list_table_columns", table="orders").collect()
    assert any(r.value == "o_orderkey" for r in cols)
    with pytest.raises(UserException):
        execute_action(spark, "bogus_action")


def test_runner_validation(spark, tmp_path):
    from component_delta_lake_writer_spark.config import (
        Destination,
        JobSpec,
        LoadMode,
    )
    from component_delta_lake_writer_spark.errors import UserException
    from component_delta_lake_writer_spark.runner import FileInput, run_job

    spec = JobSpec(
        destination=Destination(
            table_uri=str(tmp_path / "t"), load_mode=LoadMode.UPSERT
        )
    )
    with pytest.raises(UserException):  # upsert without PK
        run_job(spark, spec, files=FileInput(paths=[f"{SF_SMALL}/orders.parquet"]))


def test_runner_files_path(spark, tmp_path):
    from component_delta_lake_writer_spark.config import (
        Destination,
        JobSpec,
        LoadMode,
    )
    from component_delta_lake_writer_spark.runner import FileInput, run_job

    spec = JobSpec(
        destination=Destination(
            table_uri=str(tmp_path / "t"), load_mode=LoadMode.OVERWRITE
        )
    )
    t = run_job(
        spark, spec, files=FileInput(paths=[f"{SF_SMALL}/orders.parquet"])
    )
    assert t.read().count() == 1500
