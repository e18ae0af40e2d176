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


def test_connected_components_matches_union_find(spark):
    from component_delta_lake_writer_spark.operators.clusters import dedup_clusters
    from component_delta_lake_writer_spark.operators.dedup import minhash_dedup
    from component_delta_lake_writer_spark.tables import load_table

    pairs_df = minhash_dedup(
        load_table(spark, SF_SMALL, "documents"), threshold=0.5
    )
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_df.collect()]
    got = {
        r["id"]: r["keep_id"] for r in dedup_clusters(pairs_df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_salted_join_equals_plain_join(spark):
    from component_delta_lake_writer_spark.operators.skew import salted_join
    from component_delta_lake_writer_spark.tables import load_table

    o = load_table(spark, SF_SMALL, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    c = load_table(spark, SF_SMALL, "customer")
    plain = o.join(c, "c_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, "c_custkey").select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_optimize_cluster_by_layout(spark, tmp_path):
    from component_delta_lake_writer_spark.sinks import ManagedTable
    from component_delta_lake_writer_spark.tables import load_table

    t = ManagedTable(spark, str(tmp_path / "t"))
    li = load_table(spark, SF_SMALL, "lineitem")
    t.write(li, mode="overwrite")
    t.optimize(cluster_by=["l_orderkey"])
    assert t.read().count() == li.count()
    # clustered layout: each file's l_orderkey range is tight/disjoint
    import pyarrow.parquet as pq
    import os, glob

    unit = t.latest_commit().data_units[0]
    files = glob.glob(os.path.join(t.path, "_data", unit, "*.parquet"))
    ranges = []
    for f in files:
        tbl = pq.read_table(f, columns=["l_orderkey"])
        col = tbl["l_orderkey"].to_pylist()
        if col:
            ranges.append((min(col), max(col)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint ranges → file skipping works
