"""Plan-quality regression tests: the physical plans the 100 TB
posture depends on must not silently regress (SURVEY §4 / build
brief 'optimize for scale — concretely')."""

from __future__ import annotations

import re

from conftest import SF_SMALL


def _plan(spark, key: str) -> str:
    from component_delta_lake_writer_spark.plans import QUERIES

    df = QUERIES[key](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_pushdown_and_pruning(spark):
    p = _plan(spark, "parquet_scan")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m is not None
    # 4-column projection out of an 11-column table must reach the scan
    assert m.group(1).count(",") + 1 == 4


def test_dim_joins_broadcast(spark):
    for key in ["join_inner_pk", "tpch_q3_shipping_priority", "tpch_q5_region_volume"]:
        p = _plan(spark, key)
        assert "BroadcastHashJoin" in p, key


def test_topk_uses_take_ordered(spark):
    for key in ["sort_limit_topk", "tpch_q3_shipping_priority"]:
        assert "TakeOrderedAndProject" in _plan(spark, key), key


def test_agg_has_partial_phase(spark):
    # map-side partial aggregation before the shuffle
    p = _plan(spark, "agg_returnflag")
    assert p.count("HashAggregate") >= 2


def test_merge_broadcasts_source_keys(spark):
    p = _plan(spark, "merge_upsert")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_whole_stage_codegen_active(spark):
    import contextlib
    import io

    from component_delta_lake_writer_spark.plans import QUERIES

    df = QUERIES["agg_returnflag"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()
