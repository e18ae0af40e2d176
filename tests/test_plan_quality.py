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


def test_q6_full_pushdown(spark):
    # all range predicates reach the scan; 4 of 11 columns read
    p = _plan(spark, "tpch_q6_revenue_filter")
    # the plan string truncates the filter list — assert it is
    # non-empty and range-bearing rather than matching every predicate
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    assert "GreaterThanOrEqual(l_shipda" in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m is not None and m.group(1).count(",") + 1 == 4


def test_q4_exists_plans_as_semi_join(spark):
    # the correlated EXISTS must decorrelate, not re-scan per row
    p = _plan(spark, "tpch_q4_exists_priority")
    assert "LeftSemi" in p


def test_q14_q18_broadcast_dims(spark):
    for key in ["tpch_q14_promo_share", "tpch_q18_large_orders"]:
        assert "BroadcastHashJoin" in _plan(spark, key), key


def test_correlated_min_single_shuffle(spark):
    # window decorrelation: one exchange (by l_partkey), no self-join
    p = _plan(spark, "correlated_min_price")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert p.count("Exchange") <= 2  # partkey hash + AQE read


def test_ivf_assignment_broadcasts_centroids(spark):
    # the n_cells centroid table must broadcast; vectors never shuffle
    # for assignment
    p = _plan(spark, "ann_ivf_topk")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
