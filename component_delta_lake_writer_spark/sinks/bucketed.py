"""Bucketed table layout: shuffle-free co-located joins and
pre-sorted scans.

100 TB posture (build brief "Partitioning & shuffle"; SURVEY §4): the
reference delegates physical layout to Databricks (reference
component.py:210-214 only forwards PARTITIONED BY). On Spark, hash
bucketing is the layout tool that removes the per-query shuffle for
repeated large-table equi-joins: both sides bucketed by the join key
into the same bucket count join bucket-to-bucket with NO Exchange —
at 100 TB that's the difference between an hourly pipeline re-paying
a full-fact shuffle per run and reading co-located files.

Bucketed tables must live in the session catalog (bucket metadata is
catalog state, not parquet state), so this sink uses saveAsTable
against the session warehouse rather than ManagedTable's path-based
commit log — the two layouts serve different lifetimes: ManagedTable
for ACID append/upsert streams, bucketed tables for reused join-heavy
analytics layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. Sorting within buckets additionally removes the per-query
    sort of a sort-merge join (Spark reads bucket files pre-sorted)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans a SortMergeJoin whose
    children read bucket files directly — zero Exchange operators
    (asserted by tests/test_plan_quality.py). At cluster scale each
    task reads bucket i of both sides: co-located, shuffle-free.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on, how)
