"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in
``component_delta_lake_writer_spark/plans/query_registry.py`` (SQL-
checkable operators) and ``plans/write_checks.py`` (write-path
rows-only probes + streaming); this module just adapts the registry
to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from component_delta_lake_writer_spark.plans import ORACLES, QUERIES  # noqa: E402


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """The driver owns the session; apply the runtime confs the engine
    needs (nanos events parquet, UTC timestamp semantics)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # INT96 writes no parquet min/max stats; MICROS restores timestamp
    # file skipping (replace_where_backfill asserts a pruned unit)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style agg_returnflag) on sf0.001."""
    return QUERIES["agg_returnflag"](_ensure_conf(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        return lambda spark, sf_dir: fn(_ensure_conf(spark), sf_dir)

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query key."""
    return dict(ORACLES)
