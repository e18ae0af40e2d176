"""Differential tests: every oracle-backed query key vs DuckDB at
sf0.001 (fast mirror of the driver's sf0.01 gate), rows-only keys
smoke-checked for non-failure + stable schema."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL


def _registry():
    from component_delta_lake_writer_spark.plans import ORACLES, QUERIES

    return QUERIES, ORACLES


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(spark, oracle_con, key):
    from oracle import compare

    compare(QUERIES[key](spark, SF_SMALL), oracle_con, ORACLES[key], key)


def test_every_key_has_an_oracle():
    """Invariant since round 3: no rows-only keys — every registered
    query carries a DuckDB oracle (the driver's strongest gate)."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
