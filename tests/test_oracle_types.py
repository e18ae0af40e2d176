"""Fast sweep: every registered oracle must bind in DuckDB with output
types the driver's canonicalizer can hash.

The driver's pandas-side value hasher diverges on DECIMAL (round-1
finding, Spark side — screened by ``assert_no_decimal_output``) and on
HUGEINT/int128 (round-4 finding: ``dq_expectations_audit``, the only
HUGEINT-output oracle of 201, was the only hash-fail).  This sweep is
the oracle-side screen that makes a third member of the class
impossible: DuckDB binds (but does not execute) each oracle and we
assert no HUGEINT/UHUGEINT/DECIMAL output column exists.
"""

from __future__ import annotations

import pytest

from component_delta_lake_writer_spark.plans import ORACLES
from tests.oracle import assert_oracle_hashable_types, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


def test_all_oracles_bind_with_hashable_types(con):
    bad = []
    for key, sql in ORACLES.items():
        try:
            rel = con.sql(sql)
            assert_oracle_hashable_types(rel, key)
        except AssertionError as e:
            bad.append(str(e))
    assert not bad, "\n".join(bad)
