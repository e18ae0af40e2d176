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


def test_vacuity_guard_rejects_planted_empty_probe(spark, con):
    """The r10 judge found four probes whose oracle returned 0 rows at
    probe scale — green rows that certified only empty == empty.  The
    guard in oracle.compare must FAIL such a probe unless the key is
    explicitly registered empty_ok."""
    from tests.oracle import compare

    df = spark.range(0).selectExpr("CAST(id AS BIGINT) AS c_custkey")
    empty_sql = "SELECT c_custkey FROM customer WHERE FALSE"
    with pytest.raises(AssertionError, match="VACUOUS"):
        compare(df, con, empty_sql, "planted_empty_probe")
    # the escape hatch: an explicit empty_ok marker admits emptiness
    compare(df, con, empty_sql, "planted_empty_probe", empty_ok=True)


def test_no_oracle_is_vacuous_at_probe_scale(con):
    """Registry-wide vacuity sweep: every oracle must return at least
    one row at sf0.001 (the pytest probe scale) unless registered
    empty_ok.  Skips oracles that reference scratch tables the probe
    builds at run time (they cannot bind against the bare views)."""
    from component_delta_lake_writer_spark.plans import EMPTY_OK

    import duckdb

    vacuous = []
    broken = []
    for key, sql in ORACLES.items():
        if key in EMPTY_OK:
            continue
        try:
            n = len(con.sql(f"SELECT 1 FROM ({sql}) LIMIT 1").fetchall())
        except duckdb.CatalogException:
            # binds only against probe-built scratch state (missing
            # TABLE) — the one legitimate skip class.  Anything else
            # (BinderException from a renamed column, a parse error
            # from a typo) is a BROKEN oracle and must fail the sweep,
            # not silently read as green (r11 advice).
            continue
        except Exception as exc:  # noqa: BLE001 — collected, asserted
            broken.append(f"{key}: {type(exc).__name__}: {exc}")
            continue
        if n == 0:
            vacuous.append(key)
    assert not broken, (
        "oracles raising non-catalog errors at sf0.001 "
        f"(broken, not scratch-bound): {broken}"
    )
    assert not vacuous, (
        f"oracles returning 0 rows at sf0.001 (vacuous probes): {vacuous}"
    )
