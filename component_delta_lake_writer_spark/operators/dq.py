"""Data-quality audits — the expectations layer a load pipeline runs
before/after a write (dbt tests / Deequ / Delta Live Tables
expectations, Spark-first).

The reference's writer trusts its input (validation is schema-level
only, ``/root/reference/src/component.py:38-48``); at 100 TB the
audits below are the difference between a bad batch caught at commit
time and a corrupted downstream training run. All three are single
aggregation passes or broadcast/shuffle anti-joins — no row ever
reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key tuples appearing more than once: (keys..., n_rows). The
    check behind an informational PRIMARY KEY (OSS Delta does not
    enforce PKs either — this is the audit that makes the metadata
    honest). One map-side-combinable groupBy."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: dict[str, str]
) -> DataFrame:
    """Child rows whose foreign key has no parent (orphans), as the
    distinct violating key tuples + occurrence counts. Anti-join on
    the FK columns; Spark broadcasts the parent key set when small,
    else shuffles both sides on the key — either way no O(n²)."""
    pk_cols = [parent[v].alias(k) for k, v in fk.items()]
    parent_keys = parent.select(*pk_cols).distinct()
    # simple-match FK semantics: a child key with any NULL component
    # is not a violation
    non_null = F.lit(True)
    for k in fk:
        non_null = non_null & F.col(k).isNotNull()
    child_keys = child.select(*[F.col(k) for k in fk]).filter(non_null)
    return (
        child_keys.join(parent_keys, list(fk), "left_anti")
        .groupBy(*fk)
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def expectations_summary(
    df: DataFrame, rules: dict[str, str]
) -> DataFrame:
    """Evaluate named boolean SQL expectations in ONE pass: each rule
    contributes a conditional count of violating rows (NULL results
    count as violations, SQL-ternary like CHECK constraints). Output:
    (check_name, n_violations, n_rows) — long format, one aggregation
    job regardless of rule count."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")] + [
        F.sum(
            F.when(
                ~F.coalesce(F.expr(expr), F.lit(False)), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias(f"__v_{i}")
        for i, expr in enumerate(rules.values())
    ]
    row = df.agg(*aggs)
    # one explode over the single aggregated row — NOT a union of N
    # projections, which would re-run the aggregation once per rule
    structs = [
        F.struct(
            F.lit(name).alias("check_name"),
            F.col(f"__v_{i}").cast("long").alias("n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        for i, name in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
