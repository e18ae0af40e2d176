"""Incrementally-maintained materialized aggregates over ManagedTable.

The continuous-aggregate shape (Timescale continuous aggregates,
Databricks materialized views, Flink upsert sinks): a grouped
count/sum rollup whose refresh cost tracks the CHANGES since the last
refresh, not the source size — at 100 TB the difference between a
per-batch O(delta-groups) upsert and a full recompute.

Mechanics: the source table's change data feed supplies signed deltas
(+1 for ``insert``/``update_postimage``, −1 for ``update_preimage`` —
pre-images require the source table property
``changeDataFeedPreImages``; append-only ranges need no pre-images at
all). Deltas aggregate to per-group adjustments, join against the
CURRENT values of just those groups, and merge back via the ordinary
PK upsert. Groups whose count reaches zero stay as tombstone rows
(n_rows = 0) filtered at read time — strictly O(delta) maintenance
with no per-group DELETE pass; optimize() compacts them away.

Exactness: sums accumulate as ``round(expr, 6)::DECIMAL(28,6)`` (the
registry's round→decimal idiom) so incremental adds/subtracts are
bit-exact against a full recompute — float sums would drift and the
two paths could never be differentially tested.

Fallback: any range the CDF cannot attribute (overwrite/restore/DML
crossings, pre-images missing while updates occurred) degrades to a
full recompute, never to wrong numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from component_delta_lake_writer_spark.errors import UserException
from component_delta_lake_writer_spark.sinks.managed_table import ManagedTable

_VERSION_PROP = "mv_source_version"


class IncrementalAggregate:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        source: ManagedTable,
        group_by: list[str],
        sums: dict[str, str] | None = None,
    ):
        """``sums`` maps output column name → source SQL expression;
        each is maintained as an exact DECIMAL(28,6) sum alongside the
        ``n_rows`` count. Group-key columns must be non-null (they are
        the materialized table's primary key)."""
        if not group_by:
            raise UserException("group_by must name at least one column")
        self.spark = spark
        self.table = ManagedTable(spark, path)
        self.source = source
        self.group_by = list(group_by)
        self.sums = dict(sums or {})

    # ---------- aggregation shapes ----------

    def _sum_expr(self, expr: str):
        return F.round(F.expr(expr), 6).cast("decimal(28,6)")

    def _compute_full(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
            # sum(decimal(28,6)) widens to (38,6); pin the stored type
            F.sum(self._sum_expr(e)).cast("decimal(28,6)").alias(name)
            for name, e in self.sums.items()
        ]
        return df.groupBy(*self.group_by).agg(*aggs)

    def _compute_delta(self, changes: DataFrame) -> DataFrame:
        sign = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            )
            .when(
                F.col("_change_type").isin("update_preimage", "delete"),
                F.lit(-1),
            )
            .otherwise(F.lit(0))
        )
        aggs = [F.sum(sign).cast("long").alias("_dn")] + [
            F.sum(sign.cast("decimal(28,6)") * self._sum_expr(e))
            .cast("decimal(28,6)")
            .alias(f"_d_{name}")
            for name, e in self.sums.items()
        ]
        return changes.groupBy(*self.group_by).agg(*aggs)

    # ---------- refresh ----------

    def refresh(self) -> str:
        """Bring the materialization up to the source head. Returns
        'full', 'incremental', or 'noop' — which path actually ran."""
        head = self.source.latest_commit()
        if head is None:
            raise UserException("source table does not exist")
        last = None
        mv_head = self.table.latest_commit() if self.table.exists() else None
        if mv_head is not None:
            last = mv_head.properties.get(_VERSION_PROP)
        if last is not None and last == head.version:
            return "noop"
        if last is None:
            return self._full(head.version)
        try:
            changes = self.source.read_changes(
                last, head.version, with_change_type=True
            )
        except UserException:
            return self._full(head.version)
        # pre-images are persisted per COMMIT under the property in
        # effect at write time — checking only the head's property
        # would run the incremental path over update change sets that
        # lack the -1 pre-image rows (property enabled mid-history),
        # silently overstating every count and sum forever
        crossed = [
            self.source.commit_at(v)
            for v in self.source._versions()
            if last < v <= head.version
        ]
        for c in crossed:
            if c.action in ("append", "optimize", "delete"):
                continue  # additive / no-op / carries removed images
            if not (c.properties or {}).get("changeDataFeedPreImages"):
                return self._full(head.version)
        delta = self._compute_delta(changes)
        current = self.table.read()
        merged = delta.join(current, self.group_by, "left").select(
            *self.group_by,
            (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("_dn"))
            .cast("long")
            .alias("n_rows"),
            *[
                (
                    F.coalesce(
                        F.col(name), F.lit(0).cast("decimal(28,6)")
                    )
                    # the DELTA coalesces too: a group whose change
                    # rows all carry NULL for this sum yields a NULL
                    # delta, and NULL + current would null the stored
                    # aggregate (a full recompute ignores NULLs)
                    + F.coalesce(
                        F.col(f"_d_{name}"),
                        F.lit(0).cast("decimal(28,6)"),
                    )
                )
                .cast("decimal(28,6)")
                .alias(name)
                for name in self.sums
            ],
        )
        props = {
            **(mv_head.properties if mv_head else {}),
            _VERSION_PROP: head.version,
        }
        self.table.upsert(merged, self.group_by, properties=props)
        return "incremental"

    def _full(self, version: int) -> str:
        # PIN the snapshot to the version being stamped: an unpinned
        # read() can see a commit that landed after the head capture,
        # and the next refresh would re-apply that commit's changes
        mv = self._compute_full(self.source.read(version=version))
        self.table.write(
            mv,
            mode="overwrite",
            primary_key=self.group_by,
            properties={_VERSION_PROP: version},
        )
        return "full"

    def read(self) -> DataFrame:
        """Materialized state, tombstoned groups excluded."""
        return self.table.read().filter(F.col("n_rows") > 0)
