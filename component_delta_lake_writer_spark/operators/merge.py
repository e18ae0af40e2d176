"""MERGE INTO upsert as DataFrame ops (operators W12, J1, O2).

Reference generates
``MERGE INTO tgt USING src ON tgt.pk = CAST(src._ci AS T) WHEN MATCHED
THEN UPDATE SET <all cols> WHEN NOT MATCHED THEN INSERT <all cols>``
(src/component.py:238-260) and ships it to a warehouse. Spark-first,
the same statement-level semantics are an anti-join + union:

    result = dedup(source) ∪ (target ⟕anti dedup(source) on PK)

- matched target rows are replaced wholesale (UPDATE SET all columns)
- unmatched source rows are inserted (INSERT all columns)
- O2: the source is pre-deduplicated by PK (Delta/SQL MERGE requires
  unique source keys; src/component.py:249-260)

Scale posture: the anti-join shuffles on the PK unless the source key
set is broadcastable — typical upserts are small-source/large-target,
so we hint broadcast when the source is below the threshold and let
AQE decide otherwise. Skewed PKs are handled by AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from component_delta_lake_writer_spark.errors import UserException


def dedup_source(
    source: DataFrame, primary_key: list[str], order_by: list[str] | None = None
) -> DataFrame:
    """O2 pre-dedup: one row per PK. With ``order_by``, keep the row
    with the greatest ordering value (deterministic last-write-wins);
    without, keep an arbitrary single row (dropDuplicates)."""
    if order_by:
        # final content-hash tiebreak: two CDC rows with the same PK
        # AND the same order_by value would otherwise rank in shuffle-
        # delivery order, so a task retry could commit a DIFFERENT
        # surviving row — breaking the documented determinism and the
        # txn-idempotency assumption that a replayed batch reproduces
        # its result. to_json covers unhashable column types.
        w = Window.partitionBy(*primary_key).orderBy(
            *[F.col(c).desc() for c in order_by],
            F.xxhash64(F.to_json(F.struct(*source.columns))).asc(),
        )
        return (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return source.dropDuplicates(primary_key)


def merge_condition(
    target: DataFrame, source: DataFrame, primary_key: list[str]
) -> Column:
    """P4: conjunctive PK equality (src/component.py:244)."""
    from functools import reduce
    from operator import and_

    return reduce(and_, [target[pk] == source[pk] for pk in primary_key])


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's own size estimate for the optimized plan (driver-side
    metadata only, no job). None when the stats bridge is unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _broadcast_threshold_bytes(df: DataFrame) -> int:
    spark = df.sparkSession
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try:
        return int(raw)
    except ValueError:
        try:
            return int(
                spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
            )
        except Exception:
            return 10 * 1024 * 1024


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    primary_key: list[str],
    order_by: list[str] | None = None,
    broadcast_source_keys: bool | None = None,
    pre_deduplicated: bool = False,
) -> DataFrame:
    """Statement-level MERGE result as a DataFrame (caller commits it).

    ``broadcast_source_keys=None`` (default) hints broadcast only when
    Catalyst's size estimate for the source key set fits under
    autoBroadcastJoinThreshold — a large CDC-replay source must not be
    forced through a driver-side broadcast. True/False force the hint
    on/off; in all cases AQE may still re-plan at runtime.

    ``pre_deduplicated=True`` skips the O2 source dedup — for callers
    that already deduped (and usually persisted) the source, so the
    dedup shuffle isn't paid twice.
    """
    if not primary_key:
        raise UserException("Upsert load mode requires a primary key.")
    src = source if pre_deduplicated else dedup_source(source, primary_key, order_by)
    # align source columns to target schema (INSERT/UPDATE all columns)
    src = src.select(*[F.col(c) for c in target.columns])
    keys = src.select(*primary_key)
    if broadcast_source_keys is None:
        est = _plan_size_bytes(keys)
        threshold = _broadcast_threshold_bytes(keys)
        broadcast_source_keys = (
            est is not None and threshold > 0 and est <= threshold
        )
    if broadcast_source_keys:
        keys = F.broadcast(keys)
    kept = target.join(keys, on=primary_key, how="left_anti")
    return kept.unionByName(src)


def merge_upsert_conditional(
    target: DataFrame,
    source: DataFrame,
    primary_key: list[str],
    update_condition,
    order_by: list[str] | None = None,
    pre_deduplicated: bool = False,
) -> DataFrame:
    """MERGE with a guarded UPDATE clause:

    ``WHEN MATCHED AND <update_condition> THEN UPDATE SET <all cols>
      WHEN NOT MATCHED THEN INSERT <all cols>``

    (the conditional form Delta's MERGE supports and the plain upsert
    above cannot express — e.g. "keep the smaller doc_id", "only apply
    newer CDC rows").

    ``update_condition(t, s) -> Column`` receives the matched target
    and source rows as struct columns. One full-outer shuffle join on
    the PK decides every row's winner; no second pass over the target.
    """
    if not primary_key:
        raise UserException("Upsert load mode requires a primary key.")
    src = source if pre_deduplicated else dedup_source(source, primary_key, order_by)
    src = src.select(*[F.col(c) for c in target.columns])

    t = target.select(
        *[F.col(c).alias(f"_pk_{c}") for c in primary_key],
        F.struct(*target.columns).alias("_t"),
    )
    s = src.select(
        *[F.col(c).alias(f"_pk_{c}") for c in primary_key],
        F.struct(*src.columns).alias("_s"),
    )
    j = t.join(s, [f"_pk_{c}" for c in primary_key], "full_outer")
    tt, ss = F.col("_t"), F.col("_s")
    winner = (
        F.when(tt.isNull(), ss)                      # NOT MATCHED → INSERT
        .when(ss.isNull(), tt)                       # target-only → keep
        .when(update_condition(tt, ss), ss)          # MATCHED AND cond → UPDATE
        .otherwise(tt)                               # matched, cond false → keep
    )
    return j.select(winner.alias("_w")).select("_w.*")


def merge_upsert_with_delete(
    target: DataFrame,
    source: DataFrame,
    primary_key: list[str],
    delete_condition,
    order_by: list[str] | None = None,
    pre_deduplicated: bool = False,
) -> DataFrame:
    """MERGE with a DELETE clause — the CDC-tombstone shape:

    ``WHEN MATCHED AND <delete_condition> THEN DELETE
      WHEN MATCHED THEN UPDATE SET <all cols>
      WHEN NOT MATCHED AND NOT <delete_condition> THEN INSERT``

    ``delete_condition(s) -> Column`` reads the FULL source row
    struct — INCLUDING source-only CDC columns like ``op`` that are
    not in the target schema (``lambda s: s["op"] == "D"`` works as
    written; Delta MERGE likewise evaluates conditions against the
    raw source). A tombstone for an absent key is a no-op, matching
    Delta/SQL MERGE. One full-outer shuffle join on the PK decides
    every row; deletions fall out as filtered NULLs, never a second
    pass."""
    if not primary_key:
        raise UserException("Upsert load mode requires a primary key.")
    src_full = (
        source
        if pre_deduplicated
        else dedup_source(source, primary_key, order_by)
    )
    t = target.select(
        *[F.col(c).alias(f"_pk_{c}") for c in primary_key],
        F.struct(*target.columns).alias("_t"),
    )
    # _s = the ALIGNED output struct; _sf = the full source struct the
    # condition evaluates against (aligning FIRST dropped source-only
    # columns, so the docstring's own example raised FIELD_NOT_FOUND)
    s = src_full.select(
        *[F.col(c).alias(f"_pk_{c}") for c in primary_key],
        F.struct(*[F.col(c) for c in target.columns]).alias("_s"),
        F.struct(*src_full.columns).alias("_sf"),
    )
    j = t.join(s, [f"_pk_{c}" for c in primary_key], "full_outer")
    tt, ss = F.col("_t"), F.col("_s")
    dead = F.coalesce(delete_condition(F.col("_sf")), F.lit(False))
    winner = (
        F.when(ss.isNull(), tt)                      # target-only → keep
        .when(dead, F.lit(None))                     # tombstone → delete/skip
        .when(tt.isNull(), ss)                       # NOT MATCHED → INSERT
        .otherwise(ss)                               # MATCHED → UPDATE
    )
    return (
        j.select(winner.alias("_w"))
        .filter(F.col("_w").isNotNull())
        .select("_w.*")
    )


def merge_full_sync(
    target: DataFrame,
    source: DataFrame,
    primary_key: list[str],
    delete_scope: str | None = None,
    order_by: list[str] | None = None,
    pre_deduplicated: bool = False,
) -> DataFrame:
    """MERGE with ``WHEN NOT MATCHED BY SOURCE [AND scope] THEN
    DELETE`` (Delta's full-sync merge): matched target rows are
    replaced, unmatched source rows inserted, and target rows ABSENT
    from the source are DELETED — all of them when ``delete_scope`` is
    None (the result is then exactly the deduped source: a dimension
    refresh from an authoritative extract), or only those satisfying
    the scope predicate (sync one region/partition from a PARTIAL
    extract without touching the rest).

    Scale: the scoped form is one anti-join on the PK (source keys
    broadcast when small, AQE otherwise) — the same shape as the plain
    merge; the unscoped form needs no join at all."""
    if not primary_key:
        raise UserException("Upsert load mode requires a primary key.")
    src = source if pre_deduplicated else dedup_source(source, primary_key, order_by)
    src = src.select(*[F.col(c) for c in target.columns])
    if delete_scope is None:
        return src
    in_scope = F.coalesce(F.expr(delete_scope), F.lit(False))
    keys = src.select(*primary_key)
    est = _plan_size_bytes(keys)
    if est is not None and 0 < est <= _broadcast_threshold_bytes(keys):
        keys = F.broadcast(keys)  # the docstring's small-source promise
    kept = target.join(keys, on=primary_key, how="left_anti").filter(
        ~in_scope
    )
    return kept.unionByName(src)
