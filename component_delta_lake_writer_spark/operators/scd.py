"""Slowly-changing-dimension (SCD Type 2) operators.

The lakehouse CDC pattern the reference's MERGE surface gets used for
in practice (src/component.py:203-260 generates the upsert SQL; an
SCD2 dimension is what that upsert maintains downstream): every key
keeps its full attribute HISTORY as validity ranges
``(valid_from, valid_to, is_current)`` instead of being overwritten.

Three spellings, composing with the ManagedTable write surface:

- ``scd2_build``: one-shot build from a raw change/event history —
  one shuffle on the key; both window passes share the same
  (key, ts, tiebreak) sort so Spark reuses the exchange.
- ``scd2_apply``: apply a per-key CURRENT-STATE snapshot (the nightly
  dim-snapshot diff shape) to an existing SCD2 dimension — close
  changed current rows at the snapshot's effective time, insert new
  current rows, pass everything else through untouched.
- ``scd2_delta``: just the changed rows (close-outs + inserts) keyed
  by (key, valid_from) — the MERGE source for an incremental
  ManagedTable upsert, so a 100 TB dimension pays O(changed keys),
  never a full rewrite.

Scale posture: build is a single keyed shuffle; apply/delta join the
dimension's CURRENT slice against the snapshot on the key (broadcast
when the snapshot is small, AQE otherwise) — no window over the full
history at apply time, no driver-side state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "scd2_apply", "scd2_delta", "scd2_lookup"]


def _any_attr_differs(attrs: list[str], left: str, right: str) -> Column:
    """NULL-SAFE attribute inequality across two prefixed row images."""
    return ~reduce(
        Column.__and__,
        [
            F.col(f"{left}.{a}").eqNullSafe(F.col(f"{right}.{a}"))
            for a in attrs
        ],
    )


def scd2_build(
    df: DataFrame,
    key: str,
    ts_col: str,
    attrs: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Build an SCD2 dimension from a change history: per key, keep
    the rows where any tracked attribute differs from the previous
    row's (change points), then range them —
    ``valid_from`` = the change's timestamp, ``valid_to`` = the next
    change's, ``is_current`` = no next change.

    ``tiebreak`` orders same-timestamp changes deterministically
    (e.g. an event id); ties produce zero-length ranges rather than
    nondeterministic winners.  NOTE the intentional divergence from
    the incremental path: ``scd2_delta`` represents a same-timestamp
    correction as an in-place REPLACE (no zero-length close-out — its
    merge source must stay ``(key, valid_from)``-unique), so a
    rebuild of a dimension that absorbed such a correction via the
    follower carries one fewer row than this full build; see
    scd2_delta's effective-time contract.  Output: (key, attrs…,
    valid_from, valid_to, is_current).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(key).orderBy(*order)
    changed = (
        df.select(key, ts_col, *attrs, *(tiebreak or []))
        .withColumn("_prev", F.lag(F.struct(*attrs)).over(w))
        .withColumn("_cur", F.struct(*attrs))
        .filter(
            F.col("_prev").isNull()
            | _any_attr_differs(attrs, "_prev", "_cur")
        )
    )
    # second window shares the exact (key, ts, tiebreak) sort — the
    # exchange and sort from the lag pass are reused, one shuffle total
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w))
        .select(
            key,
            *attrs,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def _dedup_snapshot(
    snapshot: DataFrame, key: str, attrs: list[str], ts_col: str
) -> DataFrame:
    """(key, _snap struct, _eff) projection, keeping the LATEST row
    per key by ``ts_col`` when the snapshot carries several.  Equal
    timestamps tie-break on the attr struct (descending) so the
    winner is a deterministic function of the DATA, never of
    partition order — two identical rows make the choice moot, two
    differing rows always pick the same one."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), F.struct(*attrs).desc()
    )
    return (
        snapshot.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key),
            F.struct(*attrs).alias("_snap"),
            F.col(ts_col).alias("_eff"),
        )
    )


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply a per-key current-state ``snapshot`` (columns: key,
    attrs…, ``ts_col`` = the effective time) to an SCD2 ``dim``
    (scd2_build's shape).  Returns the full new dimension:

    - current rows whose attributes differ from the snapshot close at
      the snapshot's effective time;
    - a new current row lands for every changed or brand-new key;
    - unchanged current rows, historical rows, and keys absent from
      the snapshot pass through untouched (missing ≠ deleted — soft
      deletes are an attribute, not an absence).

    A snapshot with several rows per key keeps the LATEST by
    ``ts_col`` (deterministic — a raw multi-row snapshot would
    multiply current rows through the join and corrupt the
    dimension); snapshots are expected to be effective-time monotone
    per key, the CDC contract.  Same-timestamp corrections
    (``_eff == valid_from``) KEEP the zero-length closed row here —
    the rewrite path can; ``scd2_delta``'s merge source cannot and
    replaces in place instead, so an incrementally-followed dimension
    intentionally diverges from this full apply on such corrections
    (see scd2_delta).
    """
    snap = _dedup_snapshot(snapshot, key, attrs, ts_col)
    cur = dim.filter(F.col("is_current")).alias("c")
    rest = dim.filter(~F.col("is_current"))
    j = cur.join(snap, key, "left").withColumn(
        "_cur", F.struct(*[F.col(f"c.{a}") for a in attrs])
    )
    closes = F.col("_snap").isNotNull() & _any_attr_differs(
        attrs, "_snap", "_cur"
    )
    updated_current = j.select(
        F.col(key),
        *[F.col(f"c.{a}") for a in attrs],
        F.col("valid_from"),
        F.when(closes, F.col("_eff")).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
        (~closes).alias("is_current"),
    )
    inserts = scd2_delta_inserts(dim, snap, key, attrs)
    return rest.unionByName(updated_current).unionByName(inserts)


def scd2_delta_inserts(
    dim: DataFrame, snap: DataFrame, key: str, attrs: list[str]
) -> DataFrame:
    """New current rows the snapshot introduces: keys with no current
    row, or whose current attributes differ.  ``snap`` is the
    pre-projected (key, _snap struct, _eff) form."""
    cur_keyed = (
        dim.filter(F.col("is_current"))
        .select(F.col(key), F.struct(*attrs).alias("_cur"))
    )
    j = snap.join(cur_keyed, key, "left")
    fresh = j.filter(
        F.col("_cur").isNull() | _any_attr_differs(attrs, "_snap", "_cur")
    )
    return fresh.select(
        F.col(key),
        *[F.col(f"_snap.{a}").alias(a) for a in attrs],
        F.col("_eff").alias("valid_from"),
        F.lit(None).cast(
            dim.schema["valid_to"].dataType
        ).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_delta(
    dim: DataFrame,
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
) -> DataFrame:
    """Just the CHANGED rows of ``scd2_apply`` — close-outs (the old
    current row with its new ``valid_to``/``is_current=false``) plus
    the new current rows — keyed by ``(key, valid_from)``.  This is
    the MERGE source for an incremental ManagedTable upsert: the
    dimension pays O(changed keys) per batch, never a rewrite of the
    untouched history.  Multi-row-per-key snapshots dedup to the
    latest by ``ts_col``, same as scd2_apply.

    Effective-time contract: snapshots must be per-key monotone
    NON-DECREASING (the CDC ordering guarantee); a snapshot effective
    BEFORE a key's current ``valid_from`` is out of order and
    undefined.  The EQUAL case (``_eff == valid_from`` — a
    same-timestamp correction) is handled as an in-place replace: the
    close-out would be a zero-length range COLLIDING with the insert
    on the ``(key, valid_from)`` merge key, so it is dropped and the
    insert row simply updates the current row through the upsert.
    (scd2_build/scd2_apply, which rewrite rather than merge, keep the
    zero-length representation instead — a merge source must stay
    key-unique.)"""
    snap = _dedup_snapshot(snapshot, key, attrs, ts_col)
    cur = dim.filter(F.col("is_current")).alias("c")
    j = cur.join(snap, key, "inner").withColumn(
        "_cur", F.struct(*[F.col(f"c.{a}") for a in attrs])
    )
    closeouts = j.filter(
        _any_attr_differs(attrs, "_snap", "_cur")
        & (F.col("_eff") > F.col("valid_from"))
    ).select(
        F.col(key),
        *[F.col(f"c.{a}") for a in attrs],
        F.col("valid_from"),
        F.col("_eff").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    return closeouts.unionByName(
        scd2_delta_inserts(dim, snap, key, attrs)
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time dimension join: each fact row picks up the dim
    version whose ``[valid_from, valid_to)`` range covers the fact's
    timestamp — the query every SCD2 dimension exists to answer.

    The join is an EQUI-join on the key with the range as a residual
    filter — at scale the keyed shuffle (or broadcast, when the dim
    is small) does the heavy lifting and each fact row scans only its
    own key's few versions, so no bucketized range-join machinery is
    needed here (contrast operators.timeseries.range_join, where
    there is no equi-key to shuffle on).  ``is_current`` rows have
    ``valid_to`` NULL → open-ended.
    """
    d = dim.select(
        F.col(key),
        *[
            F.col(c).alias(f"dim_{c}")
            for c in dim.columns
            if c not in (key,)
        ],
    )
    cond = (
        (facts[key] == d[key])
        & (facts[ts_col] >= d["dim_valid_from"])
        & (
            d["dim_valid_to"].isNull()
            | (facts[ts_col] < d["dim_valid_to"])
        )
    )
    return facts.join(d, cond, how).drop(d[key])
