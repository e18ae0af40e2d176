"""Change-feed table replication: keep a downstream copy of a managed
table current by applying only the CHANGES since the last sync — the
CDF consumer pattern Delta documents for downstream syncs, and at
100 TB the difference between shipping a day's deltas and re-copying
the table.

Incremental path: the source's change feed supplies inserts + update
post-images, which MERGE into the replica by the source's primary key
(pre-images are irrelevant to replication — the post-image replaces
the matched row wholesale). Ranges the CDF cannot attribute
(overwrite/restore/DML crossings) and PK-less sources fall back to a
full overwrite copy — never to a silently stale replica. The replica
records the source version it reflects in its own commit properties,
so replication is idempotent and restart-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from component_delta_lake_writer_spark.errors import UserException
from component_delta_lake_writer_spark.sinks.managed_table import ManagedTable

_VERSION_PROP = "replica_source_version"


def replicate(source: ManagedTable, replica: ManagedTable) -> str:
    """Bring ``replica`` up to ``source``'s head. Returns 'full',
    'incremental', or 'noop' — which path actually ran."""
    head = source.latest_commit()
    if head is None:
        raise UserException("source table does not exist")
    last = None
    if replica.exists():
        last = replica.latest_commit().properties.get(_VERSION_PROP)
    if last is not None and last == head.version:
        return "noop"

    def _full() -> str:
        replica.write(
            source.read(),
            mode="overwrite",
            primary_key=list(head.primary_key or []),
            properties={_VERSION_PROP: head.version},
        )
        return "full"

    if last is None or not head.primary_key:
        return _full()
    try:
        changes = source.read_changes(
            last, head.version, with_change_type=True
        )
    except UserException:
        return _full()
    applied = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    props = {
        **replica.latest_commit().properties,
        _VERSION_PROP: head.version,
    }
    replica.upsert(applied, list(head.primary_key), properties=props)
    return "incremental"
