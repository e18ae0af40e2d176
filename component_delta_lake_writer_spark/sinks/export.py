"""Export surfaces: managed table → sliced JSONL / CSV.

The reference moves data INTO Delta from CSV staging
(``/root/reference/src/component.py:75-111``); real pipelines also
need the reverse — handing a curated table to a trainer or an
external consumer as sliced, compressed line files (the Keboola
staging layout, in the other direction). Both exports are one
distributed write: ``slices`` controls output parallelism via
repartition (at 100 TB, pick slices ≈ cluster write parallelism;
files land as part-* under ``dest``).
"""

from __future__ import annotations

from component_delta_lake_writer_spark.sinks.managed_table import ManagedTable


def export_jsonl(
    table: ManagedTable,
    dest: str,
    slices: int | None = None,
    compression: str | None = "gzip",
    version: int | None = None,
) -> int:
    """Snapshot (or time-travel ``version``) → JSON-lines slices.
    Returns the exported row count (one extra count job — cheap next
    to the write, and the receipt an export manifest wants)."""
    df = table.read(version=version) if version is not None else table.read()
    out = df.repartition(slices) if slices else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(dest)
    return df.count()


def export_csv(
    table: ManagedTable,
    dest: str,
    slices: int | None = None,
    compression: str | None = "gzip",
    header: bool = False,
    version: int | None = None,
) -> int:
    """Snapshot → CSV slices (header-less by default, matching the
    Keboola sliced-table convention the reference consumes)."""
    df = table.read(version=version) if version is not None else table.read()
    out = df.repartition(slices) if slices else df
    w = out.write.mode("overwrite").option("header", str(header).lower())
    if compression:
        w = w.option("compression", compression)
    w.csv(dest)
    return df.count()
