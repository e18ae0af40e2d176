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

import json
import os
import uuid

from component_delta_lake_writer_spark.sinks.managed_table import ManagedTable


def _write_manifest(dest: str, fmt: str, n_rows: int, version: int) -> dict:
    """Export receipt (``manifest.json``): format, source table
    version, row count, and the slice list with byte sizes — what a
    downstream trainer's loader validates before reading, and what
    makes a partially-copied export detectable."""
    files = sorted(
        fn
        for fn in os.listdir(dest)
        if fn.startswith("part-") and not fn.endswith(".crc")
    )
    manifest = {
        "format": fmt,
        "source_version": version,
        "n_rows": n_rows,
        "files": [
            {
                "path": fn,
                "bytes": os.path.getsize(os.path.join(dest, fn)),
            }
            for fn in files
        ],
    }
    # underscore-prefixed so Spark/Hadoop directory reads skip it
    # (same convention as _SUCCESS) — a naive spark.read over the
    # export dir must see only data slices
    tmp = os.path.join(dest, f"_manifest.json.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(dest, "_manifest.json"))
    return manifest


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
    n = df.count()
    v = version if version is not None else table.latest_commit().version
    _write_manifest(dest, "jsonl", n, v)
    return n


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
    n = df.count()
    v = version if version is not None else table.latest_commit().version
    _write_manifest(dest, "csv", n, v)
    return n
