"""Keboola sliced-table manifest as a Spark 4 Python Data Source.

The reference consumes Keboola sliced uploads: a JSON manifest whose
``entries`` list the slice file URLs, each slice a headerless CSV
under the table's declared column order (src/component.py:75-81,
275-279; datadir.py binds the same shape from a data dir). This
module packages that contract as a first-class ``spark.read.format``
connector via the Python Data Source API (SPARK-44076, new in
Spark 4):

    spark.dataSource.register(SlicedManifestDataSource)
    df = (spark.read.format("sliced_manifest")
          .schema("id INT, name STRING")          # schema is law
          .option("manifest", "/path/manifest")   # local or file://
          .option("delimiter", ",")
          .load())

Partitioning: ONE InputPartition PER SLICE — on a cluster every slice
is read by its own task in parallel, exactly how the sliced-upload
format is meant to scale; the manifest itself is driver-side metadata
(bounded by slice count). Each task streams its slice with the stdlib
csv reader in arrow-batch-friendly row tuples.

This is deliberately the slow-but-portable path (pure-Python row
production — the Data Source API's contract); the engine's hot path
for the same data stays ``sources/csv.py`` (JVM CSV scan). The
connector exists for the API surface: sources users can register,
list, and compose with the rest of spark.read.
"""

from __future__ import annotations

import csv
import io
import json
import os
from urllib.parse import urlparse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T

from component_delta_lake_writer_spark.errors import UserException


def _local_path(url: str) -> str:
    p = urlparse(url)
    if p.scheme in ("", "file"):
        return p.path or url
    raise UserException(
        f"sliced_manifest connector resolves local/file URLs here; "
        f"got {url!r} (cloud URLs go through credentials.py scoping)."
    )


class _SlicePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SlicedManifestReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.manifest = options.get("manifest")
        if not self.manifest:
            raise UserException(
                "sliced_manifest requires .option('manifest', <path>)"
            )
        self.delimiter = options.get("delimiter", ",")
        self.quotechar = options.get("enclosure", '"')

    def partitions(self):
        with open(_local_path(self.manifest)) as fh:
            doc = json.load(fh)
        parts = [
            _SlicePartition(_local_path(e["url"]))
            for e in doc.get("entries", [])
        ]
        if not parts:
            raise UserException(
                f"Manifest {self.manifest} lists no entries."
            )
        return parts

    def read(self, partition: _SlicePartition):
        casts = []
        for f in self.schema.fields:
            t = f.dataType
            if isinstance(t, (T.IntegerType, T.LongType, T.ShortType)):
                casts.append(lambda v: int(v) if v != "" else None)
            elif isinstance(t, (T.DoubleType, T.FloatType)):
                casts.append(lambda v: float(v) if v != "" else None)
            elif isinstance(t, T.BooleanType):
                casts.append(
                    lambda v: v.lower() in ("true", "1")
                    if v != "" else None
                )
            else:
                casts.append(lambda v: v if v != "" else None)
        n = len(casts)
        with io.open(partition.path, newline="") as fh:
            reader = csv.reader(
                fh, delimiter=self.delimiter, quotechar=self.quotechar
            )
            for lineno, row in enumerate(reader, start=1):
                if len(row) > n:
                    # zip() would silently TRUNCATE the extra fields,
                    # masking schema drift instead of surfacing it
                    raise UserException(
                        f"{partition.path}:{lineno}: row has "
                        f"{len(row)} fields, schema has {n}."
                    )
                try:
                    yield tuple(c(v) for c, v in zip(casts, row))
                except ValueError as exc:
                    raise UserException(
                        f"{partition.path}:{lineno}: {exc}"
                    ) from None


class SlicedManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sliced_manifest"

    def schema(self):
        raise UserException(
            "sliced_manifest has no schema inference — pass "
            ".schema(...) explicitly (schema is law, SURVEY §1.2)."
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return SlicedManifestReader(schema, self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(SlicedManifestDataSource)


def write_manifest(manifest_path: str, slice_paths: list[str]) -> None:
    """Write the Keboola-shaped manifest for a set of slice files."""
    # abspath first: 'file://data/x.csv' parses 'data' as the URL
    # AUTHORITY and the reader would open '/x.csv'
    doc = {
        "entries": [
            {"url": f"file://{os.path.abspath(p)}"} for p in slice_paths
        ]
    }
    with open(manifest_path, "w") as fh:
        json.dump(doc, fh)


def stage_slices_from_csv_dir(csv_dir: str, manifest_path: str) -> int:
    """Point a manifest at every .csv slice in a directory (sorted —
    slice order is the manifest's row-order contract)."""
    slices = sorted(
        os.path.join(csv_dir, f)
        for f in os.listdir(csv_dir)
        if f.endswith(".csv")
    )
    write_manifest(manifest_path, slices)
    return len(slices)
