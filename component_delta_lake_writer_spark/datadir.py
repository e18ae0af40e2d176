"""Keboola data-dir binding: ``config.json`` + ``.csv.manifest`` → JobSpec.

The reference binds its inputs from a mounted data directory — the
Keboola common interface — via ``ComponentBase``:

- ``get_input_tables_definitions(orphaned_manifests=True)`` reads
  ``in/tables/*.manifest`` (reference src/component.py:35) and exposes
  ``column_names``, per-column ``data_types['base'].dtype``, and
  ``primary_key`` (src/component.py:72,200-206);
- ``get_input_files_definitions()`` reads ``in/files/``
  (src/component.py:36);
- configuration-row ``parameters`` are validated into ``Configuration``
  (src/configuration.py:6-55, schema component_config/configRowSchema.json);
- the canonical fixture is component_config/sample-config/.

This module re-expresses that binding without the proprietary-free —
it parses the same on-disk layout into this engine's ``JobSpec`` /
``TableInput`` / ``FileInput`` and hands off to ``runner.run_job``.

Manifest compatibility: both the modern shape (``schema`` list with
``data_type.base.type`` and per-column ``primary_key`` flags) and the
legacy shape (``columns`` list + ``column_metadata`` with
``KBC.datatype.basetype`` entries + table-level ``primary_key``) are
accepted, mirroring what keboola.component normalizes. A manifest with
an ``s3`` staging block (sliced table exported to object storage,
consumed at src/component.py:160-162,262-279) binds to the staged
slice listing instead of local data.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from component_delta_lake_writer_spark.config import (
    ColumnSpec,
    Compression,
    Destination,
    JobSpec,
    LoadMode,
)
from component_delta_lake_writer_spark.errors import UserException
from component_delta_lake_writer_spark.runner import (
    FileInput,
    TableInput,
    run_job,
)
from component_delta_lake_writer_spark.sinks import ManagedTable

_BASETYPE_KEY = "KBC.datatype.basetype"
_LENGTH_KEY = "KBC.datatype.length"


@dataclass
class S3Staging:
    """The manifest's object-storage staging block (the reference feeds
    it to COPY INTO / read_csv credentials, src/component.py:150-172,
    262-279). Credentials are held only long enough to scope a read."""

    region: str = ""
    bucket: str = ""
    key: str = ""  # JSON slice-listing manifest within the bucket
    access_key_id: str = ""
    secret_access_key: str = ""
    session_token: str = ""

    @classmethod
    def from_manifest(cls, block: dict) -> "S3Staging":
        creds = block.get("credentials", {})
        return cls(
            region=block.get("region", ""),
            bucket=block.get("bucket", ""),
            key=block.get("key", ""),
            access_key_id=creds.get("access_key_id", ""),
            secret_access_key=creds.get("secret_access_key", ""),
            session_token=creds.get("session_token", ""),
        )


@dataclass
class DataDirTable:
    """One bound input table (the reference's TableDefinition core)."""

    name: str
    data_path: str | None  # local file or sliced-table directory
    slice_paths: list[str] = field(default_factory=list)
    columns: list[ColumnSpec] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    delimiter: str = ","
    enclosure: str = '"'
    has_header: bool = False  # headerless when the manifest names columns
    s3_staging: S3Staging | None = None


def parse_manifest(manifest_path: str) -> DataDirTable:
    """Parse one ``*.manifest`` next to its data file/dir."""
    with open(manifest_path) as f:
        m = json.load(f)
    data_path = manifest_path[: -len(".manifest")]
    name = m.get("name") or os.path.basename(data_path).removesuffix(".csv")

    columns: list[ColumnSpec] = []
    pk: list[str] = []
    if m.get("schema"):  # modern manifest shape
        for col in m["schema"]:
            base = (col.get("data_type") or {}).get("base", {})
            columns.append(
                ColumnSpec(
                    name=col["name"],
                    dtype=(base.get("type") or "STRING").upper(),
                    length=base.get("length"),
                )
            )
            if col.get("primary_key"):
                pk.append(col["name"])
    elif m.get("columns"):  # legacy shape: names + column_metadata
        meta = m.get("column_metadata", {})
        for cname in m["columns"]:
            dtype, length = "STRING", None
            for entry in meta.get(cname, []):
                if entry.get("key") == _BASETYPE_KEY:
                    dtype = str(entry.get("value", "STRING")).upper()
                elif entry.get("key") == _LENGTH_KEY:
                    length = entry.get("value")
            columns.append(ColumnSpec(name=cname, dtype=dtype, length=length))
    if not pk:
        pk = list(m.get("primary_key", []))

    slice_paths: list[str] = []
    exists = os.path.exists(data_path)
    if exists and os.path.isdir(data_path):
        # sliced table: the directory holds header-less slice files
        slice_paths = sorted(
            os.path.join(data_path, s)
            for s in os.listdir(data_path)
            if not s.startswith((".", "_"))
        )
    elif exists:
        slice_paths = [data_path]

    return DataDirTable(
        name=name,
        data_path=data_path if exists else None,
        slice_paths=slice_paths,
        columns=columns,
        primary_key=pk,
        delimiter=m.get("delimiter", ","),
        enclosure=m.get("enclosure", '"'),
        has_header=not columns,  # Keboola convention: named cols ⇒ headerless
        s3_staging=(
            S3Staging.from_manifest(m["s3"]) if m.get("s3") else None
        ),
    )


def discover_input_tables(data_dir: str) -> list[DataDirTable]:
    """``in/tables/*.manifest`` → bound tables; orphaned manifests
    (no local data, e.g. s3-staged) are included, matching
    ``get_input_tables_definitions(orphaned_manifests=True)``
    (src/component.py:35)."""
    tdir = os.path.join(data_dir, "in", "tables")
    if not os.path.isdir(tdir):
        return []
    return [
        parse_manifest(os.path.join(tdir, f))
        for f in sorted(os.listdir(tdir))
        if f.endswith(".manifest")
    ]


def discover_input_files(data_dir: str) -> list[str]:
    """``in/files/*`` data files (src/component.py:36,79-81)."""
    fdir = os.path.join(data_dir, "in", "files")
    if not os.path.isdir(fdir):
        return []
    return sorted(
        os.path.join(fdir, f)
        for f in os.listdir(fdir)
        if not f.endswith(".manifest") and not f.startswith(".")
    )


def parse_config(data_dir: str, table_uri: str | None = None) -> JobSpec:
    """``config.json`` ``parameters`` → JobSpec, the dataclass twin of
    the reference's pydantic ``Configuration`` (src/configuration.py:
    38-55; parameter names per configRowSchema.json)."""
    cfg_path = os.path.join(data_dir, "config.json")
    params: dict = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            params = json.load(f).get("parameters", {}) or {}
    d = params.get("destination", {}) or {}

    mode_raw = d.get("mode", "append")
    try:
        load_mode = LoadMode(mode_raw)
    except ValueError:
        raise UserException(
            f"Unsupported mode: {mode_raw}. Supported modes are: "
            "error, append, overwrite, upsert."
        ) from None
    comp_raw = str(d.get("compression", "UNCOMPRESSED")).upper()
    try:
        compression = Compression(comp_raw)
    except ValueError:
        raise UserException(f"Unknown compression: {comp_raw}") from None

    if table_uri is None:
        # catalog.schema.table addressing maps onto a warehouse-local
        # path; out/tables keeps it inside the data-dir contract
        parts = [p for p in (d.get("catalog"), d.get("schema_name"), d.get("table")) if p]
        table_uri = os.path.join(data_dir, "out", "tables", *(parts or ["table"]))

    return JobSpec(
        destination=Destination(
            table_uri=table_uri,
            load_mode=load_mode,
            partition_by=list(d.get("partition_by", []) or []),
            compression=compression,
        ),
        batch_size=int(params.get("batch_size", 25_000)),
        preserve_insertion_order=bool(
            params.get("preserve_insertion_order", True)
        ),
    )


def bind_job(
    spark: SparkSession, data_dir: str, table_uri: str | None = None
) -> tuple[JobSpec, TableInput | None, FileInput | None]:
    """Bind a data dir into (spec, table, files) ready for run_job,
    applying the reference's input-cardinality rules
    (src/component.py:38-48)."""
    spec = parse_config(data_dir, table_uri=table_uri)
    tables = discover_input_tables(data_dir)
    files = discover_input_files(data_dir)

    if not tables and not files:
        raise UserException("No input tables or files found.")
    if tables and files:
        raise UserException(
            "Each configuration row can be mapped to either a file or a "
            "table, but not both."
        )
    if len(tables) > 1:
        raise UserException("Each configuration row can have only one input table")

    if files:
        return spec, None, FileInput(paths=files)

    t = tables[0]
    if t.primary_key and not spec.destination.primary_key:
        spec.destination.primary_key = t.primary_key
    if t.has_header and not t.columns and t.slice_paths:
        # manifest without column names ⇒ the CSV carries a header row
        # (Keboola local-file convention); sniff it driver-side — one
        # line of one file, not a data scan. SLICED directories are
        # refused here: the Keboola contract puts columns in the
        # manifest for sliced tables, and header=true across N slices
        # would silently drop the first DATA row of slices 2..N.
        import csv as _csv

        if len(t.slice_paths) > 1:
            raise UserException(
                f"Input table {t.name!r} is sliced but its manifest "
                "declares no columns — sliced tables carry columns in "
                "the manifest (a sniffed header would drop the first "
                "row of every other slice)."
            )
        with open(t.slice_paths[0], newline="") as f:
            reader = _csv.reader(
                f, delimiter=t.delimiter, quotechar=t.enclosure
            )
            try:
                t.columns = [ColumnSpec(name=c) for c in next(reader)]
            except StopIteration:
                raise UserException(
                    f"Input table {t.name!r}: cannot sniff a header "
                    f"from empty slice {t.slice_paths[0]!r}."
                ) from None
    if t.s3_staging is not None and not t.slice_paths:
        # orphaned manifest + staging block: bind to the staged slice
        # listing (the reference's get_s3_paths shape). The scoped
        # credentials are APPLIED here — parsing them into S3Staging
        # and never calling scope_s3_credentials left the staged
        # branch unable to read real object storage at all.
        if spark is not None and not os.path.exists(t.s3_staging.key):
            from component_delta_lake_writer_spark.credentials import (
                scope_s3_credentials,
            )

            st = t.s3_staging
            scope_s3_credentials(
                spark,
                bucket=st.bucket,
                access_key=st.access_key_id,
                secret_key=st.secret_access_key,
                session_token=st.session_token or None,
                region=st.region or None,
            )
        staged_manifest = (
            t.s3_staging.key
            if os.path.exists(t.s3_staging.key)
            else f"s3a://{t.s3_staging.bucket}/{t.s3_staging.key}"
        )
        return spec, TableInput(
            manifest_path=staged_manifest,
            columns=t.columns,
            delimiter=t.delimiter,
            enclosure=t.enclosure,
        ), None
    if not t.slice_paths:
        raise UserException(
            f"Input table {t.name!r} has a manifest but no data "
            "(and no s3 staging block)."
        )
    return spec, TableInput(
        slice_paths=t.slice_paths,
        columns=t.columns,
        delimiter=t.delimiter,
        enclosure=t.enclosure,
        has_header=t.has_header,
    ), None


def run_datadir_job(
    spark: SparkSession, data_dir: str, table_uri: str | None = None
) -> ManagedTable:
    """The reference's ``run()`` shape end-to-end from a data dir."""
    spec, table, files = bind_job(spark, data_dir, table_uri=table_uri)
    return run_job(spark, spec, table=table, files=files)
