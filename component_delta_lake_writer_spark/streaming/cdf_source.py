"""The managed table's change data feed as a STREAMING source —
a Spark 4 Python streaming Data Source (DataSourceStreamReader).

``spark.readStream.format("table_changes_stream")`` turns a
CDF-enabled ManagedTable into an incremental feed: offsets are table
VERSIONS (the natural exactly-once cursor — the same one Delta's
``readChangeFeed`` streaming uses), each micro-batch covers the
commits between two versions, and every emitted row carries
``_change_type`` ('insert' / 'update_postimage' / 'update_preimage' /
'delete') and ``_commit_version``. This is the engine-native way to
chain pipelines: table A's writer commits, table B's maintainer
streams A's deltas — no file listing, no external queue.

    from component_delta_lake_writer_spark.streaming.cdf_source import (
        register,
    )
    register(spark)
    feed = (spark.readStream.format("table_changes_stream")
            .option("path", table.path).load())

Scale posture: offset planning is driver-side COMMIT METADATA (which
versions, which files — bounded by commit count per batch); the data
plane is one InputPartition per change file, read worker-side via
pyarrow. Partitioned tables recover hive partition values from the
directory layout. Commits a CDF stream cannot attribute (overwrite /
restore) raise rather than silently emitting wrong deltas — the same
contract as ``ManagedTable.read_changes``.
"""

from __future__ import annotations

import json
import os
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from component_delta_lake_writer_spark.errors import UserException


def _typed_partition_value(raw: str | None, dtype):
    """Decode a hive-dir partition value string into the schema's
    Python type (the worker-side twin of Spark's own partition-value
    casting — booleans, dates, timestamps and decimals included)."""
    import datetime as _dt
    import decimal as _dec

    if raw is None:
        return None
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        return int(raw)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dtype, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(raw)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.fromisoformat(raw.replace(" ", "T", 1))
    if isinstance(dtype, T.DecimalType):
        return _dec.Decimal(raw)
    return raw

# action classification is SHARED with batch read_changes so the two
# surfaces can never drift on which commits are metadata-only; the
# light cdf_actions module keeps the Python-worker import chain free
# of the full table engine (worker cold-start cost)
from component_delta_lake_writer_spark.sinks.cdf_actions import (  # noqa: E402
    CDF_CHANGE_SET_ACTIONS as _CHANGE_SET,
    CDF_METADATA_ONLY_ACTIONS as _NOOP,
)


def _load_commit(table_path: str, version: int) -> dict:
    p = os.path.join(table_path, "_commits", f"{version:020d}.json")
    with open(p) as fh:
        return json.load(fh)


def _versions(table_path: str) -> list[int]:
    d = os.path.join(table_path, "_commits")
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[: -len(".json")])
        for f in os.listdir(d)
        if f.endswith(".json")
    )


class _ChangeFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        version: int,
        change_type: str | None,
        partition_values: dict,
        mapping: dict,
        mask_paths: list[str] | None = None,
    ):
        self.path = path
        self.version = version
        self.change_type = change_type  # None → column present in file
        self.partition_values = partition_values
        self.mapping = mapping  # logical -> physical
        # merge-on-read equality-delete masks covering this unit: the
        # worker drops rows matching any delete file's key tuples —
        # each file keyed by ITS OWN columns (the PK at ITS commit
        # time, exactly what the batch anti-join uses), bounded by MOR
        # source sizes
        self.mask_paths = mask_paths or []


class CdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.table_path = (options.get("path") or "").rstrip("/")
        if not self.table_path:
            raise UserException(
                "table_changes_stream requires .option('path', <table>)"
            )
        self.schema = schema
        self.starting_version = options.get("startingVersion")

    # ---- offsets: {"version": n} = commits <= n consumed ----

    def initialOffset(self) -> dict:
        vs = _versions(self.table_path)
        if not vs:
            raise UserException(f"No table at {self.table_path}")
        if self.starting_version is not None:
            # INCLUSIVE, Delta semantics: startingVersion=N streams
            # commit N itself (0 → the initial snapshot as inserts).
            # Validated here so a bad option surfaces as a clear
            # UserException, not a FileNotFoundError mid-batch.
            try:
                sv = int(self.starting_version)
            except (TypeError, ValueError):
                raise UserException(
                    f"startingVersion must be an integer, got "
                    f"{self.starting_version!r}"
                ) from None
            if sv < 0 or sv > vs[-1]:
                raise UserException(
                    f"startingVersion {sv} is outside the table's "
                    f"history [0, {vs[-1]}] (Delta raises the same way "
                    "for a version after the latest)."
                )
            return {"version": sv - 1}
        # Delta parity: without startingVersion, the stream's first
        # batch is the LATEST SNAPSHOT emitted as inserts (stamped with
        # the snapshot's commit version), then future changes follow.
        # The extra "snapshot_of" key makes the initial offset differ
        # from latestOffset's JSON, so the bootstrap batch always runs.
        return {"version": vs[-1], "snapshot_of": vs[-1]}

    def latestOffset(self) -> dict:
        vs = _versions(self.table_path)
        return {"version": vs[-1] if vs else 0}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[_ChangeFilePartition] = []
        if start.get("snapshot_of") is not None:
            # bootstrap batch (default start): the whole snapshot at
            # that version streams as inserts; changes resume after it.
            # Units masked by merge-on-read delete sets carry their
            # equality-delete files so workers drop superseded rows —
            # the snapshot must equal ManagedTable.read(), not the raw
            # union of unit files.
            snap = int(start["snapshot_of"])
            c = _load_commit(self.table_path, snap)
            mapping = c.get("column_mapping") or {}
            dsets = c.get("delete_sets") or []
            for u in c["data_units"]:
                masks = [
                    os.path.join(self.table_path, "_deletes", ds["path"])
                    for ds in dsets
                    if u in set(ds["units"])
                ]
                parts.extend(
                    self._unit_files(
                        os.path.join(self.table_path, "_data", u),
                        snap, "insert", mapping,
                        mask_paths=masks,
                    )
                )
            lo = snap
        prev_units = (
            set(_load_commit(self.table_path, lo)["data_units"])
            if lo >= 0
            else set()
        )
        for v in range(lo + 1, hi + 1):
            c = _load_commit(self.table_path, v)
            action = c["action"]
            mapping = c.get("column_mapping") or {}
            if action in ("create", "overwrite") and not prev_units:
                # the stream's first commit: its snapshot IS the
                # insert set (startingVersion=0 bootstrap)
                for u in c["data_units"]:
                    parts.extend(
                        self._unit_files(
                            os.path.join(self.table_path, "_data", u),
                            v, "insert", mapping,
                        )
                    )
            elif action == "append":
                for u in c["data_units"]:
                    if u in prev_units:
                        continue
                    parts.extend(
                        self._unit_files(
                            os.path.join(self.table_path, "_data", u),
                            v, "insert", mapping,
                        )
                    )
            elif action in _CHANGE_SET:
                cdir = os.path.join(self.table_path, "_changes", f"v{v}")
                if not os.path.isdir(cdir):
                    raise UserException(
                        f"table_changes_stream crosses {action} v{v} "
                        "with no persisted change set — enable "
                        "ChangeDataFeed before mutating."
                    )
                parts.extend(self._unit_files(cdir, v, None, mapping))
            elif action in _NOOP:
                pass
            else:
                raise UserException(
                    f"table_changes_stream cannot attribute a "
                    f"'{action}' commit (v{v})."
                )
            prev_units = set(c["data_units"])
        return parts

    @staticmethod
    def _unit_files(base, version, change_type, mapping, mask_paths=None):
        from component_delta_lake_writer_spark.sinks.hive_layout import (
            decode_segments,
        )

        out = []
        for root, _dirs, files in os.walk(base):
            pvals = decode_segments(os.path.relpath(root, base))
            for fn in sorted(files):
                if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                    out.append(
                        _ChangeFilePartition(
                            os.path.join(root, fn), version,
                            change_type, pvals, mapping,
                            mask_paths=mask_paths,
                        )
                    )
        return out

    def read(self, partition: _ChangeFilePartition):
        import datetime as _dt

        import pyarrow.parquet as pq

        file_cols = set(pq.ParquetFile(partition.path).schema_arrow.names)
        # Resolve each stream field to its source column FIRST, so the
        # read decodes only the columns actually consumed (files may
        # carry dead physical columns after drops/renames). Resolution
        # order depends on the FILE KIND: data-unit files
        # (change_type set) store PHYSICAL names — the column-mapping
        # lookup must win, or a logical name would resurrect some
        # other column's shadowed old bytes that add_column/rename
        # deliberately hid (managed_table add_column contract).
        # _changes files (change_type None) are written with LOGICAL
        # names, so the raw name wins there.
        resolve: dict[str, str | None] = {}
        for f in self.schema.fields:
            if f.name == "_commit_version" or (
                f.name == "_change_type" and partition.change_type
            ):
                continue
            if partition.change_type is not None:
                phys = partition.mapping.get(f.name, f.name)
                resolve[f.name] = phys if phys in file_cols else None
            else:
                resolve[f.name] = f.name if f.name in file_cols else None
        wanted = sorted({c for c in resolve.values() if c})
        tbl = pq.read_table(partition.path, columns=wanted)
        cols = {name: tbl.column(name).to_pylist() for name in wanted}
        n = tbl.num_rows

        def _coerce(vals, dtype):
            # files written BEFORE a widen_column_type keep narrower
            # pages; batch reads cast natively via schema pushdown,
            # the Python path must coerce explicitly (date→ntz is the
            # one non-identity representation in _WIDENINGS; int→
            # double needs a float box)
            if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
                return [
                    _dt.datetime(v.year, v.month, v.day)
                    if type(v) is _dt.date
                    else v
                    for v in vals
                ]
            if isinstance(dtype, (T.DoubleType, T.FloatType)):
                return [float(v) if isinstance(v, int) else v for v in vals]
            return vals

        out_cols = []
        for f in self.schema.fields:
            if f.name == "_commit_version":
                out_cols.append([partition.version] * n)
            elif f.name == "_change_type" and partition.change_type:
                out_cols.append([partition.change_type] * n)
            elif resolve.get(f.name):
                out_cols.append(_coerce(cols[resolve[f.name]], f.dataType))
            elif f.name in partition.partition_values:
                raw = partition.partition_values[f.name]
                out_cols.append(
                    [_typed_partition_value(raw, f.dataType)] * n
                )
            else:
                out_cols.append([None] * n)
        if not n:
            return
        if partition.mask_paths:
            # merge-on-read equality-delete masks: each delete file is
            # keyed by ITS OWN columns (the PK at its commit time —
            # exactly what the batch anti-join uses), read worker-side
            # (masks are O(MOR source), never the table). Anti-join
            # NULL semantics are preserved: a NULL never matches, so
            # mask entries with a NULL key are dropped and rows with a
            # NULL key always survive. Both sides normalize tz-aware →
            # naive UTC (a hive-partition PK decodes naive while
            # pyarrow hands delete-file values back tz-aware).
            def _mask_norm(v):
                if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                    return v.astimezone(_dt.timezone.utc).replace(
                        tzinfo=None
                    )
                return v

            field_pos = {
                f.name: i for i, f in enumerate(self.schema.fields)
            }
            groups: list[tuple[list[int], set]] = []
            for mp in partition.mask_paths:
                entries: set = set()
                keys: list[str] | None = None
                for root, _dirs, files in os.walk(mp):
                    for fn in files:
                        if not fn.endswith(".parquet"):
                            continue
                        mt = pq.read_table(os.path.join(root, fn))
                        if keys is None:
                            keys = list(mt.column_names)
                        entries.update(
                            tuple(_mask_norm(v) for v in row)
                            for row in zip(*[
                                mt.column(c).to_pylist() for c in keys
                            ])
                            if None not in row
                        )
                if not keys or any(k not in field_pos for k in keys):
                    continue  # un-evaluable mask: keep rows (conservative)
                groups.append(([field_pos[k] for k in keys], entries))
            yield from (
                row
                for row in zip(*out_cols)
                if not any(
                    None not in (t := tuple(_mask_norm(row[i]) for i in idx))
                    and t in entries
                    for idx, entries in groups
                )
            )
            return
        yield from zip(*out_cols)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable table versions; nothing to ack


class CdfStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "table_changes_stream"

    def schema(self):
        path = (self.options.get("path") or "").rstrip("/")
        vs = _versions(path)
        if not vs:
            raise UserException(f"No table at {path!r}")
        c = _load_commit(path, vs[-1])
        base = T.StructType.fromJson(json.loads(c["schema_json"]))
        fields = list(base.fields) + [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_commit_version", T.LongType(), False),
        ]
        return T.StructType(fields)

    def streamReader(self, schema: T.StructType):
        return CdfStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(CdfStreamDataSource)
