"""Job specification — the engine-agnostic config model.

Re-expresses the reference's Pydantic ``Configuration``
(src/configuration.py:6-55) as stdlib dataclasses + enums (pydantic is
not a guaranteed dependency here), with the same fields, defaults and
validation rules (X3: src/component.py:38-45,64-68,178-185,241-242).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from component_delta_lake_writer_spark.errors import UserException


class AccessMethod(str, Enum):
    # reference src/configuration.py:6-9 (provider switch src/component.py:301-351)
    ABS = "abs"
    S3 = "s3"
    GCS = "gcs"
    UNITY_CATALOG = "unity_catalog"
    LOCAL = "local"  # engine addition: path-based local/managed tables


class TableType(str, Enum):
    # reference src/configuration.py:12-14
    EXTERNAL = "external"
    NATIVE = "native"


class LoadMode(str, Enum):
    # reference src/configuration.py:17-20; semantics src/component.py:90-111,227-260
    ERROR = "error"
    APPEND = "append"
    OVERWRITE = "overwrite"
    UPSERT = "upsert"


class Compression(str, Enum):
    # reference component_config/configRowSchema.json:182-211, default
    # src/configuration.py:35. BROTLI needs a native codec jar absent
    # from vanilla Spark — validated out (SURVEY §4 note 4); LZ4_RAW
    # is supported by this Spark's parquet writer (codec "lz4_raw").
    UNCOMPRESSED = "UNCOMPRESSED"
    SNAPPY = "SNAPPY"
    GZIP = "GZIP"
    LZ4 = "LZ4"
    ZSTD = "ZSTD"
    BROTLI = "BROTLI"
    LZ4_RAW = "LZ4_RAW"


_SPARK_CODECS = {
    Compression.UNCOMPRESSED: "none",
    Compression.SNAPPY: "snappy",
    Compression.GZIP: "gzip",
    Compression.LZ4: "lz4",
    Compression.ZSTD: "zstd",
    Compression.LZ4_RAW: "lz4_raw",
}


@dataclass
class ColumnSpec:
    """One manifest column: name + Keboola base dtype.

    Mirrors manifest ``data_types['base'].dtype`` consumption at
    src/component.py:72,200-204.
    """

    name: str
    dtype: str = "STRING"  # STRING INTEGER NUMERIC FLOAT BOOLEAN DATE TIMESTAMP
    length: str | None = None  # e.g. "12,2" for NUMERIC


@dataclass
class Destination:
    # reference src/configuration.py:23-38
    table_uri: str = ""
    table_type: TableType = TableType.EXTERNAL
    load_mode: LoadMode = LoadMode.APPEND
    partition_by: list[str] = field(default_factory=list)
    compression: Compression = Compression.UNCOMPRESSED
    primary_key: list[str] = field(default_factory=list)


@dataclass
class JobSpec:
    destination: Destination = field(default_factory=Destination)
    batch_size: int = 25_000  # src/configuration.py:50 → maxRecordsPerFile
    preserve_insertion_order: bool = True  # src/configuration.py:51
    threads: int = 1  # src/configuration.py:53
    max_memory_mb: int = 256  # src/configuration.py:54
    keep_stage: bool = False  # src/configuration.py:55
    columns: list[ColumnSpec] = field(default_factory=list)

    def validate(self, n_tables: int = 0, n_files: int = 0) -> None:
        """X3 input-cardinality + mode validation, same messages class
        as reference src/component.py:38-48,178-185,241-242."""
        if n_tables and n_files:
            raise UserException(
                "Either input tables or input files are supported, not both."
            )
        if not n_tables and not n_files:
            raise UserException("No input tables or files found.")
        if n_tables > 1:
            raise UserException("Only one input table is supported.")
        if self.destination.load_mode == LoadMode.UPSERT and not (
            self.destination.primary_key
        ):
            raise UserException("Upsert load mode requires a primary key.")
        self.spark_codec()  # validates compression

    def spark_codec(self) -> str:
        codec = _SPARK_CODECS.get(self.destination.compression)
        if codec is None:
            raise UserException(
                f"Compression {self.destination.compression.value} is not "
                "supported by the Spark parquet writer; use one of "
                "UNCOMPRESSED, SNAPPY, GZIP, LZ4, LZ4_RAW, ZSTD."
            )
        return codec
