"""C7: Unity-Catalog temporary-table-credential vending.

Reference behavior re-expressed (src/component.py:117-133 —
``_get_temp_credentials_and_region`` — and the ``unity_catalog``
provider branch at src/component.py:327-349):

1. check the table exists in the catalog; missing ⇒
   ``UserException("External table {name} does not exist in Unity
   Catalog, please create it.")``
2. resolve ``table_id`` + the metastore's region,
3. vend READ_WRITE temporary credentials for that table id
   (``PermissionDenied`` ⇒ ``UserException("Permission denied: …")``),
4. install them for the table's storage location — the reference hands
   delta-rs a ``storage_options`` dict; Spark-first the same scoping is
   per-bucket Hadoop configuration (see ``credentials.py``), visible to
   every executor without shipping secret objects through the plan.

There is no Databricks workspace in this environment, so the
``CredentialVendor`` protocol is the seam: ``LocalCredentialVendor``
is a deterministic in-memory catalog used by tests and probes; a real
deployment implements the same four methods against the UC REST API.
The vended-credential *shapes* (AWS triple + session token, Azure SAS)
and the error taxonomy match the reference exactly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from component_delta_lake_writer_spark.credentials import (
    scope_azure_sas,
    scope_s3_credentials,
)
from component_delta_lake_writer_spark.errors import UserException


@dataclass
class AwsTempCredentials:
    access_key_id: str
    secret_access_key: str
    session_token: str


@dataclass
class AzureSasCredentials:
    sas_token: str


@dataclass
class TempTableCredentials:
    """What a vend returns: storage url + exactly one credential style
    (mirrors the union the reference switches on at
    src/component.py:338-349)."""

    url: str
    expiration_epoch_s: float
    aws: AwsTempCredentials | None = None
    azure_sas: AzureSasCredentials | None = None

    def expired(self, now: float | None = None, slack_s: float = 60.0) -> bool:
        return (now if now is not None else time.time()) >= (
            self.expiration_epoch_s - slack_s
        )

    def __repr__(self) -> str:  # never leak secrets into logs (F3)
        kind = "aws" if self.aws else ("azure_sas" if self.azure_sas else "none")
        return (
            f"TempTableCredentials(url={self.url!r}, kind={kind}, "
            f"expires={self.expiration_epoch_s:.0f}, secrets=--SENSITIVE--)"
        )


class PermissionDeniedError(Exception):
    """Vendor-side permission failure (stands in for the workspace
    client's PermissionDenied at src/component.py:131-133)."""


@dataclass
class _CatalogEntry:
    table_id: str
    metastore_id: str
    url: str
    readable: bool = True
    writable: bool = True


@dataclass
class LocalCredentialVendor:
    """Deterministic in-memory UC stand-in.

    Register tables with :meth:`register_table`; each vend mints a new
    short-lived AWS-style (``s3://``) or SAS-style (``abfss://``)
    credential whose token encodes the vend counter, so tests can
    assert rotation on expiry.
    """

    region: str = "us-east-1"
    ttl_s: float = 900.0
    _tables: dict[str, _CatalogEntry] = field(default_factory=dict)
    _vend_count: int = 0

    def register_table(
        self,
        full_name: str,
        url: str,
        readable: bool = True,
        writable: bool = True,
    ) -> None:
        self._tables[full_name] = _CatalogEntry(
            table_id=f"tbl-{len(self._tables):04d}",
            metastore_id="metastore-0",
            url=url,
            readable=readable,
            writable=writable,
        )

    # — the four methods a real UC-backed vendor implements —

    def table_exists(self, full_name: str) -> bool:
        return full_name in self._tables

    def table_id(self, full_name: str) -> str:
        return self._tables[full_name].table_id

    def metastore_region(self, full_name: str) -> str:
        return self.region

    def generate_temporary_table_credentials(
        self, table_id: str, operation: str = "READ_WRITE"
    ) -> TempTableCredentials:
        entry = next(
            (e for e in self._tables.values() if e.table_id == table_id),
            None,
        )
        if entry is None:
            raise PermissionDeniedError(f"unknown table id {table_id!r}")
        needs_write = operation in ("READ_WRITE", "WRITE")
        if not entry.readable or (needs_write and not entry.writable):
            raise PermissionDeniedError(
                f"operation {operation} not permitted on {table_id}"
            )
        self._vend_count += 1
        n = self._vend_count
        exp = time.time() + self.ttl_s
        if entry.url.startswith("abfss://"):
            return TempTableCredentials(
                url=entry.url,
                expiration_epoch_s=exp,
                azure_sas=AzureSasCredentials(sas_token=f"sas-{table_id}-{n}"),
            )
        return TempTableCredentials(
            url=entry.url,
            expiration_epoch_s=exp,
            aws=AwsTempCredentials(
                access_key_id=f"ASIA{n:016d}",
                secret_access_key=f"secret-{table_id}-{n}",
                session_token=f"token-{table_id}-{n}",
            ),
        )


def vend_table_credentials(
    vendor, table_full_name: str, operation: str = "READ_WRITE"
) -> tuple[TempTableCredentials, str]:
    """Steps 1-3 of the reference flow: existence check → table id +
    region → vend; reference error messages verbatim
    (src/component.py:117-133)."""
    if not vendor.table_exists(table_full_name):
        raise UserException(
            f"External table {table_full_name} does not exist in Unity "
            "Catalog, please create it."
        )
    table_id = vendor.table_id(table_full_name)
    region = vendor.metastore_region(table_full_name)
    try:
        creds = vendor.generate_temporary_table_credentials(table_id, operation)
    except PermissionDeniedError as e:
        raise UserException(f"Permission denied: {e}") from e
    return creds, region


def scope_vended_credentials(
    spark: SparkSession, creds: TempTableCredentials, region: str
) -> str:
    """Step 4: install the vended credentials where Spark's
    filesystems look for them; returns the table's storage uri.

    The reference builds a delta-rs ``storage_options`` dict
    (src/component.py:338-349); the Spark equivalent is per-bucket /
    per-account Hadoop conf so the scope is exactly one storage
    container, not the whole session.
    """
    if creds.azure_sas is not None:
        # abfss://container@account.dfs.core.windows.net/path — a SAS
        # token needs SAS auth conf (scope_azure_sas); installing it
        # in the account-KEY slot can never authenticate
        if "@" not in creds.url:
            raise UserException(
                f"Cannot derive the storage account from {creds.url!r} "
                "(expected abfss://container@account.<suffix>/…)."
            )
        host = creds.url.split("@", 1)[1].split("/", 1)[0]
        account, _, suffix = host.partition(".")
        scope_azure_sas(
            spark, account, creds.azure_sas.sas_token,
            suffix=suffix or "dfs.core.windows.net",
        )
    elif creds.aws is not None:
        bucket = creds.url.split("://", 1)[1].split("/", 1)[0]
        scope_s3_credentials(
            spark,
            bucket,
            access_key=creds.aws.access_key_id,
            secret_key=creds.aws.secret_access_key,
            session_token=creds.aws.session_token,
            region=region,
        )
    else:  # pragma: no cover — vendor contract violation
        raise UserException("Vended credentials carry no usable secret.")
    return creds.url


class VendedCredentialSession:
    """Keeps a table's vended credentials fresh across a long batch
    loop: re-vends (and re-scopes) when within the expiry slack, so a
    multi-hour append job survives the UC credential TTL."""

    def __init__(
        self,
        spark: SparkSession,
        vendor,
        table_full_name: str,
        operation: str = "READ_WRITE",
    ):
        self._spark = spark
        self._vendor = vendor
        self._table = table_full_name
        self._operation = operation
        self._creds: TempTableCredentials | None = None
        self._region = ""

    def ensure_valid(self, now: float | None = None) -> TempTableCredentials:
        if self._creds is None or self._creds.expired(now):
            is_revend = self._creds is not None
            # scope FIRST, cache on success: caching before scoping
            # left a fresh-but-never-installed credential that every
            # later call returned without retrying the conf step
            creds, region = vend_table_credentials(
                self._vendor, self._table, self._operation
            )
            scope_vended_credentials(self._spark, creds, region)
            if is_revend:
                self._invalidate_fs_cache(creds.url)
            self._creds, self._region = creds, region
        return self._creds

    def _invalidate_fs_cache(self, url: str) -> None:
        """Hadoop caches FileSystem instances per (scheme, authority);
        S3A builds its credential chain once at initialize(), so a
        re-vended token never reaches an already-cached filesystem —
        the long batch loop would 403 with ExpiredToken exactly in the
        scenario this class exists for. Close ONLY the cached instance
        for THIS table's (scheme, authority) so the next I/O rebuilds
        it under the fresh conf — FileSystem.closeAll() (ADVICE r4)
        would also nuke every unrelated cached filesystem in the JVM,
        killing concurrent streams on other buckets mid-task with
        'Filesystem closed'. Best-effort: a missing JVM bridge falls
        back to disabling the s3a cache."""
        try:
            jvm = self._spark._jvm
            juri = jvm.java.net.URI.create(url)
            hconf = self._spark._jsc.hadoopConfiguration()
            # get() returns the cached instance for this key (or a
            # fresh one, harmlessly); close() evicts it from the cache
            jvm.org.apache.hadoop.fs.FileSystem.get(juri, hconf).close()
        except Exception:  # pragma: no cover — non-JVM session
            self._spark.conf.set(
                "spark.hadoop.fs.s3a.impl.disable.cache", "true"
            )

    @property
    def storage_url(self) -> str:
        return self.ensure_valid().url
