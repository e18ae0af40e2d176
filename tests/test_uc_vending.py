"""C7: Unity-Catalog temp-credential vending (reference
src/component.py:117-133, 327-349) against the local vendor seam."""

import pytest

from component_delta_lake_writer_spark.credentials import redact
from component_delta_lake_writer_spark.errors import UserException
from component_delta_lake_writer_spark.uc_vending import (
    LocalCredentialVendor,
    VendedCredentialSession,
    scope_vended_credentials,
    vend_table_credentials,
)


@pytest.fixture
def vendor():
    v = LocalCredentialVendor(region="eu-west-1", ttl_s=900)
    v.register_table("main.sales.orders", "s3://lake-bucket/sales/orders")
    v.register_table(
        "main.sales.abs_orders",
        "abfss://gold@lakeacct.dfs.core.windows.net/orders",
    )
    v.register_table(
        "main.sales.readonly", "s3://lake-bucket/ro", writable=False
    )
    return v


def test_missing_table_is_user_exception(vendor):
    with pytest.raises(UserException, match="does not exist in Unity Catalog"):
        vend_table_credentials(vendor, "main.sales.nope")


def test_permission_denied_is_user_exception(vendor):
    with pytest.raises(UserException, match="Permission denied"):
        vend_table_credentials(vendor, "main.sales.readonly", "READ_WRITE")
    # read-only vend succeeds on the same table
    creds, _ = vend_table_credentials(vendor, "main.sales.readonly", "READ")
    assert creds.aws is not None


def test_aws_vend_scopes_bucket_conf(spark, vendor):
    creds, region = vend_table_credentials(vendor, "main.sales.orders")
    url = scope_vended_credentials(spark, creds, region)
    assert url == "s3://lake-bucket/sales/orders"
    base = "spark.hadoop.fs.s3a.bucket.lake-bucket"
    assert spark.conf.get(f"{base}.access.key") == creds.aws.access_key_id
    assert spark.conf.get(f"{base}.session.token") == creds.aws.session_token
    assert spark.conf.get(f"{base}.endpoint.region") == "eu-west-1"
    # scoping is per-bucket: no global s3a key was set
    assert spark.conf.get("spark.hadoop.fs.s3a.access.key", None) is None


def test_azure_sas_vend_scopes_account_conf(spark, vendor):
    creds, region = vend_table_credentials(vendor, "main.sales.abs_orders")
    url = scope_vended_credentials(spark, creds, region)
    assert url.startswith("abfss://gold@lakeacct")
    # SAS tokens use SAS auth conf, NOT the account-key slot (a SAS
    # string in fs.azure.account.key can never authenticate)
    host = "lakeacct.dfs.core.windows.net"
    assert (
        spark.conf.get(f"spark.hadoop.fs.azure.account.auth.type.{host}")
        == "SAS"
    )
    assert spark.conf.get(
        f"spark.hadoop.fs.azure.sas.fixed.token.{host}"
    ) == creds.azure_sas.sas_token


def test_session_revends_on_expiry(spark, vendor):
    sess = VendedCredentialSession(spark, vendor, "main.sales.orders")
    first = sess.ensure_valid(now=0.0)
    # still valid well inside the ttl — same credential object
    assert sess.ensure_valid(now=100.0) is first
    # past ttl-minus-slack — a fresh vend with a rotated token
    renewed = sess.ensure_valid(now=first.expiration_epoch_s + 1)
    assert renewed is not first
    assert renewed.aws.session_token != first.aws.session_token
    base = "spark.hadoop.fs.s3a.bucket.lake-bucket"
    assert spark.conf.get(f"{base}.session.token") == renewed.aws.session_token


def test_repr_and_redaction_never_leak_secrets(vendor):
    creds, _ = vend_table_credentials(vendor, "main.sales.orders")
    shown = repr(creds)
    assert creds.aws.secret_access_key not in shown
    assert creds.aws.session_token not in shown
    assert "--SENSITIVE--" in shown
    logged = redact(f"secret={creds.aws.secret_access_key}")
    assert creds.aws.secret_access_key not in logged


def test_fs_invalidation_is_scoped_to_the_vended_authority(spark, vendor):
    """ADVICE r4: credential re-vend must evict ONLY the filesystem
    for the vended table's (scheme, authority) — closeAll() killed
    every cached Hadoop filesystem in the JVM, failing concurrent
    streams on unrelated buckets with 'Filesystem closed'."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI

    # a second, unrelated cached filesystem under its own scheme
    hconf.set("fs.graftdummy.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    other = jvm.org.apache.hadoop.fs.FileSystem.get(
        uri.create("graftdummy:///"), hconf
    )
    other_id = other.hashCode()
    target = jvm.org.apache.hadoop.fs.FileSystem.get(
        uri.create("file:///"), hconf
    )
    target_id = target.hashCode()

    sess = VendedCredentialSession(spark, vendor, "main.sales.orders")
    sess._invalidate_fs_cache("file:///tmp/anywhere")

    # target authority: evicted -> a fresh instance on next get
    target2 = jvm.org.apache.hadoop.fs.FileSystem.get(
        uri.create("file:///"), hconf
    )
    assert target2.hashCode() != target_id
    # unrelated authority: SAME cached instance, still usable
    other2 = jvm.org.apache.hadoop.fs.FileSystem.get(
        uri.create("graftdummy:///"), hconf
    )
    assert other2.hashCode() == other_id
    assert other2.exists(jvm.org.apache.hadoop.fs.Path("/"))
