"""Tests for credential scoping (S5), redaction (F3), retry (X4)."""

from __future__ import annotations

import pytest

from component_delta_lake_writer_spark.credentials import (
    redact,
    scope_s3_credentials,
)
from component_delta_lake_writer_spark.http_retry import with_retries


def test_redact_credential_clause():
    # the reference's exact pattern: src/component.py:282
    sql = "COPY INTO t FROM 's3://b/' WITH (CREDENTIAL (AWS_ACCESS_KEY 'AKIA123'))"
    out = redact(sql)
    assert "AKIA123" not in out
    assert "--SENSITIVE--" in out


def test_redact_key_value_secrets():
    out = redact("secret=topsecret token: abc123 access_key=AKIA9")
    assert "topsecret" not in out
    assert "abc123" not in out
    assert "AKIA9" not in out


def test_scope_s3_credentials_sets_bucket_confs(spark):
    scope_s3_credentials(
        spark, "mybucket", "AK", "SK", session_token="TOK", region="eu-west-1"
    )
    conf = spark.conf
    base = "spark.hadoop.fs.s3a.bucket.mybucket"
    assert conf.get(f"{base}.access.key") == "AK"
    assert conf.get(f"{base}.secret.key") == "SK"
    assert conf.get(f"{base}.session.token") == "TOK"
    # the reference's hard-coded storage options (src/component.py:
    # 302-305) — PER-BUCKET forms, so two buckets scoped in one
    # session never clobber each other's timeout/retry settings
    assert conf.get(f"{base}.attempts.maximum") == "2"
    assert conf.get(f"{base}.connection.timeout") == "3600000"


def test_with_retries_succeeds_after_failures():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return "ok"

    assert with_retries(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert sleeps == [1, 2]  # linear backoff: attempt+1 (X4)


def test_with_retries_reraises_last():
    def always_fails():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        with_retries(always_fails, sleep=lambda s: None)


def test_registry_order_tracks_driver_evidence():
    """The registry self-rotates on the driver's CORRECTNESS files:
    red keys first; never-checked keys WITHOUT a curated _FRONT slot
    precede everything green (the safety net); never-checked keys
    WITH a slot keep it — INCLUDING a slot deliberately past the
    50-key budget window (r12: the TIFF/MP3 keys defer to the r13
    refresh queue so the stale-evidence rotation keeps its slots —
    an unseen key is only guaranteed same-round evidence when it is
    UNCURATED, the safety-net case)."""
    from component_delta_lake_writer_spark.plans import QUERIES, _FRONT
    from component_delta_lake_writer_spark.plans import _driver_evidence

    red, seen = _driver_evidence()
    ks = list(QUERIES)
    pos = {k: i for i, k in enumerate(ks)}
    front = set(_FRONT)
    reds = [pos[k] for k in red if k in pos]
    unseen_uncurated = [
        pos[k] for k in ks
        if k not in seen and k not in red and k not in front
    ]
    unseen_all = [pos[k] for k in ks if k not in seen and k not in red]
    greens = [
        pos[k] for k in ks
        if k in seen and k not in red and k not in front
    ]
    if reds and unseen_all:
        assert max(reds) < min(unseen_all)
    # the safety net: an uncurated new key outranks every key that is
    # neither red nor explicitly placed
    if unseen_uncurated and greens:
        assert max(unseen_uncurated) < min(greens)
    # budget guarantee: every UNCURATED unseen key is inside the
    # first 50 (a curated unseen key sits wherever its _FRONT slot
    # says — placement past the window is a deliberate deferral)
    assert all(p < 50 for p in unseen_uncurated), sorted(
        unseen_uncurated
    )


def test_redaction_covers_hadoop_secret_keys():
    """Review finding: 'secret.key=' / 'secret_key=' — the exact conf
    keys scope_s3_credentials sets — leaked through redaction."""
    from component_delta_lake_writer_spark.credentials import redact

    for line in [
        "fs.s3a.bucket.b.secret.key=TOPSECRET",
        "secret_key=TOPSECRET",
        "fs.s3a.bucket.b.session.token=TOPSECRET",
        "access_key: TOPSECRET",
    ]:
        out = redact(line)
        assert "TOPSECRET" not in out, (line, out)
        assert "--SENSITIVE--" in out


def test_hive_decode_unquotes_column_names():
    """Spark escapes partition COLUMN names too ('a b' -> 'a%20b=v');
    an un-unquoted key never matched the logical column."""
    from component_delta_lake_writer_spark.sinks.hive_layout import (
        decode_segments,
    )

    assert decode_segments("a%20b=x%20y") == {"a b": "x y"}


def test_with_retries_rejects_nonpositive_attempts():
    import pytest as _pytest

    from component_delta_lake_writer_spark.http_retry import with_retries

    with _pytest.raises(ValueError, match="attempts"):
        with_retries(lambda: 1, attempts=0)


def test_range_join_edges(spark):
    """Half-open [start, end) semantics and bucket-edge coverage: an
    interval ending exactly on a bucket boundary must not claim the
    next bucket, and a point equal to `end` must not match."""
    from component_delta_lake_writer_spark.operators.timeseries import (
        range_join,
    )
    from pyspark.sql import functions as F

    points = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 10:29:59",),
         ("2024-01-01 10:30:00",), ("2024-01-01 11:00:00",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [("2024-01-01 10:00:00", "2024-01-01 10:30:00", "a"),
         ("2024-01-01 10:30:00", "2024-01-01 11:00:00", "b")],
        "s string, e string, tag string",
    ).select(
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "tag",
    )
    out = sorted(
        (r["ts"].isoformat(), r["tag"])
        for r in range_join(
            points, iv, "ts", "s", "e", bucket_seconds=1800
        ).collect()
    )
    assert out == [
        ("2024-01-01T10:00:00", "a"),
        ("2024-01-01T10:29:59", "a"),
        ("2024-01-01T10:30:00", "b"),
    ]
