"""Unit tests for corpus-quality operators (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from component_delta_lake_writer_spark.operators.quality import (
    canonical_url,
    contamination_check,
    repetition_stats,
    url_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_edges(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b a b a b"),          # pure 2-gram repetition
            (2, "one two three four five"),  # no repetition
            (3, "word"),                     # below n-gram sizes
            (4, "x x x x x x x x x x"),      # single-word doc
        ],
    )
    r = {row["doc_id"]: row for row in repetition_stats(df).collect()}
    assert r[2]["dup_2gram_frac"] == 0.0
    assert r[2]["top_word_frac"] == 0.2
    assert r[2]["keep"] is True
    # "a b" repeated: 7 bigrams, 2 distinct → 5/7
    assert abs(r[1]["dup_2gram_frac"] - 5 / 7) < 1e-6
    assert r[1]["top_word_frac"] == 0.5  # 'a' 4/8 > 0.3 → drop
    assert r[1]["keep"] is False
    # single token: no n-grams, fractions defined as 0
    assert r[3]["dup_2gram_frac"] == 0.0 and r[3]["dup_3gram_frac"] == 0.0
    assert r[3]["top_word_frac"] == 1.0 and r[3]["keep"] is False
    # 9 bigrams, 1 distinct → 8/9; top word mass 1.0
    assert abs(r[4]["dup_2gram_frac"] - 8 / 9) < 1e-6
    assert r[4]["keep"] is False


def test_contamination_check_counts_distinct_shared(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    docs = _docs(
        spark,
        [
            # shares two distinct 5-grams with the benchmark
            (1, "alpha beta gamma delta epsilon zeta extra"),
            (2, "totally different words here now again"),
            (3, "tiny"),  # fewer than 5 tokens → no grams, never flagged
        ],
    )
    out = {r["doc_id"]: r["n_shared_ngrams"]
           for r in contamination_check(docs, bench, n=5).collect()}
    assert out == {1: 2}


def test_canonical_url_rules(spark):
    cases = [
        ("HTTPS://Example.COM/Path/?utm_source=x&id=3", "example.com/Path?id=3"),
        ("http://a.b/p#frag", "a.b/p"),
        ("https://a.b/p/?utm_source=1&utm_campaign=2", "a.b/p"),
        ("https://a.b", "a.b"),
        ("https://a.b/?b=2&a=1", "a.b?a=1&b=2"),  # params sorted
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_groups_and_keeper(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.b/p?utm_source=x"),
            (2, "HTTPS://A.B/p/"),
            (3, "https://a.b/q"),
        ],
        "doc_id long, url string",
    )
    rows = url_dedup(df).collect()
    assert len(rows) == 1
    assert rows[0]["curl"] == "a.b/p"
    assert rows[0]["n_docs"] == 2 and rows[0]["keeper_id"] == 1
