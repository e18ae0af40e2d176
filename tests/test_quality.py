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


def test_unigram_logprob_hand_checked(spark):
    from component_delta_lake_writer_spark.operators.quality import (
        unigram_logprob,
    )

    # corpus: 4 tokens total — "a" ×2 (p=.5 → 1 bit), "b","c" ×1 (2 bits)
    df = _docs(spark, [(1, "a a"), (2, "b c")])
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[1]["n_tokens"] == 2 and out[2]["n_tokens"] == 2
    assert out[1]["bits_per_token"] == 1.0
    assert out[2]["bits_per_token"] == 2.0


def test_repeated_spans_counts(spark):
    from component_delta_lake_writer_spark.operators.quality import (
        repeated_spans,
    )

    boiler = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            (1, boiler + " tail1"),
            (2, boiler + " tail2"),
            (3, "prefix " + boiler),
            (4, "completely unrelated words that never repeat at all"),
            (5, "short"),
        ],
    )
    rows = repeated_spans(df, n=8, min_docs=3).collect()
    assert len(rows) == 1
    assert rows[0]["span"] == boiler
    assert rows[0]["n_docs"] == 3 and rows[0]["n_occurrences"] == 3


def test_domain_cap_prefers_longest(spark):
    from component_delta_lake_writer_spark.operators.sampling import domain_cap

    df = spark.createDataFrame(
        [(i, "s1", 100 - i) for i in range(5)]
        + [(10, "s2", 7), (11, "s2", 7)],
        "doc_id long, source string, n_chars int",
    )
    kept = domain_cap(df, "source", 2, "n_chars", "doc_id")
    got = sorted((r["source"], r["doc_id"]) for r in kept.collect())
    # s1: two largest n_chars (ids 0,1); s2: n_chars tie → lowest ids
    assert got == [("s1", 0), ("s1", 1), ("s2", 10), ("s2", 11)]


def test_token_budget_prefix_reaches_budget(spark):
    from component_delta_lake_writer_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(1, "s", 400), (2, "s", 500), (3, "s", 1), (4, "t", 5000)],
        "doc_id long, source string, n_tokens long",
    )
    kept = token_budget_sample(df, "source", 800, "n_tokens", "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # s: 400 then 900 ≥ 800 stops AFTER crossing (row 2 kept, row 3 not);
    # t: first row always kept even though it alone exceeds the budget
    assert ids == [1, 2, 4]


def test_bigram_lift_single_token_docs(spark):
    """Review finding: sequence(1, 0) is DESCENDING [1,0] and
    element_at(toks, 0) raises — one short doc killed bigram_lift."""
    from component_delta_lake_writer_spark.operators.quality import (
        bigram_lift,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "big data big data")],
        "doc_id long, text string",
    )
    got = bigram_lift(df, min_count=1, top_n=10).collect()
    assert any(r["w1"] == "big" and r["w2"] == "data" for r in got)


def test_canonical_url_malformed_and_fragment(spark):
    """Review findings: scheme-less/NULL urls must canonicalize to
    NULL (not '' which grouped unrelated docs as dups), and a '?'
    inside the fragment must not leak into the canonical query."""
    from pyspark.sql import functions as F

    from component_delta_lake_writer_spark.operators.quality import (
        canonical_url,
        url_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "www.example.com/a"),          # no scheme
            (2, "www.other.org/b"),            # no scheme
            (3, None),                          # NULL url
            (4, "https://a.com/page#sec?b=1"),  # '?' inside fragment
            (5, "https://a.com/page"),
            (6, "https://A.COM/page/"),
        ],
        "doc_id long, url string",
    )
    c = {r["doc_id"]: r["c"]
         for r in df.select("doc_id", canonical_url(F.col("url")).alias("c"))
         .collect()}
    assert c[1] is None and c[2] is None and c[3] is None
    assert c[4] == c[5] == c[6] == "a.com/page"
    groups = url_dedup(df).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 3


def test_repetition_stats_keeps_null_text_docs(spark):
    from component_delta_lake_writer_spark.operators.quality import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "a a a a a a"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(got) == {1, 2}, "NULL-text doc must not vanish"


def test_punct_ratio_unicode_text(spark):
    """Review finding: ASCII-only \\w counted every CJK/accented char
    as punctuation, tanking quality for non-English text."""
    from pyspark.sql import functions as F

    from component_delta_lake_writer_spark.operators.text import punct_ratio

    df = spark.createDataFrame(
        [(1, "café résumé naïve"), (2, "你好世界测试文本")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["p"]
           for r in df.select(
               "doc_id", F.round(punct_ratio(F.col("text")), 4).alias("p")
           ).collect()}
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_bigram_lm_perplexity_hand_values(spark):
    """Add-0.1 bigram LM on a hand corpus: train 'a b a b c'
    (c12: ab=2, ba=1, bc=1; contexts a=2 b=2; V=3), score 'a b z' —
    seen bigram + unseen continuation degrade smoothly, no
    special-case branch."""
    import math

    from pyspark.sql import functions as F

    from component_delta_lake_writer_spark.operators.quality import (
        bigram_lm_perplexity,
    )

    train = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(2, "a b z"), (3, "q")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in bigram_lm_perplexity(target, train=train).collect()
    }
    assert 3 not in rows  # single-token doc has no bigram: unscored
    r = rows[2]
    t_ab = round(-math.log((2 + 0.1) / (2 + 0.3)), 4)
    t_bz = round(-math.log((0 + 0.1) / (2 + 0.3)), 4)
    avg = round((t_ab + t_bz) / 2, 6)
    assert r.n_bigrams == 2
    assert r.avg_neg_logp == avg
    assert r.perplexity == round(math.exp(avg), 6)


def test_bigram_lm_perplexity_join_distributed_mode(spark):
    """broadcast_model=False (the >1e7-bigram scale path) produces
    identical scores through shuffle joins."""
    from component_delta_lake_writer_spark.operators.quality import (
        bigram_lm_perplexity,
    )

    train = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(2, "a b z")], "doc_id long, text string"
    )
    a = bigram_lm_perplexity(target, train=train).collect()
    b = bigram_lm_perplexity(
        target, train=train, broadcast_model=False
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ngram_helpers_edge_whitespace(spark):
    """r11 review: leading/trailing NON-space whitespace (trim strips
    only spaces) must not duplicate or drop grams — both helpers
    tokenize artifact-free, matching the updated oracles."""
    from pyspark.sql import functions as F

    from component_delta_lake_writer_spark.operators.quality import (
        _bigram_array_fast,
        _ngrams,
        _tokens,
    )

    df = spark.createDataFrame(
        [("\tfoo bar baz",), ("foo bar baz\n",), ("\nx\t",)],
        "t string",
    )
    got2 = [
        sorted(r.g)
        for r in df.select(
            F.sort_array(_bigram_array_fast(F.col("t"))).alias("g")
        ).collect()
    ]
    assert got2 == [["bar baz", "foo bar"], ["bar baz", "foo bar"], []]
    got_n = [
        sorted(r.g)
        for r in df.select(
            F.sort_array(_ngrams(_tokens(F.col("t")), 2)).alias("g")
        ).collect()
    ]
    assert got_n == [["bar baz", "foo bar"], ["bar baz", "foo bar"], []]


def test_bpe_train_merges_hand_values(spark):
    """Known corpus: merges come out in the textbook order with
    frequency-weighted counts aggregated ACROSS documents, ties
    broken by (left, right) lexicographic order, and punctuation /
    case folded away by the word tokenizer."""
    from component_delta_lake_writer_spark.operators.text import (
        bpe_train_merges,
    )

    texts = [
        "the cat sat on the mat",
        "the hat and the bat",
        "that cat, that hat!",
        "low lower lowest newer newest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        tuple(r)
        for r in bpe_train_merges(df, n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    # hand-derived: 'at' appears in cat/sat/mat/hat/bat/that(x2 docs)
    assert got == [
        (1, "a", "t", 9),
        (2, "t", "h", 6),
        (3, "th", "e", 4),
        (4, "w", "e", 4),
        (5, "l", "o", 3),
        (6, "c", "at", 2),
    ]
