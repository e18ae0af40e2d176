"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Beyond-reference extension (build brief): the dedup family a training
-data pipeline needs, each expressed as compositions of built-in
DataFrame ops so they scale as ordinary shuffles:

- exact: fingerprint (md5 of normalized text) → groupBy. One shuffle
  on a 32-char key; skew-free by construction (hash keys).
- MinHash+LSH: shingle explode → per-doc min over a pairwise-
  independent hash family (map-side combinable groupBy) → band keys →
  self-join on (band, key) for candidates → exact-Jaccard verify on
  candidates only. The classic near-linear near-dup pipeline: the
  O(n²) pair space is never materialized, only hash-bucket collisions.
- SimHash: sign-aggregated token hashes → 32-bit signature; near-dups
  = signatures at small Hamming distance found via band keys.
- n-gram Jaccard: exact verify used by the LSH candidates (and usable
  standalone on any candidate pair set).

All hashes derive from md5 (first 8 hex chars → uint32) so the DuckDB
oracle can reproduce them bit-for-bit; the LCG hash family
(a*h+b) % p uses constants small enough that a*h stays inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from component_delta_lake_writer_spark.operators.text import fingerprint, normalize_text

# (a, b) pairs for the universal hash family (a*h + b) mod P.
# a < 2^31, h < 2^32 → a*h < 2^63: no int64 overflow.
HASH_FAMILY: list[tuple[int, int]] = [
    (1664525, 1013904223),
    (22695477, 1),
    (69069, 12345),
    (1103515245, 12345),
    (134775813, 1),
    (214013, 2531011),
    (1140671485, 12820163),
    (65793, 4282663),
]
MERSENNE_P = 4294967311  # prime > 2^32


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact near-free dedup: keep the min-id representative per
    normalized-text fingerprint. Returns (fingerprint, keep_id, n_dups).
    """
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Distinct character k-shingle hashes per doc: (id, h:uint32).

    Shingling is expressed as sequence+transform+explode — pure
    Catalyst expressions, no Python. ``h`` is the first 8 md5 hex
    chars as an integer (oracle-reproducible).
    """
    norm = normalize_text(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))
                    ),
                    lambda i: F.substring(norm, i, k),
                )
            ).alias("shingle"),
        )
        .select(
            F.col(id_col),
            F.expr("CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT)").alias("h"),
        )
        .distinct()
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature columns m0..m{k-1}. Single map-side-
    combinable groupBy over the shingle stream."""
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(HASH_FAMILY)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sig: DataFrame, id_col: str = "doc_id", bands: int = 4
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band.

    Bands are string keys m_i||'_'||m_j; the self-join runs on
    (band_idx, band_key) after an explode — a hash-partitioned
    equi-join, never an O(n²) cross product.
    """
    k = len(HASH_FAMILY)
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.concat_ws("_", *[p.cast("string") for p in parts])
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, sh: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only.

    intersection via equi-join on shingle hash; union by
    inclusion-exclusion from per-doc distinct counts.
    """
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    # intersection via two keyed equi-joins (planner-friendly)
    sha = sh.select(F.col(id_col).alias("id_a"), "h")
    shb = sh.select(F.col(id_col).alias("id_b"), "h")
    inter = (
        candidates.join(sha, "id_a")
        .join(shb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        candidates.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"inter": 0})
        .join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH → verify.
    Returns (id_a, id_b, jaccard) pairs above the threshold."""
    sh = shingles(df, text_col, id_col, k_shingle)
    sig = minhash_signatures(sh, id_col)
    cand = lsh_candidates(sig, id_col)
    return jaccard_verify(cand, sh, id_col, threshold)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """32-bit SimHash over whitespace tokens: for each bit, sign of the
    sum of ±1 token votes. Explode + conditional sums — one shuffle."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), r"\s+")).alias("tok"),
    ).select(
        F.col(id_col),
        F.expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)").alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("bigint")
    for i in range(bits):
        sig = sig + F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(0)
    return agg.select(F.col(id_col), sig.alias("simhash"))
