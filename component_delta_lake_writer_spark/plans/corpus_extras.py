"""Third wave of training-pipeline probes: corpus mixing report,
quality-weighted importance sampling, seeded k-means semantic
clustering. Same float-determinism rules as query_registry (sequential
folds for within-row math, round→decimal for cross-row double sums,
DOUBLE-only presentation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from component_delta_lake_writer_spark.plans.query_registry import query
from component_delta_lake_writer_spark.tables import load_table

_BUCKET_SQL = "(('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 8))::BIGINT % 100)"
_TOKENS_SQL = "len(string_split_regex(trim(text), '\\s+'))"


@query(
    "corpus_mix_report",
    oracle=f"""
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n_docs,
        SUM({_TOKENS_SQL}) AS n_tokens
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
      ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
        AS token_share
    FROM per
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture report (operators.quality.mix_report): per
    (source, lang) doc/token counts and the group's share of all
    corpus tokens — what a pretraining run reads to set sampling
    ratios. Integer token sums are exact; the share is one double
    division, rounded for presentation."""
    from component_delta_lake_writer_spark.operators.quality import mix_report

    return mix_report(load_table(spark, sf_dir, "documents"))


@query(
    "importance_sample_docs",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
        CASE WHEN n_chars >= 400 THEN 90
             WHEN n_chars >= 200 THEN 50
             ELSE 10 END AS rate
      FROM documents
    )
    SELECT source, COUNT(*) AS n_sampled,
      CAST(SUM(CAST(ROUND(100.0 / rate, 6) AS DECIMAL(18,6))) AS DOUBLE)
        AS est_total_docs,
      MIN(doc_id) AS min_id
    FROM rated
    WHERE {_BUCKET_SQL.format(id='doc_id')} < rate
    GROUP BY source
    """,
)
def importance_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling (operators.sampling.importance_sample):
    longer documents kept at 90%, medium at 50%, short at 10%, each
    kept row carrying its inverse-probability weight. The per-source
    weight sum is an unbiased estimate of the full corpus size — the
    check that the weights are actually usable. Weight sums go through
    the round→decimal idiom (order-free, engine-exact)."""
    from component_delta_lake_writer_spark.operators.sampling import (
        importance_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("n_chars") >= 400, F.lit(90))
        .when(F.col("n_chars") >= 200, F.lit(50))
        .otherwise(F.lit(10))
    )
    s = importance_sample(docs, "doc_id", rate)
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("weight").cast("decimal(18,6)"))
        .cast("double")
        .alias("est_total_docs"),
        F.min("doc_id").alias("min_id"),
    )


_D2_SQL = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> ({x}[i] - {c}[i]) * ({x}[i] - {c}[i])), (a, b) -> a + b)"
)


@query(
    "kmeans_embedding_clusters",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id AS pid,
        list_transform(generate_series(1, 64),
                       i -> CAST(embedding[i] AS DOUBLE)) AS x
      FROM embeddings
    ),
    c0 AS (SELECT pid AS cid, x AS c FROM pts WHERE pid < 8),
    a1 AS (
      SELECT pid, x, cid FROM (
        SELECT p.pid, p.x, c.cid,
          ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
            {_D2_SQL.format(x='p.x', c='c.c')}, c.cid) AS rn
        FROM pts p CROSS JOIN c0 c) t
      WHERE rn = 1
    ),
    comp1 AS (
      SELECT cid, i AS pos,
        CAST(SUM(CAST(ROUND(x[i], 6) AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(*) AS m
      FROM a1 CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY cid, i
    ),
    c1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM comp1 GROUP BY cid),
    a2 AS (
      SELECT pid, cid, d2 FROM (
        SELECT p.pid, c.cid,
          {_D2_SQL.format(x='p.x', c='c.c')} AS d2,
          ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
            {_D2_SQL.format(x='p.x', c='c.c')}, c.cid) AS rn
        FROM pts p CROSS JOIN c1 c) t
      WHERE rn = 1
    )
    SELECT cid AS cluster_id, COUNT(*) AS n_points,
      CAST(SUM(CAST(ROUND(d2, 6) AS DECIMAL(20,6))) AS DOUBLE) AS inertia
    FROM a2 GROUP BY cid
    """,
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Lloyd k-means (operators.similarity.kmeans_clusters,
    k=8, 2 iterations) — semantic clustering for cluster-then-sample /
    SemDeDup-style pipelines. The ENTIRE iteration (seed init,
    argmin assignment, exact-decimal centroid update, re-assignment)
    is mirrored in the oracle CTE chain, so this is a full
    differential check of an iterative ML operator, not a smoke
    test. Output: per-cluster sizes + exact-presented inertia."""
    from component_delta_lake_writer_spark.operators.similarity import (
        kmeans_clusters,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    asg = kmeans_clusters(emb, k=8, lloyd_iterations=2)
    return asg.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.round(F.col("dist2"), 6).cast("decimal(20,6)"))
        .cast("double")
        .alias("inertia"),
    )
