"""Similarity search over embedding columns (array<float>).

Beyond-reference extension (build brief): ANN over an embedding
column. Two paths:

- ``cosine_topk``: brute-force exact top-k against one probe vector.
  The dot product is ``F.zip_with`` + ``F.aggregate`` — pure Catalyst
  expressions, sequential left-fold so the double result is
  bit-identical to the DuckDB oracle's list_transform+list_sum.
  Scale: a single narrow scan + one small top-k sort; broadcastable
  probe; no shuffle until the final ordering of k rows.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  candidates, brute force runs only inside the probe's bucket(s).
  Hyperplanes derive deterministically from md5 so runs reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic double result)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of a single probe row.

    ``probe`` is a 1-row DataFrame with the same (id, vec) columns;
    it is broadcast, so the plan is scan → narrow projection →
    global top-k (TakeOrderedAndProject) — no wide shuffle.
    """
    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("probe_id"),
            _as_double(F.col(vec_col)).alias("probe_vec"),
        )
    )
    return (
        df.crossJoin(p)
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            F.col(id_col),
            F.round(cosine(_as_double(F.col(vec_col)), F.col("probe_vec")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_sign_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Deterministic random-hyperplane LSH bucket id (0..2^n_planes-1).

    Plane p's component for dimension d is a fixed pseudo-random ±1
    derived from md5(p,d) — no stored model, identical on every
    executor and every run.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        acc = F.lit(0.0)
        for d in range(dim):
            # deterministic ±1 from the md5 hex of (plane, dim)
            h = int(__import__("hashlib").md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            sign = 1.0 if h % 2 == 0 else -1.0
            acc = acc + F.element_at(vec, d + 1).cast("double") * F.lit(sign)
        bucket = bucket + F.when(acc > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    probe: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: only rows in the probe's LSH bucket are
    scored. At 100 TB the bucket column is precomputed + partitioned
    on, turning ANN into a partition-pruned scan of ~1/2^n_planes of
    the data."""
    bucketed = df.withColumn("bucket", hyperplane_sign_bucket(F.col(vec_col), dim, n_planes))
    p = probe.withColumn(
        "bucket", hyperplane_sign_bucket(F.col(vec_col), dim, n_planes)
    ).select(F.col("bucket").alias("probe_bucket"))
    same_bucket = bucketed.join(
        F.broadcast(p), F.col("bucket") == F.col("probe_bucket")
    ).drop("probe_bucket", "bucket")
    return cosine_topk(same_bucket, probe, k, vec_col, id_col)
