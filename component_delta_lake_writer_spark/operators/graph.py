"""Iterative graph computation on DataFrames: PageRank.

The link-analysis pass of a web-corpus pipeline (rank-weighted
sampling of crawled documents — the original reason PageRank exists
is literally training-data curation). Spark-first shape: each power
iteration is one edges⋈ranks join + one aggregation; the edge table
is the only big relation and is scanned once per iteration, ranks are
node-sized. Iteration count is fixed (pipelines run a handful), not
convergence-polled — no driver round-trips.

Determinism contract (the same bar as kmeans/PQ): per-edge
contributions are rounded and accumulated as DECIMAL so the per-node
sum is order-free, making every iteration — and therefore the final
ranks — bit-identical to the unrolled SQL oracle at any parallelism.
Dangling-node mass is dropped (identically on both engines), the
standard simplification when ranks are used for relative weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an edge list (multi-edges count).
    Returns (node, rank) for every node."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                "dst",
                F.round(F.col("rank") / F.col("od"), 12)
                .cast("decimal(28,12)")
                .alias("w"),
            )
        )
        sums = contrib.groupBy("dst").agg(
            F.sum("w").cast("double").alias("s")
        )
        ranks = nodes.join(
            sums, nodes["node"] == sums["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks
