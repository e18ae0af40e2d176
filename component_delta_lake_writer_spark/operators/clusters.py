"""Duplicate-cluster resolution: connected components over near-dup
pairs (the step after minhash_dedup in a real dedup pipeline — each
document keeps the canonical representative of its duplicate cluster).

This is the engine's one genuinely iterative operator (label
propagation to fixpoint), so it is NOT SQL-expressible in a single
oracle query — the driver records a rows-only check and the tests
verify against a driver-side union-find on the same pairs.

Algorithm (large-graph-safe): start with label(v) = v, repeatedly set
label(v) = min(label(v), min(label(neighbor))) via a join over the
(undirected) edge list until no label changes. Converges in
O(diameter) rounds; each round is two hash joins + a groupBy — all
shuffle-partitioned on the vertex id. Dedup-cluster graphs have tiny
diameter (near-clique clusters), so rounds ≈ 2-3 in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Returns (id, component) — component = min vertex id reachable.

    ``edges`` is an undirected pair list (each pair once, any order).
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.persist()
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("u", "id")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame, id_col_a: str = "id_a", id_col_b: str = "id_b"
) -> DataFrame:
    """Cluster near-dup pairs and pick the canonical keeper (min id):
    returns (id, keep_id, is_keeper)."""
    comp = connected_components(pairs, id_col_a, id_col_b)
    return comp.select(
        "id",
        F.col("component").alias("keep_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
