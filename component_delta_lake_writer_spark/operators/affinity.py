"""Co-occurrence / association analytics: which items appear together
more often than chance — market-basket lift over (basket, item)
relations. The same primitive prices token/domain co-occurrence in a
training corpus ("these two sources always arrive together — is one a
mirror?") and product affinity in an orders table.

Spark-first shape: pair generation is a self-equi-join on the basket
key — the canonical spelling Catalyst plans as ONE shuffle on the key
with both sides co-partitioned (a sort-merge self-join reuses the
single exchange). Output pairs are Σ C(basket_size, 2) — bounded by
the basket-size cap of the domain, never by corpus size; the docstring
contract is that callers pre-cap pathological baskets (a basket with
10⁶ items is a data bug upstream, not a join strategy problem).
Per-item totals are an item-sized aggregate joined back onto the
TOP-K pairs only (k rows — Spark broadcasts that side), so no
row-space join ever carries the lift arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` item pairs by co-occurrence count, with support and
    lift = P(a,b) / (P(a)·P(b)) over baskets.  Deterministic total
    order (n_pair desc, item_a, item_b) so the top-k SET is stable.

    Plan: distinct (basket, item) → self-join on basket with
    item_a < item_b → count pairs → TakeOrdered top-k → join the two
    item totals onto the k rows (broadcast) → lift as one rounded
    double expression.  The basket count is a one-row aggregate
    cross-joined in (broadcast, metadata-scale).

    Returns (item_a, item_b, n_pair, n_a, n_b, n_baskets, support,
    lift) — support/lift rounded 6dp.
    """
    bi = (
        df.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("basket"),
            F.col(item_col).alias("item"),
        )
        .distinct()
    )
    left = bi.select("basket", F.col("item").alias("item_a"))
    right = bi.select("basket", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .orderBy(
            F.col("n_pair").desc(),
            F.col("item_a").asc(),
            F.col("item_b").asc(),
        )
        .limit(k)
    )
    counts = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    totals = bi.agg(
        F.countDistinct("basket").alias("n_baskets")
    )
    ca = counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    out = (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "item_a",
        "item_b",
        F.col("n_pair").cast("long").alias("n_pair"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_baskets").cast("long").alias("n_baskets"),
        F.round(
            F.col("n_pair").cast("double") / F.col("n_baskets"), 6
        ).alias("support"),
        F.round(
            F.col("n_pair").cast("double")
            * F.col("n_baskets")
            / F.col("n_a")
            / F.col("n_b"),
            6,
        ).alias("lift"),
    )
