"""Co-occurrence / association analytics: which items appear together
more often than chance — market-basket lift over (basket, item)
relations. The same primitive prices token/domain co-occurrence in a
training corpus ("these two sources always arrive together — is one a
mirror?") and product affinity in an orders table.

Spark-first shape: ONE corpus shuffle. The naive spelling is a
self-equi-join of the distinct (basket, item) relation on the basket
key — correct, but it moves the corpus through an exchange once for
the distinct and once per join side, and the per-item totals branch
adds another (the first cut of this operator measured 5 FileScans /
4 corpus-wide exchanges pre-AQE). Instead the corpus is collapsed to
per-basket sorted item arrays in a single groupBy (the funnel/EWMA
collect-and-fold trick); pairs are generated from the array with
higher-order functions (no join), and the item totals and basket
count are derived from the SAME aggregated subtree, so the runtime
exchange is reused across all three consumers. Everything after the
one shuffle runs on ΣC(basket_size, 2) pair rows — bounded by the
ENFORCED ``max_basket_size`` cap, never by corpus size (a 10⁶-item
basket is an upstream data bug, not a join-strategy problem — the
operator raises at action time rather than letting collect_set build
a 10⁶-element array in one task and the pair generator expand
~5·10¹¹ structs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 20,
    max_basket_size: int = 10_000,
) -> DataFrame:
    """Top-``k`` item pairs by co-occurrence count, with support and
    lift = P(a,b) / (P(a)·P(b)) over baskets.  Deterministic total
    order (n_pair desc, item_a, item_b) so the top-k SET is stable.

    Plan: one groupBy(basket) → sorted distinct item array →
    array-generated pairs → pair counts → TakeOrdered top-k → the
    item totals (derived from the same arrays, exchange-reused) join
    onto the k survivors only (broadcast); the basket count is a
    one-row aggregate cross-joined in.

    ``max_basket_size`` is ENFORCED, not advisory (r10 verdict): a
    basket whose distinct-item array exceeds it raises at action
    time, naming the offending basket key, BEFORE the pair generator
    would expand C(size, 2) structs in one task (default 10 000 →
    ≤ ~5·10⁷ pairs per basket, a bounded task; a 10⁶-item basket
    would expand ~5·10¹¹ and OOM the executor).  The check costs
    one codegen'd size() per basket row on the already-aggregated
    subtree — no extra scan or shuffle.

    Returns (item_a, item_b, n_pair, n_a, n_b, n_baskets, support,
    lift) — support/lift rounded 6dp.
    """
    baskets = (
        df.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .groupBy(F.col(basket_col).alias("basket"))
        .agg(F.sort_array(F.collect_set(item_col)).alias("items"))
        # a filter (not a projected guard column) so Catalyst cannot
        # prune the check away; raise_error fires executor-side on
        # the first oversized basket
        .filter(
            F.when(
                F.size("items") > F.lit(max_basket_size),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "basket_lift: basket exceeds "
                            f"max_basket_size={max_basket_size} "
                            "distinct items (basket key: "
                        ),
                        F.col("basket").cast("string"),
                        F.lit(", size: "),
                        F.size("items").cast("string"),
                        F.lit(
                            "); pre-cap or raise max_basket_size"
                        ),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    )
    # all (a, b) with a < b from the sorted array — generated, not
    # joined: for element i, pair it with every later element
    pair_arr = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice(
                    F.col("items"), i + F.lit(2), F.size("items")
                ),
                lambda y: F.struct(
                    x.alias("item_a"), y.alias("item_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .orderBy(
            F.col("n_pair").desc(),
            F.col("item_a").asc(),
            F.col("item_b").asc(),
        )
        .limit(k)
    )
    counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
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
