"""Frequent-itemset mining (the Apriori 2-phase core) over basket
tables — co-occurrence statistics a curation pipeline uses for
tag/entity affinity, template detection, and negative-mining pools.

Design for 100 TB: the classic blow-up is the per-basket pair explosion
(quadratic in basket size × corpus). The Apriori property prunes it
BEFORE the quadratic step: an item pair can only reach ``min_pair``
support if both items individually do, so baskets are first
join-filtered to frequent items (the frequent-item dimension is
bounded above by total_rows / min_item — small when ``min_item`` is
set proportionally to the corpus, in which case AQE broadcasts the
filter join; with a too-low floor it degrades to a keyed shuffle join,
never a collect), and only then self-joined per basket. The pair join
is co-partitioned on the basket key; pair counting is one map-side-
combinable aggregation. Nothing quadratic in the corpus ever forms.

Both public operators (``frequent_item_pairs``,
``cooccurrence_cosine_topk``) and the k-core edge build share the one
``basket_pairs`` pipeline, so the scale guarantees live in a single
place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def basket_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item: int,
    max_basket_items: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """THE shared Apriori-pruned pair pipeline (see module docstring):
    dedupe (basket, item), count item supports, drop items below
    ``min_item``, self-join per basket, count pairs.

    Returns ``(pairs, deg)``: pairs = (item_1 < item_2, co_count
    BIGINT) over surviving items only; deg = (item, n BIGINT) supports
    of the surviving items (taken BEFORE the pair join, so they are
    true basket-set sizes).

    BOUND: Apriori pruning bounds WHICH items pair, not how many pairs
    one basket emits — a single pathological mega-basket of s frequent
    items still yields s·(s−1)/2 pairs that no support floor can prune.
    Pass ``max_basket_items`` to make that loud: the plan then audits
    per-basket sizes AFTER the frequent-item filter (one extra
    map-side-combinable count, co-partitioned with the pair join) and
    the job FAILS with the offending basket named if any exceeds the
    cap — the same raise-don't-wrap treatment the dhash geometry and
    gram-matrix overflow guards use. With the cap, pair volume is
    ≤ n_baskets·cap²/2 by construction. Default None preserves the
    documented-unbounded contract for trusted inputs.
    """
    b = baskets.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    deg = (
        b.groupBy("item")
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") >= min_item)
    )
    # bounded by total_rows/min_item — broadcastable ONLY when min_item
    # is set proportionally to the corpus (a fixed min_item=3 at 100 TB
    # leaves a huge dimension). No forced hint: AQE broadcasts it when
    # it is small and falls back to a shuffle join when it is not.
    fb = b.join(deg.select("item"), "item")
    if max_basket_items is not None:
        sizes = fb.groupBy("basket").agg(
            F.count("*").cast("long").alias("_bsz")
        )
        fb = (
            fb.join(sizes, "basket")
            .where(
                F.assert_true(
                    F.col("_bsz") <= F.lit(max_basket_items),
                    F.concat(
                        F.lit("basket_pairs: basket "),
                        F.col("basket").cast("string"),
                        F.lit(" has "),
                        F.col("_bsz").cast("string"),
                        F.lit(
                            f" frequent items > max_basket_items="
                            f"{max_basket_items}; its pair fan-out is "
                            "quadratic and Apriori cannot prune it"
                        ),
                    ),
                ).isNull()
            )
            .drop("_bsz")
        )
    pairs = (
        fb.alias("a")
        .join(fb.alias("b"), "basket")
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_1"),
            F.col("b.item").alias("item_2"),
        )
        .agg(F.count("*").cast("long").alias("co_count"))
    )
    return pairs, deg


def frequent_item_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item: int = 3,
    min_pair: int = 2,
    k: int = 15,
) -> DataFrame:
    """Top-``k`` co-occurring item pairs with support ≥ ``min_pair``,
    mined only over items with individual support ≥ ``min_item``
    (Apriori pruning — see module docstring for the scale argument).

    Support counts baskets, not rows: duplicate (basket, item) rows
    collapse first. Returns (item_1, item_2, pair_support) with
    item_1 < item_2, ordered by (pair_support desc, item_1, item_2).
    """
    pairs, _deg = basket_pairs(baskets, basket_col, item_col, min_item)
    return (
        pairs.where(F.col("co_count") >= min_pair)
        .select("item_1", "item_2", F.col("co_count").alias("pair_support"))
        .orderBy(F.desc("pair_support"), "item_1", "item_2")
        .limit(k)
    )


def cooccurrence_cosine_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item: int = 2,
    k: int = 20,
) -> DataFrame:
    """Item-item cosine similarity from co-occurrence — the classic
    item-based collaborative-filtering primitive: with Γᵢ the basket
    set of item i, sim(i, j) = |Γᵢ∩Γⱼ| / √(|Γᵢ|·|Γⱼ|) (cosine of the
    binary basket-incidence vectors).

    All counts are exact BIGINTs from the shared ``basket_pairs``
    pipeline (items below ``min_item`` support are out of scope by
    contract — they cannot affect any surviving pair's numerator OR
    denominator, since degrees are taken before pruning); the degree
    product is computed in DOUBLES (n₁·n₂ can pass 2⁶³ when both items
    sit in billions of baskets — a BIGINT product would wrap to NaN
    cosines that SORT FIRST under desc), and the division + sqrt are
    IEEE-deterministic, so the top-k cut is reproducible cross-engine,
    with (item_1, item_2) tie-breaks.

    Scale: inherits ``basket_pairs``' bounds; degree annotation is two
    keyed joins against the item-degree dimension; the global top-k
    lowers to TakeOrderedAndProject. Returns (item_1, item_2, co_count,
    n_1, n_2, cosine) ordered by (cosine desc, item_1, item_2).
    """
    pairs, deg = basket_pairs(baskets, basket_col, item_col, min_item)
    d1 = deg.select(F.col("item").alias("item_1"), F.col("n").alias("n_1"))
    d2 = deg.select(F.col("item").alias("item_2"), F.col("n").alias("n_2"))
    scored = (
        pairs.join(d1, "item_1")
        .join(d2, "item_2")
        .select(
            "item_1", "item_2", "co_count", "n_1", "n_2",
            (
                F.col("co_count").cast("double")
                / F.sqrt(
                    F.col("n_1").cast("double") * F.col("n_2").cast("double")
                )
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), "item_1", "item_2").limit(k)
