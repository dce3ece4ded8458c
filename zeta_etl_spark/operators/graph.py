"""Graph-construction operators.

``cobasket_pairs`` replaces the classic pair-generation SELF-JOIN

    SELECT a.item, b.item FROM i a JOIN i b
    ON a.key = b.key AND a.item < b.item

with a per-key ``collect_set`` + bounded array expansion: one exchange by
``key`` (partial-aggregated map-side) instead of three (distinct +
re-shuffle of BOTH join sides), and no join at all.  Work per key is
|basket|², exactly the self-join's bound — use it only where the per-key
fan-out is bounded (order baskets, capped top-k lists), never on
unbounded keys, where the array itself would be the skew problem the
join-based form shares anyway.

The expansion sorts each set once and emits (u, v) with u < v — the same
pair set, pair-for-pair, as the self-join with a ``<`` predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def basket_arrays(df: DataFrame, key: str, item: str) -> DataFrame:
    """(key, sorted distinct-item array) — one exchange, map-side combined."""
    return df.groupBy(key).agg(
        F.array_sort(F.collect_set(item)).alias("items")
    )


def pairs_from_arrays(
    arrays: DataFrame, out_u: str = "u", out_v: str = "v"
) -> DataFrame:
    """Expand sorted arrays to (u, v) pairs with u < v (multiset over keys)."""
    pair_expr = (
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), "
        "y -> struct(x AS u, y AS v))))"
    )
    return arrays.select(F.explode(F.expr(pair_expr)).alias("_p")).select(
        F.col("_p.u").alias(out_u), F.col("_p.v").alias(out_v)
    )


def cobasket_pairs(
    df: DataFrame,
    key: str,
    item: str,
    out_u: str = "u",
    out_v: str = "v",
) -> DataFrame:
    """All within-key unordered item pairs (u < v), one row per key that
    contains both — the exact row multiset of the distinct-items self-join."""
    return pairs_from_arrays(basket_arrays(df, key, item), out_u, out_v)


def ordered_pairs_from_arrays(
    arrays: DataFrame, out_u: str = "u", out_v: str = "v"
) -> DataFrame:
    """Expand distinct-item arrays to DIRECTED (u, v) pairs with u != v —
    the row multiset of the self-join with a ``<>`` predicate.  Items must
    be distinct within each array (they are for every grouped-distinct
    basket); work per key is |items|·(|items|−1), the self-join's bound."""
    pair_expr = (
        "flatten(transform(items, x -> "
        "transform(filter(items, y -> NOT (y <=> x)), "
        "y -> struct(x AS u, y AS v))))"
    )
    return arrays.select(F.explode(F.expr(pair_expr)).alias("_p")).select(
        F.col("_p.u").alias(out_u), F.col("_p.v").alias(out_v)
    )


def topk_items_by_score(
    df: DataFrame,
    key: str,
    item: str,
    score: str,
    k: int,
) -> DataFrame:
    """(key, items) where ``items`` holds the key's top-``k`` items by
    (score DESC, item ASC) — exactly the rows ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY score DESC, item) <= k keeps, in rank
    order.

    Shape: the rank cap stays a WINDOW (codegen sort, spills gracefully at
    any per-key cardinality), and the capped rows collapse to per-key
    arrays in a groupBy that REUSES the window's hash partitioning — no
    new exchange.  An earlier form collected the FULL per-key item list
    and sliced in-array; that put the whole uncapped group into
    ObjectHashAggregate state, whose sort-based fallback made it 6× slower
    at sf1 under memory pressure — the guide §1.1 "ideal plan, slower in
    practice" gotcha.  Per-group state here is ≤ k structs."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(score).desc(), F.col(item))
    capped = (
        df.select(key, item, F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= k)
    )
    return capped.groupBy(key).agg(
        F.expr(
            f"transform(array_sort(collect_list(struct(_rn, {item}))), "
            f"p -> p.{item})"
        ).alias("items")
    )


def capped_postings(
    df: DataFrame, key: str, item: str, cap: int
) -> DataFrame:
    """(key, ids) posting lists for keys whose row count is <= ``cap`` —
    ``ids`` sorted ascending; keys above the cap are dropped entirely.

    Bounded-state shape (guide §5, VERDICT r13 #4): the cap is enforced
    BEFORE any array exists.  ``count(*) over (partition by key)`` rides
    the single exchange (the groupBy below reuses the window's hash
    partitioning), the window buffer holds plain rows and spills
    gracefully, and only sub-cap groups reach the ``collect_list`` — so
    no aggregation entry ever holds more than ``cap`` elements.  A
    collect-then-filter form materializes a hot key's FULL posting array
    in one ObjectHashAggregate entry before dropping it: at 100 TB a
    stop-token shared by millions of rows is a single multi-GB entry.
    """
    from pyspark.sql import Window

    kept = df.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy(key))
    ).where(F.col("_df") <= cap)
    return kept.groupBy(key).agg(
        F.array_sort(F.collect_list(item)).alias("ids")
    )
