"""Orderbook-snapshot pipeline: depth-by-spread-bucket analytics and
market-maker quality metrics — the engine's re-expression of
dlt-pipelines/zetadex-orderbook-snapshot-pipeline.py.

Reference parity map:
- bronze snapshot schema (bids/asks array<struct>): :39-61
- explode bids/asks + MM whitelist inner join (J2): :97-102,157-161
- spread-bucket when-chain (2.5→50 bps): :122-142
- bids ∪ asks union (U2/T4): :216-222
- per-bucket depth agg (A1): :235-249
- literal market-params dim with derived weights + assert (S4): :290-419
- VWAP (A5) + first-non-null mark price (A4 → max_by): :493-498
- best bid/ask per group (W9) + MM quality score: zetadex-mm-uptime-pipeline-v3.sql:38-39
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.plans.graph import Pipeline

ORDERBOOK_SCHEMA = (
    "asset string, local_timestamp timestamp_ntz, exchange_timestamp timestamp_ntz, "
    "midpoint double, mark_price double, "
    "bids array<struct<price double, size double, open_order_address string, "
    "authority string>>, "
    "asks array<struct<price double, size double, open_order_address string, "
    "authority string>>"
)

PUBKEY_LABEL_SCHEMA = "pub_key string, label string, organisation string"

# S4 literal dim (reference builds 13 rows in-code with derived weights and
# asserts they sum to 1.0 — :399-411)
MARKET_PARAMS = [
    ("SOL", 0.5), ("BTC", 0.3), ("ETH", 0.2),
]


def market_params_df(spark: SparkSession) -> DataFrame:
    total = sum(w for _, w in MARKET_PARAMS)
    # explicit raise, not assert: config validation must survive python -O
    if abs(total - 1.0) >= 1e-9:
        raise ValueError(f"market weights must sum to 1, got {total}")
    return spark.createDataFrame(
        [(a, w, w / total) for a, w in MARKET_PARAMS],
        "asset string, raw_weight double, weight double",
    )


def _spread_bucket(side_price: F.Column, mid: F.Column) -> F.Column:
    """Spread buckets in bps from midpoint (:122-142 when-chain)."""
    bps = F.abs(side_price - mid) / mid * 10_000
    return (
        F.when(bps <= 2.5, "0-2.5bps")
        .when(bps <= 5, "2.5-5bps")
        .when(bps <= 10, "5-10bps")
        .when(bps <= 25, "10-25bps")
        .when(bps <= 50, "25-50bps")
        .otherwise(">50bps")
    )


def build_orderbook_pipeline(
    spark: SparkSession,
    base_path: str,
    snapshots: DataFrame,
    pubkey_labels: DataFrame,
) -> Pipeline:
    p = Pipeline("zetadex_orderbook", base_path)

    @p.table(quality="bronze")
    def raw_snapshots(pl) -> DataFrame:
        return snapshots

    @p.table(quality="silver")
    def labeled_levels(pl) -> DataFrame:
        # explode both sides, tag, union (U2), whitelist join (J2)
        snaps = pl.read("raw_snapshots")
        bids = snaps.select(
            "asset",
            "local_timestamp",
            "midpoint",
            "mark_price",
            F.lit("bid").alias("side"),
            F.explode("bids").alias("level"),
        )
        asks = snaps.select(
            "asset",
            "local_timestamp",
            "midpoint",
            "mark_price",
            F.lit("ask").alias("side"),
            F.explode("asks").alias("level"),
        )
        levels = bids.unionByName(asks).select(
            "asset",
            "local_timestamp",
            "midpoint",
            "mark_price",
            "side",
            F.col("level.price").alias("price"),
            F.col("level.size").alias("size"),
            F.col("level.authority").alias("authority"),
        )
        labels = pl.read("labels_dim")
        return levels.join(
            F.broadcast(labels), levels.authority == labels.pub_key, "inner"
        ).drop("pub_key")

    @p.table(quality="silver")
    def labels_dim(pl) -> DataFrame:
        return pubkey_labels

    @p.table(quality="gold")
    def depth_by_spread_bucket(pl) -> DataFrame:
        lv = pl.read("labeled_levels").withColumn(
            "spread_bucket", _spread_bucket(F.col("price"), F.col("midpoint"))
        )
        return lv.groupBy(
            F.date_trunc("minute", "local_timestamp").alias("minute_ts"),
            "asset",
            "side",
            "spread_bucket",
        ).agg(
            dec_sum(F.col("price") * F.col("size"), "notional_depth"),
            dec_sum("size", "total_size"),
            F.countDistinct("authority").alias("n_makers"),
        )

    @p.table(quality="gold")
    def mm_quality(pl) -> DataFrame:
        # per (snapshot, asset, authority): best bid/ask (W9), VWAP (A5),
        # mark price via max_by (A4), then weight-scaled quality score (S4 dim)
        lv = pl.read("labeled_levels")
        per_mm = lv.groupBy("local_timestamp", "asset", "authority", "label").agg(
            F.max(F.when(F.col("side") == "bid", F.col("price"))).alias("best_bid"),
            F.min(F.when(F.col("side") == "ask", F.col("price"))).alias("best_ask"),
            (
                F.sum(
                    (F.col("price") * F.col("size")).cast("DECIMAL(32,6)")
                ).cast("double")
                / F.nullif(
                    F.sum(F.col("size").cast("DECIMAL(32,6)")).cast("double"),
                    F.lit(0.0),
                )
            ).alias("vwap"),
            F.max_by("mark_price", "local_timestamp").alias("mark_price"),
            dec_sum("size", "quoted_size"),
            F.min("price").alias("min_quote"),
            F.max("price").alias("max_quote"),
        )
        params = market_params_df(spark)
        scored = per_mm.join(F.broadcast(params), "asset", "left").withColumn(
            "two_sided",
            (F.col("best_bid").isNotNull() & F.col("best_ask").isNotNull()).cast(
                "int"
            ),
        )
        return scored.withColumn(
            "quality_score",
            F.coalesce(F.col("weight"), F.lit(0.0))
            * F.col("two_sided")
            * F.col("quoted_size"),
        )

    return p
