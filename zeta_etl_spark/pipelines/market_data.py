"""Market-data pipeline — re-expression of the prices / competitor-stats /
platform-monitoring trio (dlt-pipelines/zetadex-prices-pipeline.py,
zetadex-competitor-stats-pipeline.py, zetadex-platform-monitoring-pipeline.py).

Reference parity map:
- spot-price stream with intra-hour dedup (A8/T6):
  zetadex-prices-pipeline.py:71-78 (`dropDuplicates(["underlying","date_",
  "hour_"])` under watermark) — batch form uses deterministic latest-wins.
- hourly price table + latest snapshot: :190-228
- competitor asset normalization (`-PERP` suffix, `1M` prefix):
  zetadex-competitor-stats-pipeline.py:85-88
- zeta ∪ competitors unionAll (U2): :92
- y/m/d/h partition-string reassembly via format_string:
  zetadex-platform-monitoring-pipeline.py:139
- venue/asset-partitioned layout (§1.3): :132
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.operators.cdc import latest_by_keys
from zeta_etl_spark.plans.graph import Pipeline

PRICES_SCHEMA = "underlying string, timestamp timestamp_ntz, price_usd double"
COMPETITOR_SCHEMA = (
    "exchange string, asset string, volume double, timestamp timestamp_ntz"
)
LIQUIDITY_SCHEMA = (
    "ticker string, price double, size double, level int, side string, "
    "bps_from_mid_point int, year string, month string, day string, "
    "hour string, venue string, asset string"
)


def normalize_asset(col: F.Column) -> F.Column:
    """Competitor asset spellings → canonical: strip '-PERP', '1M' prefix
    (zetadex-competitor-stats-pipeline.py:85-88)."""
    stripped = F.regexp_replace(col, "-PERP$", "")
    return F.when(
        stripped.startswith("1M"), F.regexp_replace(stripped, "^1M", "")
    ).otherwise(stripped)


def build_market_data_pipeline(
    spark: SparkSession,
    base_path: str,
    prices: DataFrame,
    zeta_volumes: DataFrame,
    competitor_volumes: DataFrame,
    liquidity: DataFrame,
) -> Pipeline:
    p = Pipeline("zetadex_market_data", base_path)

    @p.table(quality="bronze")
    def raw_prices(pl) -> DataFrame:
        return prices

    @p.table(quality="silver")
    def hourly_prices(pl) -> DataFrame:
        # intra-hour dedup: reference uses dropDuplicates on (asset, date_,
        # hour_) — nondeterministic row choice; the engine pins latest-wins
        pr = pl.read("raw_prices").withColumn(
            "hour_ts", F.date_trunc("hour", "timestamp")
        )
        return latest_by_keys(
            pr, keys=["underlying", "hour_ts"], sequence_by=["timestamp"]
        ).select("underlying", "hour_ts", "price_usd")

    @p.table(quality="gold")
    def latest_prices(pl) -> DataFrame:
        return latest_by_keys(
            pl.read("hourly_prices"), keys=["underlying"], sequence_by=["hour_ts"]
        )

    @p.table(quality="silver")
    def combined_volumes(pl) -> DataFrame:
        # U2: zeta ∪ competitors with normalized asset names
        z = zeta_volumes.select(
            F.lit("zeta").alias("exchange"),
            F.col("asset"),
            F.col("volume"),
            F.col("timestamp"),
        )
        c = competitor_volumes.select(
            "exchange",
            normalize_asset(F.col("asset")).alias("asset"),
            "volume",
            "timestamp",
        )
        return z.unionByName(c)

    @p.table(quality="gold")
    def exchange_market_share(pl) -> DataFrame:
        v = pl.read("combined_volumes").withColumn(
            "day_ts", F.date_trunc("day", "timestamp")
        )
        daily = v.groupBy("day_ts", "exchange", "asset").agg(
            dec_sum("volume", "volume")
        )
        from zeta_etl_spark.operators.windows import share_of_total

        return share_of_total(
            daily, "volume", partition=["day_ts", "asset"], alias="market_share"
        )

    @p.table(quality="silver", partition_by=["venue", "asset"])
    def liquidity_snapshots(pl) -> DataFrame:
        # timestamps arrive only as y/m/d/h partition strings — reassemble
        # with format_string (zetadex-platform-monitoring-pipeline.py:139)
        return liquidity.withColumn(
            "snapshot_ts",
            F.to_timestamp(
                F.format_string(
                    "%s-%s-%s %s", F.col("year"), F.col("month"), F.col("day"),
                    F.col("hour"),
                ),
                "yyyy-MM-dd HH",
            ).cast("timestamp_ntz"),
        ).drop("year", "month", "day", "hour")

    @p.table(quality="gold")
    def liquidity_depth(pl) -> DataFrame:
        lq = pl.read("liquidity_snapshots")
        return lq.groupBy("snapshot_ts", "venue", "asset", "side").agg(
            dec_sum(F.col("price") * F.col("size"), "notional"),
            F.count(F.lit(1)).alias("n_levels"),
            F.min("bps_from_mid_point").alias("tightest_bps"),
        )

    return p
