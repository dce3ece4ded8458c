"""Rewards + referrals pipeline: weekly-epoch maker/taker rewards with
share-of-total splits, tiering, cumulative payouts, and referral attribution
via CDC + as-of join — the engine's re-expression of
dlt-pipelines/zetadex-rewards-v2-pipeline.py and zetadex-referrals-pipeline.py.

Reference parity map:
- weekly epoch truncation + per-epoch/user rollups: zetadex-rewards-v2-pipeline.py:64-73
- share-of-total via two windowed sums (W10): :105-107,173-176
- referral-tier when-chain: :347-360
- cumulative rewards (W1 rangeBetween variant): :201-205,239-243
- referrals CDC latest-wins (S8): zetadex-referrals-pipeline.py:147-152
- trades-after-referral as-of condition (J6): zetadex-rewards-v2-pipeline.py:275-288
  — re-expressed with the union-merge as-of join (operators/temporal.py), which
  shuffles once on the key instead of running an inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.operators.temporal import as_of_join
from zeta_etl_spark.operators.windows import share_of_total
from zeta_etl_spark.plans.graph import Pipeline

TRADES_SCHEMA = (
    "block_time timestamp_ntz, authority string, asset string, "
    "maker_taker string, volume double"
)
REFERRALS_SCHEMA = (
    "referrer string, referral string, timestamp timestamp_ntz, "
    "indexed_timestamp timestamp_ntz"
)

EPOCH_POOL = 10_000.0  # weekly reward pool (reference loads these from config)


def build_rewards_pipeline(
    spark: SparkSession,
    base_path: str,
    trades: DataFrame,
    referral_snapshots: DataFrame,
) -> Pipeline:
    p = Pipeline("zetadex_rewards", base_path)

    @p.table(quality="bronze")
    def raw_trades(pl) -> DataFrame:
        return trades

    @p.table(quality="bronze")
    def raw_referrals(pl) -> DataFrame:
        return referral_snapshots

    # S8: latest snapshot per (referrer, referral) key
    p.apply_changes(
        target="referrals",
        source="raw_referrals",
        keys=["referrer", "referral"],
        sequence_by=["indexed_timestamp"],
        quality="silver",
    )

    @p.table(quality="gold")
    def epoch_user_rewards(pl) -> DataFrame:
        t = pl.read("raw_trades").withColumn(
            "epoch", F.date_trunc("week", F.col("block_time"))
        )
        per_user = t.groupBy("epoch", "authority").agg(
            dec_sum(
                F.when(F.col("maker_taker") == "maker", F.col("volume")).otherwise(
                    F.lit(0.0)
                ),
                "maker_volume",
            ),
            dec_sum(
                F.when(F.col("maker_taker") == "taker", F.col("volume")).otherwise(
                    F.lit(0.0)
                ),
                "taker_volume",
            ),
            F.countDistinct("asset").alias("n_assets"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        shared = share_of_total(
            per_user, "taker_volume", partition=["epoch"], alias="taker_share"
        )
        tier = (
            F.when(F.col("taker_volume") >= 100_000, "gold")
            .when(F.col("taker_volume") >= 10_000, "silver")
            .otherwise("bronze")
        )
        return shared.withColumn("tier", tier).withColumn(
            "epoch_reward",
            F.coalesce(F.col("taker_share"), F.lit(0.0)) * EPOCH_POOL,
        )

    @p.table(quality="gold")
    def cumulative_rewards(pl) -> DataFrame:
        r = pl.read("epoch_user_rewards")
        w = (
            Window.partitionBy("authority")
            .orderBy(F.unix_timestamp(F.col("epoch").cast("timestamp")))
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        return r.select(
            "epoch",
            "authority",
            "epoch_reward",
            F.sum(F.col("epoch_reward").cast("DECIMAL(32,6)"))
            .over(w)
            .cast("double")
            .alias("cumulative_reward"),
        )

    @p.table(quality="gold")
    def referrer_rewards(pl) -> DataFrame:
        # attribute each trade to the referrer active at trade time:
        # as-of join trade.block_time against referral.timestamp (J6)
        t = pl.read("raw_trades")
        refs = pl.read("referrals").select(
            F.col("referral").alias("authority"),
            F.col("referrer"),
            F.col("timestamp").alias("referral_timestamp"),
        )
        attributed = as_of_join(
            t,
            refs,
            keys=["authority"],
            left_ts="block_time",
            right_ts="referral_timestamp",
            right_cols=["referrer"],
        ).filter(F.col("referrer").isNotNull())
        return attributed.groupBy(
            F.date_trunc("week", F.col("block_time")).alias("epoch"), "referrer"
        ).agg(
            dec_sum("volume", "referred_volume"),
            F.countDistinct("authority").alias("n_referees"),
            (dec_sum(F.col("volume") * 0.001) ).alias("referrer_reward"),
        )

    return p
