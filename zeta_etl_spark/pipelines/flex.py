"""Flex options pipeline — re-expression of dlt-pipelines/zetaflex-pipeline.py:
entity-snapshot streams (auctions, options, settlements, vaults, tokens)
collapsed to latest-per-key via CDC, plus hourly TVL from deduped vault
balances.

Reference parity map (zetaflex-pipeline.py):
- five apply_changes CDC targets keyed on entity ids, sequenced by
  indexed_timestamp: :146-151,220-225,290-295,347-352,404-409
- map<string,float> token balances: :46
- stream dedup under a 1-day watermark: :84-89 (batch form here is the
  deterministic latest-wins)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.plans.graph import Pipeline

AUCTIONS_SCHEMA = (
    "auction_id string, underlying string, state string, size double, "
    "indexed_timestamp timestamp_ntz"
)
VAULTS_SCHEMA = (
    "vault_id string, underlying string, balances map<string,float>, "
    "timestamp timestamp_ntz, indexed_timestamp timestamp_ntz"
)


def build_flex_pipeline(
    spark: SparkSession,
    base_path: str,
    auction_snapshots: DataFrame,
    vault_snapshots: DataFrame,
) -> Pipeline:
    p = Pipeline("zetaflex", base_path)

    @p.table(quality="bronze")
    def raw_auctions(pl) -> DataFrame:
        return auction_snapshots

    @p.table(quality="bronze")
    def raw_vaults(pl) -> DataFrame:
        return vault_snapshots

    # S8 ×2 (the reference repeats this for options/settlements/tokens too —
    # identical operator, identical keys-and-sequence shape)
    p.apply_changes(
        target="auctions",
        source="raw_auctions",
        keys=["auction_id"],
        sequence_by=["indexed_timestamp"],
        quality="silver",
    )
    p.apply_changes(
        target="vaults",
        source="raw_vaults",
        keys=["vault_id"],
        sequence_by=["indexed_timestamp"],
        quality="silver",
    )

    @p.table(quality="gold")
    def hourly_tvl(pl) -> DataFrame:
        # hourly TVL: latest vault snapshot per hour, map balances exploded
        # (map<string,float> per §1.2), summed per underlying
        v = pl.read("raw_vaults").withColumn(
            "hour_ts", F.date_trunc("hour", "timestamp")
        )
        from zeta_etl_spark.operators.cdc import latest_by_keys

        hourly_latest = latest_by_keys(
            v, keys=["vault_id", "hour_ts"], sequence_by=["indexed_timestamp"]
        )
        exploded = hourly_latest.select(
            "hour_ts",
            "underlying",
            F.explode("balances").alias("token", "amount"),
        )
        return exploded.groupBy("hour_ts", "underlying").agg(
            dec_sum(F.col("amount").cast("double"), "tvl"),
            F.countDistinct("token").alias("n_tokens"),
        )

    return p
