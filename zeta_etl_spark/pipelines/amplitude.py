"""Amplitude-events pipeline: gz-JSON bronze → wallet-connect validity
windows → interval-join session attribution, as a runner DAG.

Reference parity (dlt-pipelines/zetadex-amplitude-events-pipeline.py):
- bronze: Auto Loader over ``*.json.gz`` with a declared DDL schema
  (:44-136) → re-expressed as the S2 schema-enforced gz-JSON glob scan
  (Spark decompresses .json.gz natively).
- cleaned_amplitude_wallet_connects (:138-167): filter
  ``lower(event_type) like '%wallet_connect%'``, wallet address/provider
  taken from event_properties for the modern ``Wallet_Connect`` event and
  split out of the event_type string for the legacy form, per-device
  connect sequence, and [usage_start, usage_end) validity windows built
  with lead() + the 9999-12-31 sentinel.
- cleaned_amplitude_events (:169-243): every event left-interval-joined to
  the covering connect window (c1) with a fallback join to the FIRST
  connect (c2, wallet_connect_sequence = 1), wallets coalesced to
  'unknown/not connected', ``amount = size * price``, and the
  Wallet_Connect event-name normalization.

Scale notes: connect windows per device are tiny relative to events, so the
interval join broadcasts the connect side after its window pass; the windows
(row_number/lead) force these nodes batch — declared incremental=False,
which the runner now enforces (T9).  At 100 TB the events side is the only
large scan, partitioned by date_ for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.plans.graph import Pipeline
from zeta_etl_spark.sources.json_source import read_json

AMPLITUDE_SCHEMA = (
    "amplitude_id string, event_id string, event_type string, "
    "event_time timestamp_ntz, "
    "event_properties struct<wallet_address string, wallet_provider string, "
    "asset string, price double, size double>, "
    "city string, country string, device_family string"
)

SENTINEL = "9999-12-31 23:59:59"


def build_amplitude_pipeline(
    spark: SparkSession, base_path: str, landed_glob: str
) -> Pipeline:
    p = Pipeline("amplitude_events", base_path)

    @p.table(quality="bronze")
    def raw_amplitude_events(pl) -> DataFrame:
        # :127-136 — S2 gz-JSON glob with declared schema
        return read_json(spark, landed_glob, AMPLITUDE_SCHEMA)

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_amplitude_wallet_connects(pl) -> DataFrame:
        # :138-167
        w = Window.partitionBy("amplitude_id").orderBy(
            F.asc("event_time"), F.asc("event_id")
        )
        modern = F.col("event_type") == "Wallet_Connect"
        return (
            pl.read("raw_amplitude_events")
            .filter(F.expr("lower(event_type) like '%wallet_connect%'"))
            .select(
                "amplitude_id",
                F.when(modern, F.col("event_properties.wallet_address"))
                .otherwise(F.split("event_type", " ").getItem(1))
                .alias("wallet_address"),
                F.when(modern, F.col("event_properties.wallet_provider"))
                .otherwise(F.split("event_type", " ").getItem(2))
                .alias("wallet_provider"),
                F.row_number().over(w).alias("wallet_connect_sequence"),
                "event_time",
                F.col("event_time").alias("usage_start"),
                F.coalesce(
                    F.lead("event_time").over(w),
                    F.lit(SENTINEL).cast("timestamp_ntz"),
                ).alias("usage_end"),
                F.to_date("event_time").alias("date_"),
            )
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_amplitude_events(pl) -> DataFrame:
        # :169-243 — covering-window join + first-connect fallback
        connects = pl.read("cleaned_amplitude_wallet_connects")
        a = pl.read("raw_amplitude_events").alias("a")
        c1 = F.broadcast(connects.alias("c1"))
        c2 = F.broadcast(
            connects.filter(F.col("wallet_connect_sequence") == 1).alias("c2")
        )
        return (
            a.join(
                c1,
                F.expr(
                    "c1.amplitude_id = a.amplitude_id "
                    "and a.event_time >= c1.usage_start "
                    "and a.event_time < c1.usage_end"
                ),
                "left",
            )
            .join(c2, F.expr("c2.amplitude_id = a.amplitude_id"), "left")
            .select(
                "a.amplitude_id",
                "a.event_id",
                F.coalesce(
                    "c1.wallet_address",
                    "c2.wallet_address",
                    F.lit("unknown/not connected"),
                ).alias("wallet_address"),
                F.coalesce(
                    "c1.wallet_provider",
                    "c2.wallet_provider",
                    F.lit("unknown/not connected"),
                ).alias("wallet_provider"),
                "a.event_time",
                F.when(
                    F.expr("a.event_type like '%Wallet_Connect%'"),
                    "Wallet_Connect",
                )
                .otherwise(F.col("a.event_type"))
                .alias("event_type"),
                F.col("a.event_properties.asset").alias("asset"),
                F.col("a.event_properties.price").alias("price"),
                F.col("a.event_properties.size").alias("size"),
                (
                    F.col("a.event_properties.size")
                    * F.col("a.event_properties.price")
                ).alias("amount"),
                "a.city",
                "a.country",
                "a.device_family",
                F.to_date("a.event_time").alias("date_"),
            )
        )

    return p
