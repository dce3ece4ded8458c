"""The agg_pnl-shaped leaderboard — a re-expression of the reference's
heaviest single query (SURVEY.md §3.2; zetadex-transactions-helius-pipeline.py
:1477-1878): hourly equity snapshots → cumulative PnL → multi-horizon
first-over-window lags → PnL/ROI per horizon → rank families with
deterministic tie-breaks → rank change.

Shuffle-consolidation note (the §3.2 boundary warning): every window here
shares ONE partitioning — either (user_id) ordered by time for the lag family
or (hour_ts) for the rank family — so Spark plans exactly two window
shuffle+sorts instead of one per column (the reference stacks 21 rank columns
on mixed specs; consolidating specs is the scale win).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.queries.registry import T, query

_PNL_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                            ELSE -value END AS DECIMAL(32,6))) AS DOUBLE)
           AS hourly_pnl,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                   date_trunc('hour', CAST(ts AS TIMESTAMP))) AS epoch_s
  FROM events GROUP BY 1, 2, 4
), cum AS (
  SELECT *,
    CAST(SUM(CAST(hourly_pnl AS DECIMAL(32,6))) OVER (
      PARTITION BY user_id ORDER BY epoch_s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      AS cumulative_pnl
  FROM hourly
), lagged AS (
  SELECT *,
    first_value(cumulative_pnl) OVER (
      PARTITION BY user_id ORDER BY epoch_s
      RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS cum_lag_24h,
    first_value(cumulative_pnl) OVER (
      PARTITION BY user_id ORDER BY epoch_s
      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS cum_lag_7d
  FROM cum
), pnl AS (
  SELECT user_id, hour_ts, cumulative_pnl,
    cumulative_pnl - cum_lag_24h AS pnl_24h,
    cumulative_pnl - cum_lag_7d AS pnl_7d
  FROM lagged
), ranked AS (
  SELECT *,
    CAST(RANK() OVER (PARTITION BY hour_ts
                      ORDER BY pnl_24h DESC, user_id) AS BIGINT) AS rank_24h,
    CAST(RANK() OVER (PARTITION BY hour_ts
                      ORDER BY pnl_7d DESC, user_id) AS BIGINT) AS rank_7d,
    CAST(RANK() OVER (PARTITION BY hour_ts
                      ORDER BY cumulative_pnl DESC, user_id) AS BIGINT)
      AS rank_all_time
  FROM pnl
)
SELECT user_id, hour_ts, cumulative_pnl, pnl_24h, pnl_7d,
       rank_24h, rank_7d, rank_all_time,
  -(rank_24h - first_value(rank_24h) OVER (
      PARTITION BY user_id ORDER BY hour_ts
      RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW))
    AS rank_change_24h
FROM ranked
"""


@query("pnl_leaderboard", oracle=_PNL_ORACLE, tags=("window", "W1", "W2", "W4", "W5", "W6", "heavy"))
def pnl_leaderboard(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    signed = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
        -F.col("value")
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(dec_sum(signed, "hourly_pnl"))
    epoch = F.unix_timestamp(F.col("hour_ts").cast("timestamp"))

    # window family 1: single (user_id, time) partitioning — cumsum + lags
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_24h = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-86400, 0)
    w_7d = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-604800, 0)
    cum = hourly.withColumn(
        "cumulative_pnl",
        F.sum(F.col("hourly_pnl").cast("DECIMAL(32,6)")).over(w_cum).cast("double"),
    )
    pnl = cum.select(
        "user_id",
        "hour_ts",
        "cumulative_pnl",
        (F.col("cumulative_pnl") - F.first("cumulative_pnl").over(w_24h)).alias(
            "pnl_24h"
        ),
        (F.col("cumulative_pnl") - F.first("cumulative_pnl").over(w_7d)).alias(
            "pnl_7d"
        ),
    )

    # window family 2: single (hour_ts) partitioning — the rank columns
    def rank_by(col):
        return (
            F.rank()
            .over(
                Window.partitionBy("hour_ts").orderBy(
                    F.col(col).desc(), F.col("user_id")
                )
            )
            .cast("bigint")
        )

    ranked = pnl.select(
        "*",
        rank_by("pnl_24h").alias("rank_24h"),
        rank_by("pnl_7d").alias("rank_7d"),
        rank_by("cumulative_pnl").alias("rank_all_time"),
    )

    # rank change: back to the (user_id, time) partitioning
    w_chg = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.col("hour_ts").cast("timestamp")))
        .rangeBetween(-86400, 0)
    )
    return ranked.withColumn(
        "rank_change_24h",
        -(F.col("rank_24h") - F.first("rank_24h").over(w_chg)),
    )


# --- zscore_leaderboard: the §3.2 tail — conditional volume agg + multiplier
# when-chain + z-score formula + rank (zetadex-transactions-helius-pipeline.py
# :1703-1763: z = mult × nft_mult × (taker + 0.2·maker) + campaign).

_ZSCORE_ORACLE = """
WITH vols AS (
  SELECT user_id,
    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
      AS DECIMAL(32,6))) AS DOUBLE) AS taker_volume,
    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value ELSE 0 END
      AS DECIMAL(32,6))) AS DOUBLE) AS maker_volume,
    COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP))) AS active_days
  FROM events GROUP BY user_id
), scored AS (
  SELECT *,
    CASE WHEN active_days >= 25 THEN 1.5
         WHEN active_days >= 15 THEN 1.2
         WHEN active_days >= 5 THEN 1.0
         ELSE 0.5 END AS activity_mult
  FROM vols
)
SELECT user_id, taker_volume, maker_volume,
  CAST(active_days AS BIGINT) AS active_days, activity_mult,
  activity_mult * (taker_volume + 0.2 * maker_volume) AS z_score,
  CAST(RANK() OVER (ORDER BY activity_mult * (taker_volume
       + 0.2 * maker_volume) DESC, user_id) AS BIGINT) AS z_rank
FROM scored
"""


@query("zscore_leaderboard", oracle=_ZSCORE_ORACLE, tags=("window", "W5", "A3", "zscore"))
def zscore_leaderboard(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    vols = ev.groupBy("user_id").agg(
        dec_sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                F.lit(0.0)
            ),
            "taker_volume",
        ),
        dec_sum(
            F.when(F.col("event_type") == "click", F.col("value")).otherwise(
                F.lit(0.0)
            ),
            "maker_volume",
        ),
        F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("active_days"),
    )
    mult = (
        F.when(F.col("active_days") >= 25, 1.5)
        .when(F.col("active_days") >= 15, 1.2)
        .when(F.col("active_days") >= 5, 1.0)
        .otherwise(0.5)
    )
    scored = vols.withColumn("activity_mult", mult).withColumn(
        "z_score",
        F.col("activity_mult")
        * (F.col("taker_volume") + 0.2 * F.col("maker_volume")),
    )
    return scored.select(
        "user_id",
        "taker_volume",
        "maker_volume",
        F.col("active_days").cast("bigint").alias("active_days"),
        "activity_mult",
        "z_score",
        F.rank()
        .over(
            Window.orderBy(F.col("z_score").desc(), F.col("user_id"))
        )
        .cast("bigint")
        .alias("z_rank"),
    )
