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
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

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


@query("pnl_leaderboard", oracle=_PNL_ORACLE, tags=("window", "W1", "W2", "W4", "W5", "W6", "heavy"), decimal_faithful=False)
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


# --- pnl_roi_leaderboard: the full agg_pnl tail (zetadex-transactions-helius-
# pipeline.py:1577-1655) — equity series, Modified-Dietz weighted-deposit
# denominators over START-EXCLUSIVE range windows (:1510-1524), the
# $100-fudge Simple-Dietz ROI per horizon (:1633-1655), and the ROI rank
# family (:1540-1549).
#
# Determinism: the Dietz weight w = (clock_hour - t)/horizon is a ratio of
# bigint seconds; the weighted sum keeps DECIMAL x BIGINT products inside the
# window sum and divides by the horizon once at the end (the weighted_window_
# sum rule — never sum pre-divided doubles).  The reference's
# current_timestamp anchor is replaced by the data-max hour, computed
# executor-side via a broadcast 1-row bounds frame (A13 pattern), making the
# whole query reproducible.
#
# Scale: identical partitioning discipline to pnl_leaderboard — ONE
# (user_id, time) window family for cumsums/lags/Dietz sums, ONE (hour_ts)
# family for ranks: two window shuffles total regardless of column count.

_ROI_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
    SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                  ELSE -value END AS DECIMAL(18,6))) AS hourly_pnl,
    SUM(CAST(CASE WHEN event_type = 'signup' THEN value
                  ELSE 0 END AS DECIMAL(18,6))) AS deposit_amt,
    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
              date_trunc('hour', CAST(ts AS TIMESTAMP))) AS epoch_s
  FROM events GROUP BY 1, 2, 5
), clocked AS (
  SELECT *, (SELECT max(epoch_s) FROM hourly) AS clock_e FROM hourly
), cum AS (
  SELECT *,
    CAST(SUM(hourly_pnl) OVER w_cum AS DOUBLE) AS cumulative_pnl,
    CAST(SUM(deposit_amt) OVER w_cum AS DOUBLE) AS cum_deposit
  FROM clocked
  WINDOW w_cum AS (PARTITION BY user_id ORDER BY epoch_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), eq AS (
  SELECT *, cum_deposit + cumulative_pnl AS equity FROM cum
), lagged AS (
  SELECT *,
    cumulative_pnl - first_value(cumulative_pnl) OVER w24 AS pnl_24h,
    cumulative_pnl - first_value(cumulative_pnl) OVER w7d AS pnl_7d,
    first_value(equity) OVER w24 AS equity_lag_24h,
    first_value(equity) OVER w7d AS equity_lag_7d,
    CAST(SUM(deposit_amt * (clock_e - epoch_s)) OVER w24x AS DOUBLE)
      / 86400.0 AS deposit_weighted_24h,
    CAST(SUM(deposit_amt * (clock_e - epoch_s)) OVER w7dx AS DOUBLE)
      / 604800.0 AS deposit_weighted_7d
  FROM eq
  WINDOW
    w24 AS (PARTITION BY user_id ORDER BY epoch_s
            RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
    w7d AS (PARTITION BY user_id ORDER BY epoch_s
            RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
    w24x AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW),
    w7dx AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 601200 PRECEDING AND CURRENT ROW)
), roi AS (
  SELECT user_id, hour_ts, equity, pnl_24h, pnl_7d,
         deposit_weighted_24h, deposit_weighted_7d,
    CASE WHEN pnl_24h = 0 THEN 0.0 ELSE
      pnl_24h / (100 + equity_lag_24h + deposit_weighted_24h) END AS roi_24h,
    CASE WHEN pnl_7d = 0 THEN 0.0 ELSE
      pnl_7d / (100 + equity_lag_7d + deposit_weighted_7d) END AS roi_7d
  FROM lagged
)
SELECT *,
  CAST(RANK() OVER (PARTITION BY hour_ts
       ORDER BY roi_24h DESC, pnl_24h DESC, user_id) AS BIGINT)
    AS roi_rank_24h,
  CAST(RANK() OVER (PARTITION BY hour_ts
       ORDER BY roi_7d DESC, pnl_7d DESC, user_id) AS BIGINT) AS roi_rank_7d
FROM roi
"""


@query(
    "pnl_roi_leaderboard",
    oracle=_ROI_ORACLE,
    tags=("window", "W1", "W2", "W3", "W4", "W5", "W11", "heavy"),
    decimal_faithful=False,
)
def pnl_roi_leaderboard(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    signed = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
        -F.col("value")
    )
    deposit = F.when(F.col("event_type") == "signup", F.col("value")).otherwise(
        F.lit(0.0)
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.sum(signed.cast("DECIMAL(18,6)")).alias("hourly_pnl"),
        F.sum(deposit.cast("DECIMAL(18,6)")).alias("deposit_amt"),
    )
    # executor-side clock anchor: broadcast 1-row bounds (A13), no wall clock
    bounds = hourly.agg(F.max("hour_ts").alias("clock_hour"))
    h = hourly.transform(with_scalar_frame(bounds))
    epoch = F.unix_timestamp(F.col("hour_ts").cast("timestamp"))
    clock_e = F.unix_timestamp(F.col("clock_hour").cast("timestamp"))

    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eq = h.select(
        "user_id",
        "hour_ts",
        "hourly_pnl",
        "deposit_amt",
        (clock_e - epoch).alias("secs_to_clock"),
        F.sum("hourly_pnl").over(w_cum).cast("double").alias("cumulative_pnl"),
        F.sum("deposit_amt").over(w_cum).cast("double").alias("cum_deposit"),
    ).withColumn("equity", F.col("cum_deposit") + F.col("cumulative_pnl"))
    epoch2 = F.unix_timestamp(F.col("hour_ts").cast("timestamp"))
    w24_2 = Window.partitionBy("user_id").orderBy(epoch2).rangeBetween(-86400, 0)
    w7d_2 = Window.partitionBy("user_id").orderBy(epoch2).rangeBetween(-604800, 0)
    # start-exclusive Dietz windows (:1510-1524): deposits land BETWEEN
    # snapshots, so the lag hour itself is excluded
    w24x_2 = Window.partitionBy("user_id").orderBy(epoch2).rangeBetween(-82800, 0)
    w7dx_2 = Window.partitionBy("user_id").orderBy(epoch2).rangeBetween(-601200, 0)

    dietz_24 = (
        F.sum(F.col("deposit_amt") * F.col("secs_to_clock"))
        .over(w24x_2)
        .cast("double")
        / 86400.0
    )
    dietz_7d = (
        F.sum(F.col("deposit_amt") * F.col("secs_to_clock"))
        .over(w7dx_2)
        .cast("double")
        / 604800.0
    )
    lagged = eq.select(
        "user_id",
        "hour_ts",
        "equity",
        (F.col("cumulative_pnl") - F.first("cumulative_pnl").over(w24_2)).alias(
            "pnl_24h"
        ),
        (F.col("cumulative_pnl") - F.first("cumulative_pnl").over(w7d_2)).alias(
            "pnl_7d"
        ),
        F.first("equity").over(w24_2).alias("equity_lag_24h"),
        F.first("equity").over(w7d_2).alias("equity_lag_7d"),
        dietz_24.alias("deposit_weighted_24h"),
        dietz_7d.alias("deposit_weighted_7d"),
    )
    roi_24 = F.when(F.col("pnl_24h") == 0, F.lit(0.0)).otherwise(
        F.col("pnl_24h")
        / (F.lit(100) + F.col("equity_lag_24h") + F.col("deposit_weighted_24h"))
    )
    roi_7 = F.when(F.col("pnl_7d") == 0, F.lit(0.0)).otherwise(
        F.col("pnl_7d")
        / (F.lit(100) + F.col("equity_lag_7d") + F.col("deposit_weighted_7d"))
    )
    roi = lagged.select(
        "user_id",
        "hour_ts",
        "equity",
        "pnl_24h",
        "pnl_7d",
        "deposit_weighted_24h",
        "deposit_weighted_7d",
        roi_24.alias("roi_24h"),
        roi_7.alias("roi_7d"),
    )

    def rank_by(a, b):
        return (
            F.rank()
            .over(
                Window.partitionBy("hour_ts").orderBy(
                    F.col(a).desc(), F.col(b).desc(), F.col("user_id")
                )
            )
            .cast("bigint")
        )

    return roi.select(
        "*",
        rank_by("roi_24h", "pnl_24h").alias("roi_rank_24h"),
        rank_by("roi_7d", "pnl_7d").alias("roi_rank_7d"),
    )
