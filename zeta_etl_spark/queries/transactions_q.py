"""Transactions-pipeline gold queries over the shared testdata tables:
the fee-tier 30d-rolling when-chain and the liquidation hourly gold.

Reference parity (dlt-pipelines/zetadex-transactions-helius-pipeline.py):
- fee_tiers (:1891-1945): per-authority hourly volume → 30d range-window
  rolling total → 8-branch fee-tier when-chain + multiplier mapping →
  latest row per authority.  Thresholds here are re-based to the testdata
  value scale (the reference's are notional USDC volumes).
- liquidation hourly gold (:558-625 family + the :777-793 bucket shape).

Determinism: hourly volumes and their window sums stay DECIMAL end-to-end
(exact, order-free) and only the final projection casts to double; tier
comparisons happen on the exact decimal.  Scale: one shuffle to (hour,
authority), one window shuffle on authority — both unavoidable and
key-partitioned; the when-chains are pure codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.queries.registry import T, query

# (threshold, tier, multiplier), highest first — mirror of the reference's
# 8-branch chain at :1907-1928, re-based to testdata value scale
_TIERS = [
    (4050, 7, 0.3),
    (3650, 6, 0.4),
    (3460, 5, 0.5),
    (3280, 4, 0.6),
    (3040, 3, 0.7),
    (2890, 2, 0.8),
    (2625, 1, 0.9),
]

_FEE_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS timestamp,
         user_id AS authority,
         SUM(CAST(value AS DECIMAL(32,6))) AS vol
  FROM events GROUP BY 1, 2
), rolled AS (
  SELECT timestamp, authority, vol,
    SUM(vol) OVER (
      PARTITION BY authority
      ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', timestamp)
      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS tv30
  FROM hourly
), tiers AS (
  SELECT *,
    CAST(CASE {" ".join(f"WHEN tv30 >= {thr} THEN {tier}" for thr, tier, _ in _TIERS)}
         ELSE 0 END AS BIGINT) AS fee_tier
  FROM rolled
)
SELECT timestamp, authority,
  CAST(vol AS DOUBLE) AS volume,
  CAST(tv30 AS DOUBLE) AS total_volume_30d,
  fee_tier,
  CASE fee_tier {" ".join(f"WHEN {tier} THEN {mult}" for _, tier, mult in _TIERS)}
       ELSE 1.0 END AS fee_multiplier
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY authority
                               ORDER BY timestamp DESC) AS rn
  FROM tiers
) t WHERE rn = 1
"""


@query("fee_tier_volume", oracle=_FEE_ORACLE, tags=("window", "W2", "W7", "F5"))
def fee_tier_volume(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("timestamp"),
        F.col("user_id").alias("authority"),
    ).agg(F.sum(F.col("value").cast("DECIMAL(32,6)")).alias("vol"))
    w30 = (
        Window.partitionBy("authority")
        .orderBy(F.unix_timestamp(F.col("timestamp").cast("timestamp")))
        .rangeBetween(-30 * 86400, 0)
    )
    tier = F.lit(0)
    mult = F.lit(1.0)
    for thr, t_val, m_val in reversed(_TIERS):
        tier = F.when(F.col("tv30") >= thr, t_val).otherwise(tier)
        mult = F.when(F.col("tv30") >= thr, m_val).otherwise(mult)
    w_latest = Window.partitionBy("authority").orderBy(F.desc("timestamp"))
    return (
        hourly.withColumn("tv30", F.sum("vol").over(w30))
        .withColumn("fee_tier", tier.cast("bigint"))
        .withColumn("fee_multiplier", mult)
        .withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select(
            "timestamp",
            "authority",
            F.col("vol").cast("double").alias("volume"),
            F.col("tv30").cast("double").alias("total_volume_30d"),
            "fee_tier",
            "fee_multiplier",
        )
    )


_LIQ_ORACLE = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS timestamp,
  COUNT(*) AS liquidation_count,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS liquidated_value,
  COUNT(DISTINCT user_id) AS liquidatees,
  MAX(value) AS max_liquidation
FROM events WHERE event_type = 'error'
GROUP BY 1
"""


@query("liquidation_hourly", oracle=_LIQ_ORACLE, tags=("agg", "A2", "A6"))
def liquidation_hourly(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("timestamp")
    ).agg(
        F.count(F.lit(1)).alias("liquidation_count"),
        dec_sum("value", "liquidated_value"),
        F.countDistinct("user_id").alias("liquidatees"),
        F.max("value").alias("max_liquidation"),
    )


# --- ohlc_bars_hourly: candlestick bars over the event-value series ----------
# The market-data staple the reference's prices pipeline serves
# (zetadex-prices-pipeline.py aggregates spot marks per interval): per
# hour — open (value at the first event), high, low, close (value at the
# last event), and tick count.  Open/close are min_by/max_by on a
# zero-padded string order key "%010d%019d" % (epoch, event_id):
# lexicographic order on the padding equals numeric order on
# (epoch, event_id) for ANY event_id magnitude (a packed BIGINT key
# collides once event_id reaches the slot width — review finding), and
# event_id uniqueness makes the extrema deterministic; DuckDB's
# arg_min/arg_max share the semantics.  One hour-grain shuffle with full
# map-side combine: min_by/max_by partials merge like min/max, making
# the bar builder a 100 TB-safe single agg.

_OHLC_ORACLE = """
WITH base AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_hour,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    printf('%010d%019d',
           date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                     CAST(ts AS TIMESTAMP)),
           event_id) AS ord
  FROM events
)
SELECT bar_hour,
  CAST(arg_min(cents, ord) AS BIGINT) AS open_cents,
  CAST(MAX(cents) AS BIGINT) AS high_cents,
  CAST(MIN(cents) AS BIGINT) AS low_cents,
  CAST(arg_max(cents, ord) AS BIGINT) AS close_cents,
  COUNT(*) AS n_ticks
FROM base
GROUP BY bar_hour
"""


@query("ohlc_bars_hourly", oracle=_OHLC_ORACLE, tags=("market", "agg", "A4"))
def ohlc_bars_hourly(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    base = e.select(
        F.date_trunc("hour", "ts").alias("bar_hour"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        F.expr(
            "format_string('%010d%019d', unix_timestamp(ts), event_id)"
        ).alias("ord"),
    )
    return base.groupBy("bar_hour").agg(
        F.min_by("cents", "ord").cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max_by("cents", "ord").cast("bigint").alias("close_cents"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
