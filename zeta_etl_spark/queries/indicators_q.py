"""Technical-indicator batch: EWMA, Bollinger bands, and Cutler's RSI over
per-user event-value series — the market-analytics family the reference's
domain (perp-DEX trade series) consumes daily.

Cross-engine determinism is the design constraint (SURVEY §5): EWMA uses
α = 1/2, whose weights 2^-j are DYADIC — every term cents·2^(k-j) is an
exact BIGINT, so the smoothing is two integer sums and one double
division (recursive EMA with arbitrary α is NOT reproducible across
engines; α=1/2 is the closed form that is).  Bollinger σ comes from
integer window sums via sqrt(n·Sxx − Sx²)/n — IEEE sqrt is correctly
rounded, so identical inputs give identical doubles.  RSI is Cutler's
(SMA-based) variant: ratio of two integer sums — Wilder's recursive
smoothing is again not cross-engine reproducible and is documented out.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

_EWMA_K = 20  # window length; weight of the j-th most recent event = 2^-j

# --- ewma_user_value ---------------------------------------------------------
# EWMA at each user's LATEST event over their last 20 values.  With
# α = 1/2 the weighted sum Σ cents_j·2^(19-j) and the weight total
# Σ 2^(19-j) are both exact BIGINTs (shiftleft, no float pow), leaving
# ONE double division.  Scale: row_number + filter ≤ 20 is a per-key
# top-k (WindowGroupLimit) — the tail of each user's history is never
# aggregated.

_EWMA_ORACLE = f"""
WITH ranked AS (
  SELECT user_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    ROW_NUMBER() OVER (
      PARTITION BY user_id
      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_used,
  CAST(SUM(cents * (CAST(1 AS BIGINT) << ({_EWMA_K} - CAST(rn AS INTEGER))))
    AS BIGINT) AS weighted_sum,
  CAST(SUM(CAST(1 AS BIGINT) << ({_EWMA_K} - CAST(rn AS INTEGER)))
    AS BIGINT) AS weight_total,
  CAST(SUM(cents * (CAST(1 AS BIGINT) << ({_EWMA_K} - CAST(rn AS INTEGER))))
    AS DOUBLE)
    / CAST(SUM(CAST(1 AS BIGINT) << ({_EWMA_K} - CAST(rn AS INTEGER)))
    AS DOUBLE) AS ewma_cents
FROM ranked
WHERE rn <= {_EWMA_K}
GROUP BY user_id
"""


@query("ewma_user_value", oracle=_EWMA_ORACLE, tags=("indicator", "window"))
def ewma_user_value(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _EWMA_K)
    )
    wgt = F.expr(f"shiftleft(cast(1 as bigint), {_EWMA_K} - cast(rn as int))")
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(F.col("cents") * wgt).cast("bigint").alias("weighted_sum"),
        F.sum(wgt).cast("bigint").alias("weight_total"),
        (
            F.sum(F.col("cents") * wgt).cast("double")
            / F.sum(wgt).cast("double")
        ).alias("ewma_cents"),
    )


# --- bollinger_breakouts -----------------------------------------------------
# 20-event rolling mean ± 2σ per user; count closes outside the band.
# σ is the population std over the window from INTEGER sums:
# sqrt(n·Sxx − Sx²)/n — every input to the band expressions is a BIGINT
# window sum, so both engines evaluate the identical double expression
# tree.  One user_id exchange carries all three window sums and the
# final aggregation.

_BOLL_ORACLE = """
WITH base AS (
  SELECT user_id, event_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    CAST(ts AS TIMESTAMP) AS ts
  FROM events
), win AS (
  SELECT user_id, cents,
    CAST(COUNT(*) OVER w AS BIGINT) AS n,
    CAST(SUM(cents) OVER w AS BIGINT) AS sx,
    CAST(SUM(cents * cents) OVER w AS BIGINT) AS sxx
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), bands AS (
  SELECT user_id, cents,
    CAST(sx AS DOUBLE) / n AS mean_c,
    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n AS sigma_c
  FROM win
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(*) FILTER (WHERE cents > mean_c + 2 * sigma_c) AS BIGINT)
    AS n_upper_breaks,
  CAST(COUNT(*) FILTER (WHERE cents < mean_c - 2 * sigma_c) AS BIGINT)
    AS n_lower_breaks
FROM bands
GROUP BY user_id
"""


@query("bollinger_breakouts", oracle=_BOLL_ORACLE, tags=("indicator", "window"))
def bollinger_breakouts(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    win = base.select(
        "user_id",
        "cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("cents").over(w).cast("bigint").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("bigint").alias("sxx"),
    )
    bands = win.select(
        "user_id",
        "cents",
        (F.col("sx").cast("double") / F.col("n")).alias("mean_c"),
        (
            F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
            )
            / F.col("n")
        ).alias("sigma_c"),
    )
    upper = F.col("cents") > F.col("mean_c") + 2 * F.col("sigma_c")
    lower = F.col("cents") < F.col("mean_c") - 2 * F.col("sigma_c")
    return bands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count(F.when(upper, 1)).cast("bigint").alias("n_upper_breaks"),
        F.count(F.when(lower, 1)).cast("bigint").alias("n_lower_breaks"),
    )


# --- rsi_cutler --------------------------------------------------------------
# Cutler's RSI at each user's latest event: simple (not Wilder-recursive)
# averages of the last 14 up-moves and down-moves — two integer sums and
# one guarded double division, RSI = 100·gain/(gain+loss).  The diff
# series comes from lag() on the same user_id exchange.

_RSI_N = 14

_RSI_ORACLE = f"""
WITH diffs AS (
  SELECT user_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT)
      - lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS d,
    ROW_NUMBER() OVER (
      PARTITION BY user_id
      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_desc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
)
SELECT user_id,
  CAST(SUM(greatest(d, 0)) AS BIGINT) AS gain_sum,
  CAST(SUM(greatest(-d, 0)) AS BIGINT) AS loss_sum,
  CAST(100 * SUM(greatest(d, 0)) AS DOUBLE)
    / NULLIF(CAST(SUM(greatest(d, 0)) + SUM(greatest(-d, 0)) AS DOUBLE), 0)
    AS rsi
FROM diffs
WHERE d IS NOT NULL AND rn_desc <= {_RSI_N}
GROUP BY user_id
"""


@query("rsi_cutler", oracle=_RSI_ORACLE, tags=("indicator", "window"))
def rsi_cutler(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    wasc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wdesc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    cents = F.expr("cast(floor(value * 100 + 0.5) as bigint)")
    diffs = (
        e.select("user_id", "ts", "event_id", cents.alias("cents"))
        .withColumn("d", F.col("cents") - F.lag("cents").over(wasc))
        .withColumn("rn_desc", F.row_number().over(wdesc))
        .filter(F.col("d").isNotNull() & (F.col("rn_desc") <= _RSI_N))
    )
    gain = F.sum(F.greatest(F.col("d"), F.lit(0)))
    loss = F.sum(F.greatest(-F.col("d"), F.lit(0)))
    return diffs.groupBy("user_id").agg(
        gain.cast("bigint").alias("gain_sum"),
        loss.cast("bigint").alias("loss_sum"),
        (
            (100 * gain).cast("double")
            / F.nullif((gain + loss).cast("double"), F.lit(0.0))
        ).alias("rsi"),
    )


# --- autocorr_lag1: serial correlation of the value series -------------------
# Pearson r between consecutive values per user — the mean-reversion /
# momentum diagnostic.  Same exactness class as linear_trend_per_user and
# exact_variance_per_user: all five sums over the lagged pairs are BIGINT
# (n, Σx, Σy, Σxy, Σxx, Σyy), one sqrt of an exact double product, one
# division — identical expression trees in both engines.  The lag and
# the aggregation ride one user_id exchange.

_AC_ORACLE = """
WITH pairs AS (
  SELECT user_id,
    lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS x,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
), sums AS (
  SELECT user_id,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs WHERE x IS NOT NULL GROUP BY user_id
)
SELECT user_id, n,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0) AS autocorr_lag1
FROM sums
"""


@query("autocorr_lag1", oracle=_AC_ORACLE, tags=("indicator", "stats"))
def autocorr_lag1(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.expr("cast(floor(value * 100 + 0.5) as bigint)")
    pairs = (
        e.select("user_id", "ts", "event_id", cents.alias("y"))
        .withColumn("x", F.lag("y").over(w))
        .filter(F.col("x").isNotNull())
    )
    sums = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "user_id", "n", (num / F.nullif(den, F.lit(0.0))).alias("autocorr_lag1")
    )


# --- max_drawdown: peak-to-trough decline per user ---------------------------
# The risk statistic paired with the CUSUM drift detector: drawdown_i =
# runmax(cents)_i − cents_i, reported as the per-user maximum with the
# peak level and the trough's epoch second (first trough wins ties via
# min(ep) over the argmax rows — deterministic).  Pure integer window
# math on one user_id exchange.

_DD_ORACLE = """
WITH base AS (
  SELECT user_id, event_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
              CAST(ts AS TIMESTAMP)) AS ep
  FROM events
), dd AS (
  SELECT user_id, ep, cents,
    MAX(cents) OVER (PARTITION BY user_id ORDER BY ep, event_id) AS runmax,
    MAX(cents) OVER (PARTITION BY user_id ORDER BY ep, event_id) - cents
      AS drawdown
  FROM base
), mx AS (
  SELECT user_id, MAX(drawdown) AS max_drawdown FROM dd GROUP BY user_id
)
SELECT d.user_id,
  CAST(m.max_drawdown AS BIGINT) AS max_drawdown_cents,
  CAST(MIN(d.runmax) AS BIGINT) AS peak_cents,
  CAST(MIN(d.ep) AS BIGINT) AS trough_ep
FROM dd d JOIN mx m ON m.user_id = d.user_id AND d.drawdown = m.max_drawdown
GROUP BY d.user_id, m.max_drawdown
"""


@query("max_drawdown", oracle=_DD_ORACLE, tags=("indicator", "risk"))
def max_drawdown(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        F.unix_timestamp("ts").alias("ep"),
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    dd = base.select(
        "user_id",
        "ep",
        "cents",
        F.max("cents").over(w).alias("runmax"),
        (F.max("cents").over(w) - F.col("cents")).alias("drawdown"),
    )
    # per-user max via a second window on the SAME partition key (no join
    # against a derived aggregate → the whole query rides one exchange)
    wp = Window.partitionBy("user_id")
    return (
        dd.withColumn("max_dd", F.max("drawdown").over(wp))
        .filter(F.col("drawdown") == F.col("max_dd"))
        .groupBy("user_id", "max_dd")
        .agg(
            F.min("runmax").cast("bigint").alias("peak_cents"),
            F.min("ep").cast("bigint").alias("trough_ep"),
        )
        .select(
            "user_id",
            F.col("max_dd").cast("bigint").alias("max_drawdown_cents"),
            "peak_cents",
            "trough_ep",
        )
    )
