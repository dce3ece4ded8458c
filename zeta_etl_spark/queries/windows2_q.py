"""Second window/agg coverage batch: conditional extrema over partitions
(W9), weighted time-decay window sums (W11, Modified-Dietz shape), collected
struct summaries (A11), global aggregates with exact variance (A12/A13).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.queries.registry import T, query

# --- conditional_window_extrema: W9 ----------------------------------------
# best bid/ask per group via min/max(case when side=...) over partition
# (zetadex-mm-uptime-pipeline-v3.sql:38-39).

_EXTREMA_ORACLE = """
SELECT event_id, user_id, event_type, value,
  min(CASE WHEN event_type = 'purchase' THEN value END)
    OVER (PARTITION BY user_id) AS min_purchase,
  max(CASE WHEN event_type = 'click' THEN value END)
    OVER (PARTITION BY user_id) AS max_click,
  CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
    OVER (PARTITION BY user_id) AS BIGINT) AS n_errors
FROM events WHERE event_id < 3000
"""


@query("conditional_window_extrema", oracle=_EXTREMA_ORACLE, tags=("window", "W9", "W12"))
def conditional_window_extrema(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.min(F.when(F.col("event_type") == "purchase", F.col("value")))
        .over(w)
        .alias("min_purchase"),
        F.max(F.when(F.col("event_type") == "click", F.col("value")))
        .over(w)
        .alias("max_click"),
        F.count(F.when(F.col("event_type") == "error", F.lit(1)))
        .over(w)
        .cast("bigint")
        .alias("n_errors"),
    )


# --- weighted_window_sum: W11 (Modified-Dietz weighting) --------------------
# sum(amount × time-weight) over an ordered window
# (zetadex-transactions-helius-pipeline.py:1602-1617).  The weight is the
# fraction of the day remaining at event time — integer epoch arithmetic, so
# the per-row product is bit-deterministic before the exact decimal window sum.

# Determinism note: value × (k/86400) must NOT be decimal-cast after the
# double multiply — near-halfway products round differently across engines
# (Spark casts the shortest string repr HALF_UP, DuckDB scales the binary
# value).  Instead the constant denominator is factored out of the window sum:
# Σ(value·k)/86400 with an exact DECIMAL×BIGINT product inside the sum.

_DIETZ_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
    86400 - (date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                       CAST(ts AS TIMESTAMP)) % 86400) AS secs_left
  FROM events WHERE event_id < 3000
)
SELECT event_id, user_id, ts, value,
  CAST(secs_left AS DOUBLE) / 86400.0 AS day_weight,
  CAST(SUM(CAST(value AS DECIMAL(18,6)) * secs_left)
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    / 86400.0 AS weighted_cum_value
FROM e
"""


@query("weighted_window_sum", oracle=_DIETZ_ORACLE, tags=("window", "W11"))
def weighted_window_sum(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    secs_left = F.lit(86400) - (epoch % 86400)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (secs_left.cast("double") / 86400.0).alias("day_weight"),
        (
            F.sum(F.col("value").cast("DECIMAL(18,6)") * secs_left)
            .over(w)
            .cast("double")
            / 86400.0
        ).alias("weighted_cum_value"),
    )


# --- collect_struct_summary: A11 (collect_list(struct(...))) ----------------
# Serialized deterministically (sorted day:count strings) so the value-hash is
# stable across engines (dfs-serving/zetadex-serving-v2.py:628 collects
# per-asset structs onto the total row the same way).

_COLLECT_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                              '%Y-%m-%d') AS day_str,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), labeled AS (
  SELECT event_type, day_str || ':' || CAST(n AS VARCHAR) AS day_label FROM daily
)
SELECT event_type,
  array_to_string(list_sort(list(day_label)), ',') AS day_counts,
  CAST(COUNT(*) AS BIGINT) AS n_days
FROM labeled GROUP BY event_type
"""


@query("collect_struct_summary", oracle=_COLLECT_ORACLE, tags=("agg", "A11"))
def collect_struct_summary(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day_str"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    labeled = daily.select(
        "event_type",
        F.concat_ws(":", "day_str", F.col("n").cast("string")).alias("day_label"),
    )
    return labeled.groupBy("event_type").agg(
        F.array_join(F.array_sort(F.collect_list("day_label")), ",").alias(
            "day_counts"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )


# --- global_stats: A12 global agg + A13 min/max pull + exact variance -------
# Variance from exact decimal power sums: (Σx² − (Σx)²/n)/n — population
# variance computed identically in both engines from deterministic operands.

_GLOBAL_ORACLE = """
WITH s AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value,
    CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS sum_sq,
    min(CAST(ts AS TIMESTAMP)) AS min_ts,
    max(CAST(ts AS TIMESTAMP)) AS max_ts
  FROM events
)
SELECT n, sum_value, min_ts, max_ts,
  sum_value / n AS mean_value,
  (sum_sq - sum_value * sum_value / n) / n AS var_value
FROM s
"""


@query("global_stats", oracle=_GLOBAL_ORACLE, tags=("agg", "A12", "A13"))
def global_stats(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    s = ev.agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", "sum_value"),
        F.sum((F.col("value") * F.col("value")).cast("DECIMAL(38,10)"))
        .cast("double")
        .alias("sum_sq"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    return s.select(
        "n",
        "sum_value",
        "min_ts",
        "max_ts",
        (F.col("sum_value") / F.col("n")).alias("mean_value"),
        (
            (F.col("sum_sq") - F.col("sum_value") * F.col("sum_value") / F.col("n"))
            / F.col("n")
        ).alias("var_value"),
    )


# --- exclusive_window_sums: W3 offset/exclusive frames ----------------------
# Modified-Dietz exclusive-start range (rangeBetween(-days(1)+hours(1), 0),
# zetadex-transactions-helius-pipeline.py:1509-1523) and the rows-exclusive
# variant (madwars-pipeline.py:130-136).

_EXCLUSIVE_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, user_id,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS volume,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                   date_trunc('hour', CAST(ts AS TIMESTAMP))) AS epoch_s
  FROM events GROUP BY 1, 2
)
SELECT hour_ts, user_id, volume,
  CAST(SUM(CAST(volume AS DECIMAL(32,6))) OVER (
    PARTITION BY user_id ORDER BY epoch_s
    RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS volume_23h_exclusive_start,
  CAST(COALESCE(SUM(CAST(volume AS DECIMAL(32,6))) OVER (
    PARTITION BY user_id ORDER BY epoch_s
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
    AS volume_before_now
FROM hourly
"""


@query("exclusive_window_sums", oracle=_EXCLUSIVE_ORACLE, tags=("window", "W3"), decimal_faithful=False)
def exclusive_window_sums(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("user_id")
    ).agg(dec_sum("value", "volume"))
    epoch = F.unix_timestamp(F.col("hour_ts").cast("timestamp"))
    w_range = (
        Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-82800, 0)
    )
    w_excl = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return hourly.select(
        "hour_ts",
        "user_id",
        "volume",
        F.sum(F.col("volume").cast("DECIMAL(32,6)"))
        .over(w_range)
        .cast("double")
        .alias("volume_23h_exclusive_start"),
        F.coalesce(
            F.sum(F.col("volume").cast("DECIMAL(32,6)")).over(w_excl).cast("double"),
            F.lit(0.0),
        ).alias("volume_before_now"),
    )


# --- global_event_rank: distributed exact global row_number ------------------
# The scale path for Window.orderBy() (whose plan is a single-task sort of
# the whole frame): operators/windows.global_row_number ranks via ordered
# range partitions + per-partition offsets — identical output, no
# data-sized SinglePartition exchange.  The query ranks EVERY event (the
# full frame must flow through the ranking, proving the operator at the
# raw-event grain the one-task form cannot hold at 100 TB) and emits a
# deterministic 1-in-97 rank sample so the compared output stays bounded
# at any SF.

_GLOBAL_RANK_ORACLE = """
WITH c AS (
  SELECT event_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_id, cents,
    CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, event_id) AS BIGINT) AS rn
  FROM c
)
SELECT event_id, cents, rn FROM r WHERE rn % 97 = 0
"""


@query(
    "global_event_rank",
    oracle=_GLOBAL_RANK_ORACLE,
    tags=("window", "rank", "scale"),
)
def global_event_rank(spark, sf_dir):
    from zeta_etl_spark.operators.windows import global_row_number

    e = T(spark, sf_dir, "events").select(
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    ranked = global_row_number(
        e, [F.col("cents").desc(), F.col("event_id").asc()], out_col="rn"
    )
    return ranked.filter(F.col("rn") % 97 == 0).select(
        "event_id", "cents", "rn"
    )
