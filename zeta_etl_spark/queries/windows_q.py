"""Window-function and ranking queries: cumulative sums, leaderboards with
deterministic tie-breaks, share-of-total, top-k per group, lead/lag gaps,
rank change (SURVEY.md §2.5 W1-W12, §2.4 A3-A9).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.operators.windows import (
    cumsum,
    rank_leaderboard,
    share_of_total,
    top_k_per_group,
)
from zeta_etl_spark.queries.registry import T, query

# --- user_cumulative_value: W1 running total --------------------------------
# deposits/withdrawals cumsum (zetadex-transactions-helius-pipeline.py:1048-1055).
# Order includes event_id as the unique tie-break (SURVEY §5 determinism).

_CUMSUM_ORACLE = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
  CAST(SUM(CAST(value AS DECIMAL(32,6)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS cumulative_value,
  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS event_seq
FROM events
"""


@query("user_cumulative_value", oracle=_CUMSUM_ORACLE, tags=("window", "W1"), decimal_faithful=False)
def user_cumulative_value(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = cumsum(
        ev,
        value="value",
        partition=["user_id"],
        order=[F.col("ts"), F.col("event_id")],
        alias="cumulative_value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn("event_seq", F.count(F.lit(1)).over(w).cast("bigint"))


# --- user_leaderboard: conditional agg (A3) + rank with tie-breaks (W5) +
# share-of-total (W10).  agg_pnl leaderboard shape
# (zetadex-transactions-helius-pipeline.py:1525-1545,1716-1717;
# zetadex-rewards-v2-pipeline.py:105-107).

_LEADERBOARD_ORACLE = """
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
      AS DECIMAL(32,6))) AS DOUBLE) AS purchase_volume,
    COUNT(*) AS n_events,
    COUNT(DISTINCT event_type) AS n_event_types
  FROM events GROUP BY user_id
)
SELECT user_id, purchase_volume, n_events, n_event_types,
  CAST(RANK() OVER (ORDER BY purchase_volume DESC, user_id) AS BIGINT)
    AS volume_rank,
  purchase_volume / NULLIF(CAST(SUM(CAST(purchase_volume AS DECIMAL(32,6)))
    OVER () AS DOUBLE), 0.0) AS volume_share
FROM per_user
"""


@query("user_leaderboard", oracle=_LEADERBOARD_ORACLE, tags=("window", "W5", "W10", "A3"))
def user_leaderboard(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        dec_sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                F.lit(0.0)
            ),
            "purchase_volume",
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
    )
    ranked = rank_leaderboard(
        per_user,
        partition=[],
        order=[F.col("purchase_volume").desc(), F.col("user_id")],
        alias="volume_rank",
    ).withColumn("volume_rank", F.col("volume_rank").cast("bigint"))
    return share_of_total(
        ranked, value="purchase_volume", partition=[], alias="volume_share"
    )


# --- top3_purchases_per_user: W7 top-k per group ----------------------------
# row_number()<=k pattern (zetadex-transactions-helius-pipeline.py:1942-1945).

_TOPK_ORACLE = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       CAST(rn AS BIGINT) AS purchase_rank
FROM (
  SELECT event_id, user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
) t WHERE rn <= 3
"""


@query("top3_purchases_per_user", oracle=_TOPK_ORACLE, tags=("window", "W7", "O2"))
def top3_purchases_per_user(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = top_k_per_group(
        ev.select("event_id", "user_id", "ts", "value"),
        partition=["user_id"],
        order=[F.col("value").desc(), F.col("event_id")],
        k=3,
        keep_rank=True,
    )
    return out.withColumn("purchase_rank", F.col("_rn").cast("bigint")).drop("_rn")


# --- event_gaps: W8 lead/lag ------------------------------------------------
# wallet-connect validity windows use lead() with a sentinel
# (zetadex-amplitude-events-pipeline.py:164); here: gap-to-previous and
# next-event type per user.

_GAPS_ORACLE = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
  date_diff('second',
            lag(CAST(ts AS TIMESTAMP)) OVER w,
            CAST(ts AS TIMESTAMP)) AS seconds_since_prev,
  lead(event_type) OVER w AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("event_gaps", oracle=_GAPS_ORACLE, tags=("window", "W8"))
def event_gaps(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev_epoch = F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (epoch - prev_epoch).alias("seconds_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


# --- priority_stats: exact median (A9) + VWAP-style ratio-of-sums (A5) +
# max_by latest value (A4) per group.
# median: zetadex-mm-uptime-pipeline-v3.sql:121-123;
# VWAP: zetadex-orderbook-snapshot-pipeline.py:495-498;
# first(ignorenulls)→max_by: zetadex-orderbook-snapshot-pipeline.py:493-494.

_PRIORITY_ORACLE = """
SELECT
  o_orderpriority,
  median(o_totalprice) AS median_price,
  CAST(SUM(CAST(o_totalprice * o_orderkey AS DECIMAL(38,6))) AS DOUBLE)
    / NULLIF(CAST(SUM(CAST(o_orderkey AS DECIMAL(32,6))) AS DOUBLE), 0.0)
    AS weighted_price,
  max_by(o_totalprice, o_orderdate || '#' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0'))
    AS latest_price,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@query("priority_stats", oracle=_PRIORITY_ORACLE, tags=("agg", "A9", "A5", "A4"))
def priority_stats(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    # max_by needs a totally-ordered key for determinism: orderdate + zero-padded
    # orderkey (string concat gives identical ordering in both engines)
    seq = F.concat_ws(
        "#",
        F.col("o_orderdate").cast("string"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("median_price"),
        (
            F.sum((F.col("o_totalprice") * F.col("o_orderkey")).cast("DECIMAL(38,6)")).cast("double")
            / F.nullif(F.sum(F.col("o_orderkey").cast("DECIMAL(32,6)")).cast("double"), F.lit(0.0))
        ).alias("weighted_price"),
        F.max_by("o_totalprice", seq).alias("latest_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- balance_tiers: when/otherwise chain (§2.8 conditional) -----------------
# fee-tier 8-branch chain (zetadex-transactions-helius-pipeline.py:1907-1928).

_TIERS_ORACLE = """
SELECT
  CASE WHEN c_acctbal < 0 THEN 'negative'
       WHEN c_acctbal < 1000 THEN 'low'
       WHEN c_acctbal < 5000 THEN 'mid'
       WHEN c_acctbal < 9000 THEN 'high'
       ELSE 'whale' END AS balance_tier,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(32,6))) AS DOUBLE) AS tier_balance,
  CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
FROM customer
GROUP BY 1
"""


@query("balance_tiers", oracle=_TIERS_ORACLE, tags=("scalar", "conditional"))
def balance_tiers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .when(F.col("c_acctbal") < 9000, "high")
        .otherwise("whale")
    )
    return c.groupBy(tier.alias("balance_tier")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum("c_acctbal", "tier_balance"),
        F.min("c_custkey").cast("bigint").alias("min_custkey"),
    )


# --- rank_change_24h: W6 window-over-window ---------------------------------
# -(rank - first(rank) over trailing frame)
# (zetadex-transactions-helius-pipeline.py:1664-1694): daily volume ranks per
# user, then change vs the rank 1 day earlier.

_RANKCHANGE_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_ts, user_id,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS volume
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT day_ts, user_id, volume,
         CAST(RANK() OVER (PARTITION BY day_ts
                           ORDER BY volume DESC, user_id) AS BIGINT) AS day_rank
  FROM daily
)
SELECT day_ts, user_id, volume, day_rank,
  -(day_rank - first_value(day_rank) OVER (
      PARTITION BY user_id ORDER BY day_ts
      RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)) AS rank_change_1d
FROM ranked
"""


@query("rank_change_24h", oracle=_RANKCHANGE_ORACLE, tags=("window", "W6", "W5"), decimal_faithful=False)
def rank_change_24h(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts"), F.col("user_id")
    ).agg(dec_sum("value", "volume"))
    ranked = daily.withColumn(
        "day_rank",
        F.rank()
        .over(
            Window.partitionBy("day_ts").orderBy(
                F.col("volume").desc(), F.col("user_id")
            )
        )
        .cast("bigint"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.col("day_ts").cast("timestamp")))
        .rangeBetween(-24 * 3600, 0)
    )
    return ranked.withColumn(
        "rank_change_1d", -(F.col("day_rank") - F.first("day_rank").over(w))
    )
