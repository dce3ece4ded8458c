"""Analytics batch 2: cross-domain coverage audit, numeric-range window
frames, and per-session funnels — three shapes the registry had not yet
exercised (documents×embeddings had never been JOINED; RANGE frames were
only ever time-based; the funnel was corpus-global, not per-session).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- embedding_coverage: which docs actually have vectors? -------------------
# The audit every multi-modal corpus needs before ANN/clustering consumes
# it: per source, how many docs have an embedding row (vec_id keyed to
# doc_id), and the integer-exact mean squared norm of the covered ones.
# One broadcast-able join of the narrow id sets; the text column never
# moves.

_COV_ORACLE = """
WITH n AS (
  SELECT vec_id,
    list_sum(list_transform(
      list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                          AS BIGINT)),
      x -> x * x)) AS norm2
  FROM embeddings
)
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(n.vec_id) AS BIGINT) AS n_covered,
  (1000 * COUNT(n.vec_id)) // COUNT(*) AS coverage_permille,
  CAST(SUM(n.norm2) AS BIGINT) AS total_norm2
FROM documents d LEFT JOIN n ON n.vec_id = d.doc_id
GROUP BY d.source
"""


@query(
    "embedding_coverage",
    oracle=_COV_ORACLE,
    tags=("vectors", "audit", "join"),
)
def embedding_coverage(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import scaled_vectors

    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    n = scaled_vectors(T(spark, sf_dir, "embeddings")).select(
        "vec_id", "norm2"
    )
    j = d.join(n, d["doc_id"] == n["vec_id"], "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count("vec_id").cast("bigint").alias("n_covered"),
        F.expr("(1000 * count(vec_id)) div count(1)").alias(
            "coverage_permille"
        ),
        F.sum("norm2").cast("bigint").alias("total_norm2"),
    )


# --- value_range_window: numeric RANGE frames --------------------------------
# W2 covered TIME-range rolling frames; this is the numeric-ORDER-BY form:
# for each event, how many of the same user's events fall within ±5.00 of
# its value, and their integer sum — RANGE BETWEEN 500 PRECEDING AND 500
# FOLLOWING over cents.  Classic similar-magnitude cohort ask (price
# banding, anomaly context).  One user_id exchange; the range frame is a
# sliding pointer pair over the per-user sort, not a self-join.

_VRW_ORACLE = """
WITH c AS (
  SELECT event_id, user_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, cents,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_within_5,
  CAST(SUM(cents) OVER w AS BIGINT) AS sum_within_5
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY cents
             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
"""


@query(
    "value_range_window",
    oracle=_VRW_ORACLE,
    tags=("window", "range-frame", "W2"),
)
def value_range_window(spark, sf_dir):
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("cents")
        .rangeBetween(-500, 500)
    )
    return e.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_within_5"),
        F.sum("cents").over(w).cast("bigint").alias("sum_within_5"),
    )


# --- session_funnel: ordered conversion inside 30-minute sessions ------------
# funnel_conversion measured the corpus-global signup→click→purchase
# ordering; the per-session form asks it within each 30-minute-gap
# session — the grain product analytics actually reports.  Stages must
# occur IN ORDER inside one session (min stage timestamps per session,
# each after the previous).  Reuses the sessionization window chain (lag
# gap flag + cumsum), all on one user_id exchange.

_SF_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
), f AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
            THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM f
), per_session AS (
  SELECT user_id, session_idx,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM s GROUP BY user_id, session_idx
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT) AS n_stage1,
  CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup)
       AS BIGINT) AS n_stage2,
  CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup
                          AND t_purchase > t_click)
       AS BIGINT) AS n_stage3
FROM per_session
"""


@query(
    "session_funnel",
    oracle=_SF_ORACLE,
    tags=("product", "funnel", "session", "window"),
)
def session_funnel(spark, sf_dir):
    e = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev_epoch = F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
    flagged = e.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull() | ((epoch - prev_epoch) > 1800), 1
        ).otherwise(0),
    )
    s = flagged.withColumn(
        "session_idx",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = s.groupBy("user_id", "session_idx").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_signup").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_signup"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return per_session.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count(F.when(stage1, F.lit(1))).cast("bigint").alias("n_stage1"),
        F.count(F.when(stage2, F.lit(1))).cast("bigint").alias("n_stage2"),
        F.count(F.when(stage3, F.lit(1))).cast("bigint").alias("n_stage3"),
    )


# --- rfm_segments: recency/frequency/monetary segmentation -------------------
# The classic lifecycle segmentation: per user, days since last purchase
# (recency, against the corpus max date — injectable-clock style anchor),
# purchase count (frequency) and integer-cents total (monetary), each
# scored into terciles by EXACT rank selection (no percentile
# interpolation — house rule), concatenated into an 'RFM' cell.  One
# user-grain aggregate + three rank windows over the tiny per-user frame.

_RFM_ORACLE = """
WITH p AS (
  SELECT user_id,
    MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS monetary_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), anchored AS (
  SELECT *, date_diff('day', CAST(last_ts AS DATE),
                      (SELECT MAX(CAST(last_ts AS DATE)) FROM p))
    AS recency_days
  FROM p
), ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (ORDER BY recency_days, user_id) AS r_rn,
    ROW_NUMBER() OVER (ORDER BY frequency DESC, user_id) AS f_rn,
    ROW_NUMBER() OVER (ORDER BY monetary_cents DESC, user_id) AS m_rn,
    COUNT(*) OVER () AS n
  FROM anchored
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
  frequency, monetary_cents,
  ((3 * (r_rn - 1)) // n) + 1 AS r_score,
  ((3 * (f_rn - 1)) // n) + 1 AS f_score,
  ((3 * (m_rn - 1)) // n) + 1 AS m_score,
  CAST(((3 * (r_rn - 1)) // n) + 1 AS VARCHAR) ||
  CAST(((3 * (f_rn - 1)) // n) + 1 AS VARCHAR) ||
  CAST(((3 * (m_rn - 1)) // n) + 1 AS VARCHAR) AS rfm_cell
FROM ranked
"""


@query(
    "rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("product", "segmentation", "rank"),
)
def rfm_segments(spark, sf_dir):
    e = T(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = e.groupBy("user_id").agg(
        F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    # the anchor (corpus max last_ts) rides the SAME single-partition
    # window pass the global tercile ranks already pay — a separate
    # agg-then-crossJoin re-executed the whole per-user groupBy lineage
    # (two scans, 5 exchanges → 2; VERDICT r6 next-8)
    wn = Window.partitionBy()
    anchored = p.withColumn(
        "_anchor", F.max(F.to_date("last_ts")).over(wn)
    ).withColumn(
        "recency_days",
        F.datediff(F.col("_anchor"), F.to_date("last_ts")).cast("bigint"),
    )
    wr = Window.orderBy("recency_days", "user_id")
    wf = Window.orderBy(F.col("frequency").desc(), "user_id")
    wm = Window.orderBy(F.col("monetary_cents").desc(), "user_id")
    ranked = (
        anchored.withColumn("r_rn", F.row_number().over(wr))
        .withColumn("f_rn", F.row_number().over(wf))
        .withColumn("m_rn", F.row_number().over(wm))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    def score(rn):
        return F.expr(f"((3 * ({rn} - 1)) div n) + 1")
    return ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("r_rn").alias("r_score"),
        score("f_rn").alias("f_score"),
        score("m_rn").alias("m_score"),
        F.concat(
            score("r_rn").cast("string"),
            score("f_rn").cast("string"),
            score("m_rn").cast("string"),
        ).alias("rfm_cell"),
    )


# --- rolling_wau_exact: exact 7-day rolling active users ---------------------
# The exact counterpart of the mergeable-sketch rollup
# (`hll_rolling_registers` estimates this): distinct users per trailing
# 7-day window, computed from the (day, user) DEDUPED grain self-joined
# over the 7-day band — the fan-out is exactly 7× the day-grain table
# (bounded by the window length, never by raw event volume), which is the
# honest exact-computation cost the sketch amortizes away.

_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day_, user_id FROM events
), days AS (
  SELECT DISTINCT day_ FROM du
)
SELECT d.day_,
  CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d
JOIN du u ON u.day_ BETWEEN d.day_ - 6 AND d.day_
GROUP BY d.day_
"""


@query(
    "rolling_wau_exact",
    oracle=_WAU_ORACLE,
    tags=("window", "distinct", "rolling"),
)
def rolling_wau_exact(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    du = e.select(
        F.to_date("ts").alias("day_"), "user_id"
    ).distinct()
    days = du.select("day_").distinct()
    d = days.alias("d")
    u = du.alias("u")
    j = d.join(
        u,
        F.col("u.day_").between(
            F.date_sub(F.col("d.day_"), 6), F.col("d.day_")
        ),
    )
    return j.groupBy(F.col("d.day_").alias("day_")).agg(
        F.countDistinct(F.col("u.user_id")).cast("bigint").alias("wau")
    )


# --- order_lateness_histogram: ship-delay day buckets ------------------------
# Fulfillment-latency distribution: days between order and line-item ship
# date, bucketed per 7-day band with integer div — the warehouse ops
# report shape (join + datediff + histogram), one shuffle each.

_LATE_ORACLE = """
SELECT (date_diff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE))) // 7 AS weeks_to_ship,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems,
  CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


@query(
    "order_lateness_histogram",
    oracle=_LATE_ORACLE,
    tags=("join", "histogram", "tpch"),
)
def order_lateness_histogram(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    j = l.join(o, o["o_orderkey"] == l["l_orderkey"])
    weeks = F.expr(
        "datediff(cast(l_shipdate as date), cast(o_orderdate as date)) div 7"
    )
    return j.groupBy(weeks.alias("weeks_to_ship")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.sum(F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("revenue_cents"),
    )
