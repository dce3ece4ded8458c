"""Temporal queries: hourly rollups, spine densification, rolling windows,
time-shifted joins, as-of joins, interval (range) joins, CDC latest-wins.

These exercise the operator library in zeta_etl_spark.operators.temporal /
.cdc against the `events` stream table (SURVEY.md §2.3 J5-J8/J11, §2.4 A1/A14,
§2.5 W2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.operators.cdc import latest_by_keys
from zeta_etl_spark.operators.temporal import as_of_join, range_join, shift_join
from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- hourly_events: the canonical streaming-gold agg (A1/T2) ----------------
# Batch form of groupBy(date_trunc('hour', ts), key).agg(count, sum) —
# zetadex-transactions-helius-pipeline.py:777-793.

_HOURLY_ORACLE = """
SELECT
  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


@query("hourly_events", oracle=_HOURLY_ORACLE, tags=("agg", "A1", "T2"))
def hourly_events(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _hourly(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "sum_value"))


# --- hourly_spine_rolling: spine densification (J11/P2) + fillna (P11) +
# 24h trailing range window (W2).  The flagship query — mirrors
# agg_ix_trade_asset_24h_rolling (zetadex-transactions-helius-pipeline.py:829-855).

_SPINE_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(hour_ts) AS lo, max(hour_ts) AS hi FROM hourly
), spine AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds), (SELECT hi FROM bounds),
                                INTERVAL 1 HOUR)) AS hour_ts
), types AS (
  SELECT DISTINCT event_type FROM events
), dense AS (
  SELECT s.hour_ts, t.event_type,
         COALESCE(h.n_events, 0) AS n_events,
         COALESCE(h.sum_value, 0.0) AS sum_value
  FROM spine s
  CROSS JOIN types t
  LEFT JOIN hourly h ON s.hour_ts = h.hour_ts AND t.event_type = h.event_type
)
SELECT hour_ts, event_type, n_events, sum_value,
  CAST(SUM(n_events) OVER w AS BIGINT) AS n_events_24h,
  CAST(SUM(CAST(sum_value AS DECIMAL(32,6))) OVER w AS DOUBLE) AS sum_value_24h
FROM dense
WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
"""


@query(
    "hourly_spine_rolling",
    oracle=_SPINE_ORACLE,
    tags=("window", "W2", "J11", "P2", "P11", "flagship"),
)
def hourly_spine_rolling(spark, sf_dir):
    from pyspark.sql.window import Window

    hourly = _hourly(spark, sf_dir)
    bounds = hourly.agg(
        F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("hour_ts")
    )
    # bound: event_type is a closed enum in this schema (5 values)
    types = T(spark, sf_dir, "events").select("event_type").distinct()
    dense = (
        spine.transform(with_scalar_frame(types, bound=16))
        .join(hourly, ["hour_ts", "event_type"], "left")
        .fillna({"n_events": 0, "sum_value": 0.0})
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp(F.col("hour_ts").cast("timestamp")))
        .rangeBetween(-24 * 3600, 0)
    )
    return dense.select(
        "hour_ts",
        "event_type",
        "n_events",
        "sum_value",
        F.sum("n_events").over(w).cast("bigint").alias("n_events_24h"),
        F.sum(F.col("sum_value").cast("DECIMAL(32,6)"))
        .over(w)
        .cast("double")
        .alias("sum_value_24h"),
    )


# --- hourly_delta_prior: time-shifted equi join (J5) ------------------------
# "prior hour" joins in cleaned_pnl
# (zetadex-transactions-helius-pipeline.py:1023-1044), normalized to a pure
# equi join (shift projected before the join).

_DELTA_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT c.hour_ts, c.event_type, c.n_events, c.sum_value,
       p.n_events AS n_events_prev,
       p.sum_value AS sum_value_prev,
       c.sum_value - COALESCE(p.sum_value, 0.0) AS value_delta
FROM hourly c
LEFT JOIN hourly p
  ON p.event_type = c.event_type
 AND c.hour_ts = p.hour_ts + INTERVAL 1 HOUR
"""


@query("hourly_delta_prior", oracle=_DELTA_ORACLE, tags=("join", "J5"))
def hourly_delta_prior(spark, sf_dir):
    hourly = _hourly(spark, sf_dir)
    out = shift_join(
        hourly,
        hourly,
        keys=["event_type"],
        ts_col="hour_ts",
        shift="interval 1 hour",
        suffix="_prev",
    )
    return out.withColumn(
        "value_delta",
        F.col("sum_value") - F.coalesce(F.col("sum_value_prev"), F.lit(0.0)),
    )


# --- asof_prior_click: backward strict as-of join (J6) ----------------------
# trades-after-referral shape (zetadex-rewards-v2-pipeline.py:275-288), done
# with the union-merge pattern (one shuffle, no inequality-join blowup).

_ASOF_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_event_id, user_id,
         CAST(ts AS TIMESTAMP) AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.click_ts, c.click_value, c.click_event_id
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts > c.click_ts
"""


@query("asof_prior_click", oracle=_ASOF_ORACLE, tags=("join", "J6", "asof"), decimal_faithful=False)
def asof_prior_click(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
        F.col("event_id").alias("click_event_id"),
    )
    return as_of_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_value", "click_event_id"],
        strict=True,
    )


# --- session_range_join: point-in-interval join (J7/J8) ---------------------
# Amplitude sessionization (zetadex-amplitude-events-pipeline.py:187-197) and
# the RANGE_JOIN-hinted quote pairing, re-expressed as the bucketized range
# join (no Databricks hint needed; no nested loop).

_SESSION_ORACLE = """
WITH s AS (
  SELECT event_id AS session_id, user_id,
         CAST(ts AS TIMESTAMP) AS session_start,
         CAST(ts AS TIMESTAMP) + INTERVAL 6 HOUR AS session_end
  FROM events WHERE event_type = 'signup'
), e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
)
SELECT s.session_id, s.user_id, s.session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(32,6))) AS DOUBLE) AS session_value
FROM e
JOIN s ON e.user_id = s.user_id
      AND e.ts >= s.session_start AND e.ts < s.session_end
GROUP BY s.session_id, s.user_id, s.session_start
"""


@query("session_range_join", oracle=_SESSION_ORACLE, tags=("join", "J7", "J8"), decimal_faithful=False)
def session_range_join(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    sessions = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("session_id"),
        F.col("user_id"),
        F.col("ts").alias("session_start"),
        (F.col("ts") + F.expr("interval 6 hours")).alias("session_end"),
    )
    left = ev.select("event_id", "user_id", "ts", "value")
    joined = range_join(
        left,
        sessions,
        left_ts="ts",
        start_col="session_start",
        end_col="session_end",
        bucket_seconds=3600,
        keys=["user_id"],
    )
    return joined.groupBy("session_id", "user_id", "session_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "session_value"),
    )


# --- latest_event_per_user: CDC latest-wins (S8/A14) ------------------------
# apply_changes(keys=[user], sequence_by=ts) batch semantics
# (zetaflex-pipeline.py:146-151; zetadex-referrals-pipeline.py:147-152).

_LATEST_ORACLE = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


@query("latest_event_per_user", oracle=_LATEST_ORACLE, tags=("cdc", "S8", "A14"))
def latest_event_per_user(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return latest_by_keys(ev, keys=["user_id"], sequence_by=["ts", "event_id"])


# --- user_sessions: lead/lag sessionization (T10/W8) -------------------------
# Session-like windows built with lag + gap flag + running sum — the
# wallet-session pattern (zetadex-amplitude-events-pipeline.py:149-167),
# generalized: a >30 min silence starts a new session.

_SESSIONS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
), f AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM f
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
  COUNT(*) AS n_events,
  min(ts) AS session_start,
  max(ts) AS session_end,
  date_diff('second', min(ts), max(ts)) AS duration_s,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS session_value
FROM s GROUP BY user_id, session_idx
"""


@query("user_sessions", oracle=_SESSIONS_ORACLE, tags=("window", "T10", "W8"), decimal_faithful=False)
def user_sessions(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = T(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev_epoch = F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
    flagged = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull() | ((epoch - prev_epoch) > 1800), 1
        ).otherwise(0),
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn(
        "session_idx", F.sum("is_start").over(wcum).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            F.unix_timestamp(F.max("ts").cast("timestamp"))
            - F.unix_timestamp(F.min("ts").cast("timestamp"))
        ).alias("duration_s"),
        dec_sum("value", "session_value"),
    )


# --- connect_attribution: validity windows via lead + sentinel + fallback ---
# The amplitude wallet-session join (zetadex-amplitude-events-pipeline.py:
# 149-167 builds [connect, next_connect) windows with lead() and a 9999-12-31
# sentinel; :198-207 attributes pre-first-connect events to the FIRST connect).
# 'signup' events play the wallet-connect role here.

_ATTRIB_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
), connects AS (
  SELECT user_id, event_id AS connect_event_id, ts AS connect_ts,
    COALESCE(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             TIMESTAMP '9999-12-31 00:00:00') AS valid_to
  FROM e WHERE event_type = 'signup'
), first_connect AS (
  SELECT user_id, connect_event_id AS first_event_id, connect_ts AS first_ts
  FROM connects
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY connect_ts, connect_event_id) = 1
)
SELECT ev.event_id, ev.user_id, ev.ts,
  COALESCE(c.connect_event_id, f.first_event_id) AS connect_event_id,
  COALESCE(c.connect_ts, f.first_ts) AS connect_ts,
  CASE WHEN c.connect_event_id IS NOT NULL THEN 'in_window'
       WHEN f.first_event_id IS NOT NULL THEN 'fallback'
       ELSE 'none' END AS attribution
FROM e ev
LEFT JOIN connects c
  ON ev.user_id = c.user_id AND ev.ts >= c.connect_ts AND ev.ts < c.valid_to
LEFT JOIN first_connect f ON ev.user_id = f.user_id
"""


@query("connect_attribution", oracle=_ATTRIB_ORACLE, tags=("join", "J7", "W8", "T10"))
def connect_attribution(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    connects = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("connect_event_id"),
            F.col("ts").alias("connect_ts"),
            F.coalesce(
                F.lead("ts").over(w),
                F.lit("9999-12-31 00:00:00").cast("timestamp_ntz"),
            ).alias("valid_to"),
        )
    )
    wf = Window.partitionBy("user_id").orderBy("connect_ts", "connect_event_id")
    first_connect = (
        connects.withColumn("rn", F.row_number().over(wf))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("connect_event_id").alias("first_event_id"),
            F.col("connect_ts").alias("first_ts"),
        )
    )
    e = ev.alias("e")
    c = connects.alias("c")
    joined = e.join(
        c,
        (F.col("e.user_id") == F.col("c.user_id"))
        & (F.col("e.ts") >= F.col("c.connect_ts"))
        & (F.col("e.ts") < F.col("c.valid_to")),
        "left",
    ).join(F.broadcast(first_connect.alias("f")), F.col("e.user_id") == F.col("f.user_id"), "left")
    return joined.select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.ts").alias("ts"),
        F.coalesce("c.connect_event_id", "f.first_event_id").alias(
            "connect_event_id"
        ),
        F.coalesce("c.connect_ts", "f.first_ts").alias("connect_ts"),
        F.when(F.col("c.connect_event_id").isNotNull(), "in_window")
        .when(F.col("f.first_event_id").isNotNull(), "fallback")
        .otherwise("none")
        .alias("attribution"),
    )


# --- session_window_native: Spark's built-in session windows (T10 depth) ----
# The lead-based sessionizer (user_sessions) is the reference's shape
# (zetadex-amplitude-events-pipeline.py:149-197); Spark also has a native
# F.session_window usable in BOTH batch and streaming groupBy.  Oracle: the
# classic gaps-and-islands construction — new island when the gap from the
# previous event exceeds the timeout; window end = last event + gap (Spark's
# session_window end semantics).

_SESSION_GAP_MIN = 360  # 6 hours

_NATIVE_SESSION_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
), flagged AS (
  SELECT *, CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_SESSION_GAP_MIN} MINUTE
                 OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), islands AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL {_SESSION_GAP_MIN} MINUTE AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS session_value
FROM islands GROUP BY user_id, sid
"""


@query(
    "session_window_native",
    oracle=_NATIVE_SESSION_ORACLE,
    tags=("window", "session", "T10"),
    decimal_faithful=False,
)
def session_window_native(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{_SESSION_GAP_MIN} minutes").alias(
                "_w"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "session_value"),
        )
        .select(
            "user_id",
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# --- hopping_event_counts: sliding (hopping) event-time windows --------------
# 1-hour windows hopping every 30 minutes — each event lands in exactly two
# windows.  Spark: the native F.window(ts, '1 hour', '30 minutes') generate;
# oracle: the two epoch-aligned window starts derived with integer div
# (floor(epoch/1800)*1800 and its 30-minute predecessor).  Same operator
# family as the streaming T2 tumbling window, completing SURVEY §2.5's
# event-time window shapes.

_HOPPING_ORACLE = """
WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events
), w AS (
  SELECT make_timestamp(((epoch_ms(t) // 1000 // 1800) * 1800)
                        * 1000000) AS s1,
         event_type, value
  FROM e
), x AS (
  SELECT s1 AS hop_start, event_type, value FROM w
  UNION ALL
  SELECT s1 - INTERVAL 30 MINUTE, event_type, value FROM w
)
SELECT hop_start, event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM x GROUP BY 1, 2
"""


@query("hopping_event_counts", oracle=_HOPPING_ORACLE, tags=("agg", "window", "T2"))
def hopping_event_counts(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("_w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.col("_w.start").alias("hop_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
