"""Round-6 analytics batch 4: time-series primitives still missing from
the registry — time-WEIGHTED averaging (TWAP, the duration-weighted twin
of the existing VWAP), the per-user event-type transition matrix (Markov
chain estimation over sequences), and CUSUM upward-drift detection via
the cumsum-minus-running-min identity (the recursion-free window form).

All integer-exact cross-engine: cents/seconds as BIGINT, one double
division at the end (same expression tree in both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

# --- twap_per_user: time-weighted average value ------------------------------
# Each event's value holds until the user's next event; TWAP = Σ(cents·Δt)
# / Σ(Δt) with Δt in whole seconds (unix_timestamp ↔ date_diff both
# floor).  The duration-weighted complement of priority_stats' VWAP (A5):
# VWAP weights by size, TWAP by holding time — the standard pair in
# market analytics.  A user's last event has no successor and contributes
# no weight (SUM skips the NULL product).  Exact: cents ≤ ~5e4, Δt ≤ ~2e8 s
# → per-term product ≤ 1e13, BIGINT-safe; ONE double division at the end.
# Scale: a single user_id exchange shared by the lead window and the
# groupBy (same key, Catalyst reuses the partitioning).

_TWAP_ORACLE = """
WITH seq AS (
  SELECT user_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
              CAST(ts AS TIMESTAMP)) AS ep,
    lead(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                   CAST(ts AS TIMESTAMP)))
      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      AS nxt
  FROM events
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(nxt - ep) AS BIGINT) AS held_seconds,
  CAST(SUM(cents * (nxt - ep)) AS DOUBLE)
    / NULLIF(CAST(SUM(nxt - ep) AS DOUBLE), 0) AS twap_cents
FROM seq
GROUP BY user_id
"""


@query("twap_per_user", oracle=_TWAP_ORACLE, tags=("temporal", "agg", "A5"))
def twap_per_user(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        F.unix_timestamp("ts").alias("ep"),
    ).withColumn("nxt", F.lead("ep").over(w))
    held = F.col("nxt") - F.col("ep")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(held).cast("bigint").alias("held_seconds"),
        (
            F.sum(F.col("cents") * held).cast("double")
            / F.nullif(F.sum(held).cast("double"), F.lit(0.0))
        ).alias("twap_cents"),
    )


# --- markov_transitions: event-type transition matrix ------------------------
# First-order Markov estimation over each user's event sequence: count
# consecutive (from → to) pairs, then P(to | from) as one exact ratio.
# The denominator is the OUTGOING count of the from-state (pairs where it
# has a successor), so rows per from-state sum to exactly 1 — asserted in
# tests.  Scale: the fact table is scanned and user_id-shuffled ONCE; the
# out-degree is a window SUM over the already-aggregated |types|²
# transition frame (a join back against a derived aggregate would
# re-execute the scan+shuffle for the second lineage — measured as 2×
# exchanges before this form).

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (
      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
    ) AS to_type
  FROM events
), trans AS (
  SELECT from_type, to_type, COUNT(*) AS n_trans
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type,
  CAST(n_trans AS BIGINT) AS n_trans,
  CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS n_out,
  CAST(n_trans AS DOUBLE)
    / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE) AS p_trans
FROM trans
"""


@query("markov_transitions", oracle=_MARKOV_ORACLE, tags=("temporal", "sequence"))
def markov_transitions(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wout = Window.partitionBy("from_type")
    n_out = F.sum("n_trans").over(wout)
    return trans.select(
        "from_type",
        "to_type",
        F.col("n_trans").cast("bigint").alias("n_trans"),
        n_out.cast("bigint").alias("n_out"),
        (F.col("n_trans").cast("double") / n_out.cast("double")).alias("p_trans"),
    )


# --- cusum_drift: change detection without recursion -------------------------
# One-sided CUSUM S_i = max(0, S_{i-1} + d_i) looks recursive, but has the
# closed form S_i = C_i - min(0, min_{j<=i} C_j) where C is the plain
# cumsum of deviations — the 0 term is the EMPTY prefix (C_0 = 0), without
# which the first deviation is swallowed (caught by the hypothesis identity
# test vs the textbook recursion: vals=[2,1] → [1,1], not [0,0]).  Two
# stacked window functions.  Deviations are integer:
# d_i = cents_i - mu where mu = per-user integer mean (total div n, floor
# in both engines) computed as an UNBOUNDED window over the SAME user_id
# partition — mean, cumsum, running-min and the final groupBy all ride
# ONE user_id exchange; no join against a per-user (data-sized) table.
# A drift alarm fires when S_i exceeds h = 10·mu.  Output: per user, the
# alarm count, the peak CUSUM, and the first alarm's epoch second.

_CUSUM_ORACLE = """
WITH base AS (
  SELECT user_id, event_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
              CAST(ts AS TIMESTAMP)) AS ep
  FROM events
), withmu AS (
  SELECT user_id, event_id, cents, ep,
    SUM(cents) OVER (PARTITION BY user_id)
      // COUNT(*) OVER (PARTITION BY user_id) AS mu
  FROM base
), cum AS (
  SELECT user_id, ep, event_id, mu,
    SUM(cents - mu) OVER (
      PARTITION BY user_id ORDER BY ep, event_id) AS c
  FROM withmu
), s AS (
  SELECT user_id, ep, mu,
    c - LEAST(0, MIN(c) OVER (
      PARTITION BY user_id ORDER BY ep, event_id)) AS cusum
  FROM cum
)
SELECT user_id,
  CAST(COUNT(*) FILTER (WHERE cusum > 10 * mu) AS BIGINT) AS n_alarms,
  CAST(MAX(cusum) AS BIGINT) AS peak_cusum,
  CAST(MIN(ep) FILTER (WHERE cusum > 10 * mu) AS BIGINT) AS first_alarm_ep
FROM s
GROUP BY user_id
"""


@query("cusum_drift", oracle=_CUSUM_ORACLE, tags=("temporal", "window", "quality"))
def cusum_drift(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        F.unix_timestamp("ts").alias("ep"),
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    cum = (
        base.withColumn(
            "mu",
            F.expr(
                "(sum(cents) over (partition by user_id))"
                " div (count(1) over (partition by user_id))"
            ),
        )
        .withColumn("c", F.sum(F.col("cents") - F.col("mu")).over(w))
        .withColumn(
            "cusum", F.col("c") - F.least(F.lit(0), F.min("c").over(w))
        )
    )
    alarm = F.col("cusum") > 10 * F.col("mu")
    return cum.groupBy("user_id").agg(
        F.count(F.when(alarm, 1)).cast("bigint").alias("n_alarms"),
        F.max("cusum").cast("bigint").alias("peak_cusum"),
        F.min(F.when(alarm, F.col("ep"))).cast("bigint").alias("first_alarm_ep"),
    )


# --- session_paths_topk: frequent-path sequence mining -----------------------
# The top-20 most common within-session event-type journeys ("path"
# strings) — the product-analytics path report built from the SAME 30-min
# sessionization as user_sessions (idiom copied verbatim so the two
# queries agree on session boundaries).  The path is serialized
# deterministically: collect_list(struct(ts, event_id, type)) sorted by
# the struct's field order == the oracle's string_agg(... ORDER BY ts,
# event_id).  Top-k takes TakeOrderedAndProject (orderBy+limit BEFORE the
# rank window, which then runs over 20 rows — never a single-partition
# window over the full path frame); count ties break on the unique path
# string, so the limit is deterministic.

_PATHS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), f AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM f
), paths AS (
  SELECT user_id, session_idx,
    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, session_idx
), counts AS (
  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, CAST(n_sessions AS BIGINT) AS n_sessions,
  CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rnk
FROM counts
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@query("session_paths_topk", oracle=_PATHS_ORACLE, tags=("sequence", "topk", "T10"))
def session_paths_topk(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
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
    paths = sessions.groupBy("user_id", "session_idx").agg(
        F.expr(
            "array_join(transform("
            "  array_sort(collect_list(struct(ts, event_id, event_type))),"
            "  s -> s.event_type), '>')"
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    top = counts.orderBy(F.col("n_sessions").desc(), "path").limit(20)
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    return top.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
