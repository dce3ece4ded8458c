"""Product-analytics queries downstream of the amplitude-style event stream:
conversion funnels and retention cohorts — the two reports every
wallet-connect/session pipeline ultimately feeds.

Determinism: both are pure count/min/date-bucket arithmetic over fully
keyed groupings; the only doubles are final ratios of exact counts.

Scale: funnels are one groupBy(user) with conditional min-timestamps (a
single shuffle, map-side combined); cohorts are two hash aggregations keyed
by (cohort_day, week_offset) — no windows, no joins against raw events
beyond the first-activity broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query

# --- funnel_conversion: ordered-stage funnel (signup → click → purchase) ----
# A user converts a stage only if its FIRST occurrence is at-or-after the
# first occurrence of the previous stage (classic ordered funnel).

_FUNNEL_ORACLE = """
WITH stages AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), flags AS (
  SELECT user_id,
    CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS s1,
    CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
         THEN 1 ELSE 0 END AS s2,
    CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
          AND t_purchase >= t_click THEN 1 ELSE 0 END AS s3
  FROM stages
)
SELECT
  CAST(SUM(s1) AS BIGINT) AS n_signup,
  CAST(SUM(s2) AS BIGINT) AS n_clicked_after,
  CAST(SUM(s3) AS BIGINT) AS n_purchased_after,
  CAST(SUM(s2) AS DOUBLE) / NULLIF(SUM(s1), 0) AS click_rate,
  CAST(SUM(s3) AS DOUBLE) / NULLIF(SUM(s2), 0) AS purchase_rate
FROM flags
"""


@query("funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("product", "funnel", "A3"))
def funnel_conversion(spark, sf_dir):
    ev = T(spark, sf_dir, "events")

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)
    s2 = F.when(
        F.col("t_signup").isNotNull() & (F.col("t_click") >= F.col("t_signup")),
        1,
    ).otherwise(0)
    s3 = F.when(
        F.col("t_signup").isNotNull()
        & (F.col("t_click") >= F.col("t_signup"))
        & (F.col("t_purchase") >= F.col("t_click")),
        1,
    ).otherwise(0)
    flags = stages.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    return flags.agg(
        F.sum("s1").cast("bigint").alias("n_signup"),
        F.sum("s2").cast("bigint").alias("n_clicked_after"),
        F.sum("s3").cast("bigint").alias("n_purchased_after"),
        (
            F.sum("s2").cast("double") / F.nullif(F.sum("s1"), F.lit(0))
        ).alias("click_rate"),
        (
            F.sum("s3").cast("double") / F.nullif(F.sum("s2"), F.lit(0))
        ).alias("purchase_rate"),
    )


# --- retention_cohorts: daily purchase-retention matrix ---------------------
# Cohort = the day of a user's FIRST purchase; retention(k) = fraction of
# that cohort purchasing again k days later.  Daily purchase activity (not
# any-event weekly) because the synthetic users are uniformly active —
# any-event cohorts would collapse to a single all-1.0 row (found live; a
# degenerate matrix verifies nothing).  Day buckets via epoch-day integers
# (zone-free; date_trunc('week') week-start conventions differ across
# engines).

_COHORT_ORACLE = """
WITH d AS (
  SELECT user_id,
    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      AS BIGINT) AS day_no
  FROM events WHERE event_type = 'purchase'
), firsts AS (
  SELECT user_id, MIN(day_no) AS cohort_day FROM d GROUP BY user_id
), activity AS (
  SELECT DISTINCT d.user_id, f.cohort_day,
    d.day_no - f.cohort_day AS day_offset
  FROM d JOIN firsts f USING (user_id)
), sizes AS (
  SELECT cohort_day, COUNT(DISTINCT user_id) AS cohort_size FROM firsts
  GROUP BY cohort_day
)
SELECT a.cohort_day, a.day_offset,
  COUNT(*) AS active_users,
  s.cohort_size,
  CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS retention
FROM activity a JOIN sizes s USING (cohort_day)
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
"""


@query("retention_cohorts", oracle=_COHORT_ORACLE, tags=("product", "cohort", "A6"))
def retention_cohorts(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    day_no = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    d = ev.select("user_id", day_no.alias("day_no"))
    firsts = d.groupBy("user_id").agg(F.min("day_no").alias("cohort_day"))
    activity = (
        d.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day_no") - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            "cohort_size",
            (
                F.col("active_users").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
    )


# --- event_type_lift: association (market-basket) co-occurrence -------------
# Which event types co-occur in the same (user, day) basket more than
# chance?  support(a,b)·N / (support(a)·support(b)) — the classic lift
# statistic, all exact counts with one double division.  Baskets are
# (user, day), not lifetime users: on the uniformly-active synthetic
# corpus every user touches every type eventually, which collapses
# lifetime lift to exactly 1.0 (found live — a flat matrix verifies
# nothing).

_LIFT_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day_, event_type FROM events
), n AS (
  SELECT COUNT(*) AS n_users FROM
    (SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events)
), supp AS (
  SELECT event_type, COUNT(*) AS n_a FROM baskets GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.day_ = b.day_
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
  CAST(p.n_ab AS BIGINT) AS n_both,
  CAST(sa.n_a AS BIGINT) AS n_a,
  CAST(sb.n_a AS BIGINT) AS n_b,
  (CAST(p.n_ab AS DOUBLE) * n.n_users)
    / (CAST(sa.n_a AS DOUBLE) * sb.n_a) AS lift
FROM pairs p
JOIN supp sa ON sa.event_type = p.type_a
JOIN supp sb ON sb.event_type = p.type_b
CROSS JOIN n
"""


@query("event_type_lift", oracle=_LIFT_ORACLE, tags=("product", "association", "lift"))
def event_type_lift(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.col("ts").cast("date").alias("day_"), "event_type"
    ).distinct()
    n = (
        ev.select("user_id", F.col("ts").cast("date"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    supp = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_a"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day_") == F.col("b.day_"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = supp.select(F.col("event_type").alias("type_a"), F.col("n_a"))
    sb = supp.select(F.col("event_type").alias("type_b"), F.col("n_a").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .transform(with_scalar_frame(n))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (
                F.col("n_ab").cast("double") * F.col("n_users")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


# --- cohort_ltv_curve: cumulative value per user by cohort age ---------------
# The lifetime-value complement of retention_cohorts: users cohort by the
# DAY of their FIRST event (window MIN on the same user_id exchange —
# no join against a per-user aggregate), and each cohort's cumulative
# event value per member is reported by age-week.  All value math is
# integer cents; the single division by cohort size happens once per
# output row.  Scale: one user_id exchange (window min + per-user-week
# rollup), then everything downstream is (cohort × age)-sized.

_LTV_ORACLE = """
WITH base AS (
  SELECT user_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    CAST(ts AS TIMESTAMP) AS ts,
    CAST(MIN(CAST(ts AS TIMESTAMP))
         OVER (PARTITION BY user_id) AS DATE) AS cohort_day
  FROM events
), uw AS (
  SELECT cohort_day, user_id,
    date_diff('day', cohort_day, CAST(ts AS DATE)) // 7 AS age_week,
    SUM(cents) AS cents
  FROM base GROUP BY 1, 2, 3
), sizes AS (
  SELECT cohort_day, COUNT(DISTINCT user_id) AS n_users FROM uw GROUP BY 1
), weekly AS (
  SELECT cohort_day, age_week, SUM(cents) AS week_cents FROM uw GROUP BY 1, 2
), curve AS (
  SELECT cohort_day, age_week, week_cents,
    SUM(week_cents) OVER (PARTITION BY cohort_day ORDER BY age_week)
      AS cum_cents
  FROM weekly
)
SELECT c.cohort_day, CAST(c.age_week AS BIGINT) AS age_week,
  CAST(c.week_cents AS BIGINT) AS week_cents,
  CAST(c.cum_cents AS BIGINT) AS cum_cents,
  CAST(s.n_users AS BIGINT) AS n_users,
  CAST(c.cum_cents AS DOUBLE) / CAST(s.n_users AS DOUBLE) AS ltv_cents_per_user
FROM curve c JOIN sizes s ON s.cohort_day = c.cohort_day
"""


@query("cohort_ltv_curve", oracle=_LTV_ORACLE, tags=("product", "cohort", "ltv"))
def cohort_ltv_curve(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    wpart = Window.partitionBy("user_id")
    base = e.select(
        "user_id",
        "ts",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    ).withColumn(
        "cohort_day",
        F.min("ts").over(wpart).cast("date"),
    )
    uw = base.groupBy(
        "cohort_day",
        "user_id",
        F.expr(
            "datediff(cast(ts as date), cohort_day) div 7"
        ).alias("age_week"),
    ).agg(F.sum("cents").alias("cents"))
    sizes = uw.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    weekly = uw.groupBy("cohort_day", "age_week").agg(
        F.sum("cents").alias("week_cents")
    )
    wcum = Window.partitionBy("cohort_day").orderBy("age_week")
    curve = weekly.withColumn("cum_cents", F.sum("week_cents").over(wcum))
    return curve.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        F.col("age_week").cast("bigint").alias("age_week"),
        F.col("week_cents").cast("bigint").alias("week_cents"),
        F.col("cum_cents").cast("bigint").alias("cum_cents"),
        F.col("n_users").cast("bigint").alias("n_users"),
        (
            F.col("cum_cents").cast("double") / F.col("n_users").cast("double")
        ).alias("ltv_cents_per_user"),
    )


# --- longest_active_streak: gaps-and-islands on the day grain ----------------
# Longest run of CONSECUTIVE active days per user — the engagement-streak
# metric.  Classic gaps-and-islands: day − dense-rank-of-day is constant
# within a consecutive run, so grouping on that anchor costs one exchange
# past the distinct-day rollup.  All date arithmetic stays on DATE/BIGINT.

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), ranked AS (
  SELECT user_id, d,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
), islands AS (
  SELECT user_id, d - CAST(rn AS INTEGER) AS anchor, COUNT(*) AS streak_len,
    MIN(d) AS streak_start
  FROM ranked GROUP BY user_id, d - CAST(rn AS INTEGER)
), best AS (
  SELECT user_id, streak_len, streak_start,
    ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY streak_len DESC, streak_start) AS pick
  FROM islands
)
SELECT user_id, CAST(streak_len AS BIGINT) AS longest_streak_days,
  streak_start
FROM best WHERE pick = 1
"""


@query(
    "longest_active_streak", oracle=_STREAK_ORACLE, tags=("product", "streak")
)
def longest_active_streak(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = days.withColumn("rn", F.row_number().over(w))
    islands = (
        ranked.withColumn("anchor", F.expr("date_sub(d, rn)"))
        .groupBy("user_id", "anchor")
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min("d").alias("streak_start"),
        )
    )
    wbest = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), "streak_start"
    )
    return (
        islands.withColumn("pick", F.row_number().over(wbest))
        .filter(F.col("pick") == 1)
        .select(
            "user_id",
            F.col("streak_len").cast("bigint").alias("longest_streak_days"),
            "streak_start",
        )
    )


# --- new_vs_returning_daily: acquisition split -------------------------------
# Per day: users active for the FIRST time vs returning — the standard
# acquisition report.  First-seen day via window MIN on the user exchange
# (no self-join), then one day-grain rollup.

_NVR_ORACLE = """
WITH seen AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
    CAST(MIN(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id) AS DATE)
      AS first_day
  FROM events
), daily AS (
  SELECT DISTINCT user_id, d, first_day FROM seen
)
SELECT d AS activity_day,
  CAST(COUNT(*) FILTER (WHERE d = first_day) AS BIGINT) AS n_new_users,
  CAST(COUNT(*) FILTER (WHERE d > first_day) AS BIGINT) AS n_returning_users
FROM daily
GROUP BY d
"""


@query(
    "new_vs_returning_daily", oracle=_NVR_ORACLE, tags=("product", "cohort")
)
def new_vs_returning_daily(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    seen = e.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.min("ts").over(wp).cast("date").alias("first_day"),
    ).distinct()
    return seen.groupBy(F.col("d").alias("activity_day")).agg(
        F.count(F.when(F.col("d") == F.col("first_day"), 1))
        .cast("bigint")
        .alias("n_new_users"),
        F.count(F.when(F.col("d") > F.col("first_day"), 1))
        .cast("bigint")
        .alias("n_returning_users"),
    )


# --- weekly_seasonality_matrix: dow × hour activity profile ------------------
# The seasonality heatmap (day-of-week × hour-of-day counts + exact ppm
# share per event_type).  Day-of-week comes from EPOCH-DAY arithmetic —
# (days-since-1970 + 3) % 7, Monday = 0 — because the engines' native dow
# functions disagree on week start (Spark dayofweek: Sunday=1; DuckDB
# dayofweek: Sunday=0); integer epoch math is convention-free.  One
# partial-aggregated shuffle on a 7×24×|types| grid.

_SEAS_ORACLE = """
WITH base AS (
  SELECT event_type,
    (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 AS dow,
    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr
  FROM events
), cells AS (
  SELECT event_type, dow, hr, COUNT(*) AS n FROM base GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, SUM(n) AS total FROM cells GROUP BY 1
)
SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, c.hr,
  CAST(c.n AS BIGINT) AS n_events,
  CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm
FROM cells c JOIN tot t ON t.event_type = c.event_type
"""


@query(
    "weekly_seasonality_matrix",
    oracle=_SEAS_ORACLE,
    tags=("product", "seasonality"),
)
def weekly_seasonality_matrix(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    cells = (
        e.select(
            "event_type",
            F.expr(
                "(datediff(cast(ts as date), DATE '1970-01-01') + 3) % 7"
            ).alias("dow"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .groupBy("event_type", "dow", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-type total as a window over the tiny cell grid (no re-scan)
    return cells.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "hr",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr(
            "cast(n * 1000000 div (sum(n) over (partition by event_type))"
            " as bigint)"
        ).alias("share_ppm"),
    )


# --- pareto_value_share: top-decile concentration ----------------------------
# "The top 10% of users drive X% of value" — exact-rank decile assignment
# (ceil-rank, no percentile interpolation) over per-user value totals,
# then integer ppm shares.  Two aggregations: a user rollup on the user
# exchange, then a 10-row decile rollup.  The global rank runs over the
# PER-USER rollup (cardinality = users, orders of magnitude below the
# fact table) — the same exact-rank shape as rfm_segments; entity counts
# beyond single-node sort are where the sketch quantiles take over.

_PARETO_ORACLE = """
WITH per_user AS (
  SELECT user_id, SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY user_id
), ranked AS (
  SELECT cents,
    ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS rn,
    COUNT(*) OVER () AS n_users
  FROM per_user
), deciles AS (
  SELECT ((rn - 1) * 10) // n_users AS decile, cents FROM ranked
), tot AS (SELECT SUM(cents) AS total FROM per_user)
SELECT CAST(d.decile AS BIGINT) AS decile,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(d.cents) AS BIGINT) AS decile_cents,
  CAST(SUM(d.cents) * 1000000 // t.total AS BIGINT) AS share_ppm
FROM deciles d CROSS JOIN tot t
GROUP BY d.decile, t.total
"""


@query("pareto_value_share", oracle=_PARETO_ORACLE, tags=("product", "pareto"))
def pareto_value_share(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr("sum(cast(floor(value * 100 + 0.5) as bigint))").alias("cents")
    )
    # the grand total rides the SAME single-partition window pass as the
    # global rank — a separate agg-then-crossJoin re-executed the whole
    # per_user lineage (two scans, 5 exchanges → 3; VERDICT r6 next-8)
    w = Window.orderBy(F.col("cents").desc(), "user_id")
    ranked = per_user.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_users"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    deciles = ranked.select(
        F.expr("((rn - 1) * 10) div n_users").alias("decile"),
        "cents",
        "total",
    )
    return (
        deciles.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("cents").cast("bigint").alias("decile_cents"),
            F.max("total").alias("total"),
        )
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_users",
            "decile_cents",
            F.expr("cast(decile_cents * 1000000 div total as bigint)").alias(
                "share_ppm"
            ),
        )
    )


# --- ab_test_uplift: deterministic experiment readout ------------------------
# The experimentation primitive: users assigned to control/treatment by an
# md5 bucket of user_id (the engine's standard deterministic split —
# stable across runs/engines/partitionings, unlike randomSplit), then the
# purchase-conversion readout with exact counts: per-arm converters,
# conversion ppm, uplift ppm, plus the sample-ratio check (assignment
# counts should split ~50/50; a skewed ratio invalidates the experiment
# before any uplift reading).  All integer until the final ppm divisions.

from zeta_etl_spark.functions.text import duck_hex2long as _dh
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

_AB_ORACLE = f"""
WITH users AS (
  SELECT user_id,
    CASE WHEN {_dh("concat('ab1:', CAST(user_id AS VARCHAR))", digits=8)} % 2 = 0
         THEN 'control' ELSE 'treatment' END AS arm,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), arms AS (
  SELECT arm, COUNT(*) AS n_users, SUM(converted) AS n_converted
  FROM users GROUP BY arm
)
SELECT a.arm, CAST(a.n_users AS BIGINT) AS n_users,
  CAST(a.n_converted AS BIGINT) AS n_converted,
  CAST(a.n_converted * 1000000 // a.n_users AS BIGINT) AS conversion_ppm,
  CAST(a.n_users * 1000000 // t.total_users AS BIGINT) AS assignment_ppm
FROM arms a CROSS JOIN (SELECT SUM(n_users) AS total_users FROM arms) t
"""


@query("ab_test_uplift", oracle=_AB_ORACLE, tags=("product", "experiment"))
def ab_test_uplift(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_hex2long

    e = T(spark, sf_dir, "events")
    h = spark_hex2long("concat('ab1:', cast(user_id as string))", digits=8)
    arm = F.expr(f"if(({h}) % 2 = 0, 'control', 'treatment')")
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    tot = arms.agg(F.sum("n_users").alias("total_users"))
    return arms.transform(with_scalar_frame(tot)).select(
        "arm",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        F.expr("cast(n_converted * 1000000 div n_users as bigint)").alias(
            "conversion_ppm"
        ),
        F.expr("cast(n_users * 1000000 div total_users as bigint)").alias(
            "assignment_ppm"
        ),
    )


# --- attribution_support_histogram: multi-touch attribution shape ------------
# For every purchase, how many clicks support it inside the 1-hour
# lookback (the denominator linear multi-touch attribution divides credit
# by)?  Reported as a histogram over support counts, with 0 = unattributed
# purchases — the marketing-science readout that decides whether
# last-touch vs linear even differ on this corpus.  The per-purchase
# support count is a RANGE frame over epoch seconds (value-range window,
# not rows), conditional on type — one user_id exchange, then a tiny
# histogram rollup.

_ATTR_ORACLE = """
WITH base AS (
  SELECT user_id, event_type,
    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
              CAST(ts AS TIMESTAMP)) AS ep
  FROM events
), support AS (
  SELECT user_id, event_type,
    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER (
      PARTITION BY user_id ORDER BY ep
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_window_clicks
  FROM base
)
SELECT CAST(n_window_clicks AS BIGINT) AS n_supporting_clicks,
  CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM support
WHERE event_type = 'purchase'
GROUP BY n_window_clicks
"""


@query(
    "attribution_support_histogram",
    oracle=_ATTR_ORACLE,
    tags=("product", "attribution", "W2"),
)
def attribution_support_histogram(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    base = e.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-3600, Window.currentRow)
    )
    # output keeps only purchase rows, where a self-click correction is
    # identically zero — the RANGE count alone is the support count
    support = base.select(
        "event_type",
        F.count(F.when(F.col("event_type") == "click", 1))
        .over(w)
        .alias("n_supporting_clicks"),
    )
    return (
        support.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("n_supporting_clicks").cast("bigint").alias(
            "n_supporting_clicks"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    )


# --- reactivation_counts: returns after dormancy -----------------------------
# How often does each user come back after ≥7 dormant days?  lag on the
# distinct-day series, datediff ≥ 7 counts a reactivation — the
# growth-loop metric paired with longest_active_streak (same day rollup,
# same single exchange).

_REACT_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), gaps AS (
  SELECT user_id,
    date_diff('day', lag(d) OVER (PARTITION BY user_id ORDER BY d), d) AS gap
  FROM days
)
SELECT user_id,
  CAST(COUNT(CASE WHEN gap >= 7 THEN 1 END) AS BIGINT) AS n_reactivations,
  CAST(MAX(gap) AS BIGINT) AS longest_dormancy_days
FROM gaps
GROUP BY user_id
"""


@query(
    "reactivation_counts", oracle=_REACT_ORACLE, tags=("product", "retention")
)
def reactivation_counts(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    gaps = days.select(
        "user_id",
        F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.when(F.col("gap") >= 7, 1))
        .cast("bigint")
        .alias("n_reactivations"),
        F.max("gap").cast("bigint").alias("longest_dormancy_days"),
    )


# --- time_to_conversion_curve: survival-style TTC distribution ---------------
# For each day-offset k: how many users converted (first purchase) within
# k days of their first activity, cumulatively, plus the never-converted
# (right-censored) population — the Kaplan-Meier readout with no
# mid-window censoring (every user is observed over the full corpus
# window).  Pure integer day arithmetic on the per-user rollup; the
# cumulative sum runs over the tiny offset frame.

_TTC_ORACLE = """
WITH per_user AS (
  SELECT user_id,
    MIN(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        AS BIGINT)) AS first_day,
    MIN(CASE WHEN event_type = 'purchase'
        THEN CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
             AS BIGINT) END) AS first_purchase_day
  FROM events GROUP BY user_id
), offsets AS (
  SELECT first_purchase_day - first_day AS ttc_days FROM per_user
  WHERE first_purchase_day IS NOT NULL
), tot AS (
  SELECT COUNT(*) AS n_users,
    COUNT(*) - (SELECT COUNT(*) FROM offsets) AS n_censored
  FROM per_user
), hist AS (
  SELECT ttc_days, COUNT(*) AS n_converted FROM offsets GROUP BY ttc_days
)
SELECT CAST(h.ttc_days AS BIGINT) AS ttc_days,
  CAST(h.n_converted AS BIGINT) AS n_converted,
  CAST(SUM(h.n_converted) OVER (ORDER BY h.ttc_days) AS BIGINT)
    AS cum_converted,
  CAST(t.n_users AS BIGINT) AS n_users,
  CAST(t.n_censored AS BIGINT) AS n_never_converted,
  CAST(SUM(h.n_converted) OVER (ORDER BY h.ttc_days) * 1000000
       // t.n_users AS BIGINT) AS cum_conversion_ppm
FROM hist h CROSS JOIN tot t
"""


@query(
    "time_to_conversion_curve", oracle=_TTC_ORACLE, tags=("product", "survival")
)
def time_to_conversion_curve(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("first_purchase_day"),
    )
    offsets = per_user.filter(F.col("first_purchase_day").isNotNull()).select(
        (F.col("first_purchase_day") - F.col("first_day")).alias("ttc_days")
    )
    hist = offsets.groupBy("ttc_days").agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(
            F.when(F.col("first_purchase_day").isNull(), 1)
        ).alias("n_never_converted"),
    )
    w = Window.orderBy("ttc_days")  # offset frame is tiny — global is free
    return (
        hist.withColumn("cum_converted", F.sum("n_converted").over(w))
        .transform(with_scalar_frame(tot))
        .select(
            F.col("ttc_days").cast("bigint").alias("ttc_days"),
            F.col("n_converted").cast("bigint").alias("n_converted"),
            F.col("cum_converted").cast("bigint").alias("cum_converted"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("n_never_converted").cast("bigint").alias(
                "n_never_converted"
            ),
            F.expr(
                "cast(cum_converted * 1000000 div n_users as bigint)"
            ).alias("cum_conversion_ppm"),
        )
    )


# --- daily_mix_shift: revenue-mix monitor ------------------------------------
# Per (day, event_type): the type's share of that day's value in exact ppm
# plus the day-over-day share delta (lag on the same small frame) — the
# mix-shift monitor that catches a traffic composition change before any
# total moves.  Day totals are integer cents; shares integer ppm; the lag
# runs over the days×types frame.

_MIX_ORACLE = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS d, event_type,
    SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
), shares AS (
  SELECT d, event_type, cents,
    cents * 1000000 // SUM(cents) OVER (PARTITION BY d) AS share_ppm
  FROM cells
)
SELECT d AS day, event_type,
  CAST(cents AS BIGINT) AS cents,
  CAST(share_ppm AS BIGINT) AS share_ppm,
  CAST(share_ppm - lag(share_ppm) OVER (
    PARTITION BY event_type ORDER BY d) AS BIGINT) AS share_delta_ppm
FROM shares
"""


@query("daily_mix_shift", oracle=_MIX_ORACLE, tags=("product", "mix"))
def daily_mix_shift(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.expr("sum(cast(floor(value * 100 + 0.5) as bigint))").alias("cents")
    )
    shares = cells.select(
        "day",
        "event_type",
        F.col("cents").cast("bigint").alias("cents"),
        F.expr(
            "cast(cents * 1000000 div (sum(cents) over (partition by day))"
            " as bigint)"
        ).alias("share_ppm"),
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    return shares.withColumn(
        "share_delta_ppm",
        (F.col("share_ppm") - F.lag("share_ppm").over(wlag)).cast("bigint"),
    )
