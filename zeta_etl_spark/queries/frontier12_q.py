"""Frontier batch 11 (round 8, session 4): experimentation statistics and
corpus/series diagnostics —

- ``bootstrap_mean_ci``: deterministic Poisson(1) cluster bootstrap of the
  per-user mean event value.  Resample weights come from a 60-bit md5
  uniform compared against Python-precomputed Poisson CDF thresholds
  (integer literals — neither engine evaluates exp), so both engines draw
  the SAME 32 resamples; the CI is an exact order statistic of the 32
  resample means.  Resampling is on the USER grain (cluster bootstrap —
  the statistically right unit for user-level metrics), never |events|x32.
- ``permutation_test_diff``: randomization test for the arm difference in
  per-user total value — 32 md5 re-randomizations of the ab1 arm
  assignment, p-value = (1 + #{|diff_b| >= |diff_obs|}) / 33 (the
  add-one Monte-Carlo estimator).  All sums exact integers; the
  comparisons run on single-row-per-resample scalars.
- ``chao1_vocab_richness``: Chao1 species-richness estimate of each
  source's 5-shingle vocabulary (D + F1(F1-1)/(2(F2+1)), bias-corrected)
  — the "how much vocabulary haven't we crawled yet" corpus diagnostic.
  Shingle document frequencies, not raw tokens: the synthetic corpus's
  ~31-token vocabulary has no singletons at any scale (the round-6
  sparse-vector lesson), while the shingle space stays rich.
- ``good_turing_discounts``: Turing discounted frequencies r* =
  (r+1) S(r+1)/S(r) for r = 1..8 from the shingle frequency-of-
  frequencies table — the smoothing table an n-gram LM pipeline derives;
  exact integer ppm (no SGT log-regression, which libm would un-pin).
- ``rolling_origin_backtest``: rolling-origin (walk-forward) evaluation of
  a 7-day moving-average forecaster on the daily revenue series — per
  cutoff day: forecast, actual, absolute error, APE; the day grain is
  bounded by the window, not the fact count.
- ``dispersion_fano_index``: Fano factor (variance-to-mean ratio) of
  daily counts per event type — burstiness vs Poisson; staged integer
  division keeps ppm exact where a direct *1e6 would overflow BIGINT.
- ``cuped_adjusted_uplift``: CUPED variance-reduced experiment readout —
  theta = cov(X,Y)/var(X) from exact integer moments of pre/post-period
  user totals (whole dollars: keeps Sxx inside BIGINT at any user count
  this data model reaches), arm means adjusted as mean(Y_g) - theta *
  (mean(X_g) - mean(X)) (algebraically identical to per-user adjustment,
  but needs NO order-dependent float sum).

Scale notes: every resample/permutation multiplier rides the user or day
grain; token explodes are one-pass and linear; final statistics are
single-row deterministic IEEE scalar expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import (
    duck_hex2long,
    duck_shingles,
    spark_hex2long,
    spark_shingles,
)
from zeta_etl_spark.queries.registry import T, query

# --- bootstrap_mean_ci -------------------------------------------------------

_BOOT_B = 32
_TWO60 = 1 << 60
# Poisson(1) CDF thresholds scaled to the 60-bit hash space; weight =
# #{thresholds <= h} in 0..6 (P(w > 6) < 1e-4 truncated to 6).
_POIS_CDF = [
    math.exp(-1.0) * sum(1.0 / math.factorial(i) for i in range(k + 1))
    for k in range(6)
]
_POIS_T = [int(c * _TWO60) for c in _POIS_CDF]

_BOOT_H = "concat('boot1:', CAST(user_id AS VARCHAR), ':', CAST(b AS VARCHAR))"
_BOOT_H_SPARK = "concat('boot1:', cast(user_id as string), ':', cast(b as string))"


def _boot_oracle() -> str:
    tlist = ",".join(str(t) for t in _POIS_T)
    h = duck_hex2long(_BOOT_H, digits=15)
    return f"""
WITH u AS (
  SELECT user_id,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
    CAST(COUNT(*) AS BIGINT) AS n_ev
  FROM events GROUP BY 1
), w AS (
  SELECT b,
    CAST(list_sum(list_transform([{tlist}],
      t -> CASE WHEN {h} >= t THEN 1 ELSE 0 END)) AS BIGINT) AS wt,
    cents, n_ev
  FROM u CROSS JOIN range(0, {_BOOT_B}) t(b)
), m AS (
  SELECT b, CAST(SUM(wt * cents) AS BIGINT) AS s,
    CAST(SUM(wt * n_ev) AS BIGINT) AS n
  FROM w GROUP BY 1
), means AS (
  SELECT b, s // nullif(n, 0) AS mean_cents FROM m
), ranked AS (
  SELECT mean_cents, ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rn
  FROM means
), point AS (
  SELECT CAST(SUM(cents) AS BIGINT) // CAST(SUM(n_ev) AS BIGINT)
    AS point_mean_cents
  FROM u
)
SELECT p.point_mean_cents,
  CAST(MAX(CASE WHEN rn = 2 THEN mean_cents END) AS BIGINT) AS lo_cents,
  CAST(MAX(CASE WHEN rn = {_BOOT_B - 1} THEN mean_cents END) AS BIGINT)
    AS hi_cents
FROM ranked CROSS JOIN point p
GROUP BY p.point_mean_cents
"""


@query(
    "bootstrap_mean_ci",
    oracle=_boot_oracle(),
    tags=("statistics", "bootstrap", "experiment"),
)
def bootstrap_mean_ci(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    e = T(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    u = u.localCheckpoint()  # user grain feeds 32 resamples + the point est
    tlist = ",".join(f"{t}L" for t in _POIS_T)
    h = spark_hex2long(_BOOT_H_SPARK, digits=15)
    w = u.select(
        "user_id",
        "cents",
        "n_ev",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select(
        "b",
        "cents",
        "n_ev",
        F.expr(
            f"cast(aggregate(array({tlist}), 0, "
            f"(acc, t) -> acc + if(({h}) >= t, 1, 0)) as bigint)"
        ).alias("wt"),
    )
    m = w.groupBy("b").agg(
        F.sum(F.expr("wt * cents")).cast("bigint").alias("s"),
        F.sum(F.expr("wt * n_ev")).cast("bigint").alias("n"),
    )
    ranked = m.select(
        F.expr("s div nullif(n, 0)").alias("mean_cents"),
        F.expr("row_number() over (order by s div nullif(n, 0), b)").alias(
            "rn"
        ),
    )
    ci = ranked.agg(
        F.expr(
            "cast(max(case when rn = 2 then mean_cents end) as bigint)"
        ).alias("lo_cents"),
        F.expr(
            f"cast(max(case when rn = {_BOOT_B - 1} then mean_cents end)"
            " as bigint)"
        ).alias("hi_cents"),
    )
    point = u.agg(
        F.expr(
            "cast(sum(cents) as bigint) div cast(sum(n_ev) as bigint)"
        ).alias("point_mean_cents")
    )
    return scalar_frame_crossjoin(point, ci).select(
        "point_mean_cents", "lo_cents", "hi_cents"
    )


# --- permutation_test_diff ---------------------------------------------------

_PERM_B = 32
_ARM_H = "concat('ab1:', CAST(user_id AS VARCHAR))"
_ARM_H_SPARK = "concat('ab1:', cast(user_id as string))"
_PERM_H = "concat('perm1:', CAST(user_id AS VARCHAR), ':', CAST(b AS VARCHAR))"
_PERM_H_SPARK = (
    "concat('perm1:', cast(user_id as string), ':', cast(b as string))"
)


def _perm_oracle() -> str:
    arm = duck_hex2long(_ARM_H, digits=8)
    ph = duck_hex2long(_PERM_H, digits=8)
    return f"""
WITH u AS (
  SELECT user_id,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), obs AS (
  SELECT
    CAST(SUM(CASE WHEN {arm} % 2 = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN {arm} % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN {arm} % 2 = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
    CAST(SUM(CASE WHEN {arm} % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM u
), perm AS (
  SELECT b,
    CAST(SUM(CASE WHEN {ph} % 2 = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN {ph} % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN {ph} % 2 = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
    CAST(SUM(CASE WHEN {ph} % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM u CROSS JOIN range(0, {_PERM_B}) t(b)
  GROUP BY 1
), od AS (
  SELECT n1 + n0 AS n_users,
    CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS d FROM obs
), pd AS (
  SELECT b, CAST(s1 AS DOUBLE) / nullif(n1, 0)
    - CAST(s0 AS DOUBLE) / nullif(n0, 0) AS d FROM perm
)
SELECT od.n_users,
  CAST(floor(od.d * 1000 + 0.5) AS BIGINT) AS obs_diff_millicents,
  CAST((1 + SUM(CASE WHEN abs(pd.d) >= abs(od.d) THEN 1 ELSE 0 END))
    * 1000 // {_PERM_B + 1} AS BIGINT) AS p_value_permille
FROM pd CROSS JOIN od
GROUP BY od.n_users, od.d
"""


@query(
    "permutation_test_diff",
    oracle=_perm_oracle(),
    tags=("statistics", "experiment", "permutation"),
)
def permutation_test_diff(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    e = T(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    u = u.localCheckpoint()  # user grain feeds observed + 32 permutations
    arm = spark_hex2long(_ARM_H_SPARK, digits=8)
    ph = spark_hex2long(_PERM_H_SPARK, digits=8)
    obs = u.agg(
        F.sum(F.expr(f"case when ({arm}) % 2 = 1 then cents else 0 end"))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.expr(f"case when ({arm}) % 2 = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.expr(f"case when ({arm}) % 2 = 0 then cents else 0 end"))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.expr(f"case when ({arm}) % 2 = 0 then 1 else 0 end"))
        .cast("bigint")
        .alias("n0"),
    )
    od = obs.select(
        (F.col("n1") + F.col("n0")).alias("n_users"),
        F.expr(
            "cast(s1 as double) / n1 - cast(s0 as double) / n0"
        ).alias("d"),
    )
    perm = (
        u.select(
            "user_id",
            "cents",
            F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.sum(F.expr(f"case when ({ph}) % 2 = 1 then cents else 0 end"))
            .cast("bigint")
            .alias("s1"),
            F.sum(F.expr(f"case when ({ph}) % 2 = 1 then 1 else 0 end"))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.expr(f"case when ({ph}) % 2 = 0 then cents else 0 end"))
            .cast("bigint")
            .alias("s0"),
            F.sum(F.expr(f"case when ({ph}) % 2 = 0 then 1 else 0 end"))
            .cast("bigint")
            .alias("n0"),
        )
    )
    pd = perm.select(
        F.expr(
            "cast(s1 as double) / nullif(n1, 0)"
            " - cast(s0 as double) / nullif(n0, 0)"
        ).alias("d")
    )
    return (
        scalar_frame_crossjoin(pd, od.withColumnRenamed("d", "od"))
        .groupBy("n_users", "od")
        .agg(
            F.sum(
                F.expr("case when abs(d) >= abs(od) then 1 else 0 end")
            ).alias("n_extreme")
        )
        .select(
            "n_users",
            F.expr("cast(floor(od * 1000 + 0.5) as bigint)").alias(
                "obs_diff_millicents"
            ),
            F.expr(
                f"cast((1 + n_extreme) * 1000 div {_PERM_B + 1} as bigint)"
            ).alias("p_value_permille"),
        )
    )


# --- chao1_vocab_richness ----------------------------------------------------

_CHAO_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({duck_shingles()}) AS token FROM documents
), freq AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok GROUP BY 1, 2
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS d_observed,
  CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
  CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
  CAST(COUNT(*)
    + (CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
       * (CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) - 1))
      // (2 * (CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) + 1))
    AS BIGINT) AS chao1_estimate
FROM freq GROUP BY 1
"""


@query(
    "chao1_vocab_richness",
    oracle=_CHAO_ORACLE,
    tags=("text", "statistics", "vocabulary"),
)
def chao1_vocab_richness(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.expr(spark_shingles())).alias("token")
    )
    freq = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    return freq.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_observed"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
        F.expr(
            "cast(count(1)"
            " + (cast(sum(case when f = 1 then 1 else 0 end) as bigint)"
            "    * (cast(sum(case when f = 1 then 1 else 0 end) as bigint)"
            "       - 1))"
            "   div (2 * (cast(sum(case when f = 2 then 1 else 0 end)"
            "             as bigint) + 1)) as bigint)"
        ).alias("chao1_estimate"),
    )


# --- good_turing_discounts ---------------------------------------------------

_GT_MAX_R = 8

_GT_ORACLE = f"""
WITH tok AS (
  SELECT unnest({duck_shingles()}) AS token FROM documents
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1
), fof AS (
  SELECT f AS r, CAST(COUNT(*) AS BIGINT) AS s_r FROM freq GROUP BY 1
), led AS (
  SELECT a.r, a.s_r, COALESCE(b.s_r, 0) AS s_r1
  FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
  WHERE a.r <= {_GT_MAX_R}
)
SELECT r, s_r, CAST(s_r1 AS BIGINT) AS s_r1,
  CAST(((r + 1) * s_r1 * 1000000) // s_r AS BIGINT) AS r_star_ppm
FROM led
"""


@query(
    "good_turing_discounts",
    oracle=_GT_ORACLE,
    tags=("text", "statistics", "smoothing"),
)
def good_turing_discounts(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.expr(spark_shingles())).alias("token"))
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    fof = freq.groupBy(F.col("f").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("s_r")
    )
    led = (
        fof.alias("a")
        .join(
            fof.alias("b"),
            F.col("b.r") == F.col("a.r") + 1,
            "left",
        )
        .filter(F.col("a.r") <= _GT_MAX_R)
        .select(
            F.col("a.r").alias("r"),
            F.col("a.s_r").alias("s_r"),
            F.coalesce(F.col("b.s_r"), F.lit(0))
            .cast("bigint")
            .alias("s_r1"),
        )
    )
    return led.select(
        "r",
        "s_r",
        "s_r1",
        F.expr("cast(((r + 1) * s_r1 * 1000000) div s_r as bigint)").alias(
            "r_star_ppm"
        ),
    )


# --- rolling_origin_backtest -------------------------------------------------

_RO_ORACLE = """
WITH daily AS (
  SELECT CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
      date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)
    AS epoch_day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), fc AS (
  SELECT epoch_day, cents,
    CAST(SUM(cents) OVER (ORDER BY epoch_day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7,
    COUNT(*) OVER (ORDER BY epoch_day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS c7
  FROM daily
)
SELECT epoch_day, cents AS actual_cents,
  CAST(s7 // 7 AS BIGINT) AS forecast_cents,
  CAST(abs(cents - s7 // 7) AS BIGINT) AS abs_err_cents,
  CAST((abs(cents - s7 // 7) * 1000) // nullif(cents, 0) AS BIGINT)
    AS ape_permille
FROM fc WHERE c7 = 7
"""


@query(
    "rolling_origin_backtest",
    oracle=_RO_ORACLE,
    tags=("time-series", "forecast", "evaluation"),
)
def rolling_origin_backtest(spark, sf_dir):
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "cast(unix_timestamp(date_trunc('day', ts)) div 86400 as bigint)"
        ).alias("epoch_day")
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("epoch_day").rowsBetween(-7, -1)
    fc = daily.select(
        "epoch_day",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w).alias("c7"),
    )
    return fc.filter(F.col("c7") == 7).select(
        "epoch_day",
        F.col("cents").alias("actual_cents"),
        F.expr("cast(s7 div 7 as bigint)").alias("forecast_cents"),
        F.expr("cast(abs(cents - s7 div 7) as bigint)").alias(
            "abs_err_cents"
        ),
        F.expr(
            "cast((abs(cents - s7 div 7) * 1000) div nullif(cents, 0)"
            " as bigint)"
        ).alias("ape_permille"),
    )


# --- dispersion_fano_index ---------------------------------------------------

_FANO_ORACLE = """
WITH dc AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS ss
  FROM dc GROUP BY 1
)
SELECT event_type, n AS n_days, s AS total_events,
  CAST(((n * ss - s * s) // ((n - 1) * s)) * 1000000
    + (((n * ss - s * s) % ((n - 1) * s)) * 1000000) // ((n - 1) * s)
    AS BIGINT) AS fano_ppm
FROM m WHERE n > 1 AND s > 0
"""


@query(
    "dispersion_fano_index",
    oracle=_FANO_ORACLE,
    tags=("statistics", "time-series", "dispersion"),
)
def dispersion_fano_index(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    dc = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.expr("c * c")).cast("bigint").alias("ss"),
    )
    return m.filter((F.col("n") > 1) & (F.col("s") > 0)).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("total_events"),
        F.expr(
            "cast(((n * ss - s * s) div ((n - 1) * s)) * 1000000"
            " + (((n * ss - s * s) % ((n - 1) * s)) * 1000000)"
            "   div ((n - 1) * s) as bigint)"
        ).alias("fano_ppm"),
    )


# --- cuped_adjusted_uplift ---------------------------------------------------


def _cuped_oracle() -> str:
    arm = duck_hex2long(_ARM_H, digits=8)
    return f"""
WITH d0 AS (
  SELECT MIN(CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
      date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)) AS d0
  FROM events
), u AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN CAST(date_diff('second',
        TIMESTAMP '1970-01-01 00:00:00',
        date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)
        < d0.d0 + 15
      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) // 100
      AS BIGINT) AS x,
    CAST(SUM(CASE WHEN CAST(date_diff('second',
        TIMESTAMP '1970-01-01 00:00:00',
        date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)
        >= d0.d0 + 15
      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) // 100
      AS BIGINT) AS y
  FROM events CROSS JOIN d0 GROUP BY user_id, d0.d0
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM u
), arms AS (
  SELECT CASE WHEN {arm} % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
    CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(x) AS BIGINT) AS sx_g, CAST(SUM(y) AS BIGINT) AS sy_g
  FROM u GROUP BY 1
)
SELECT a.arm, a.n_users,
  CAST(floor(1000.0 * CAST(a.sy_g AS DOUBLE) / a.n_users + 0.5) AS BIGINT)
    AS mean_y_milli,
  CAST(floor(1000.0 * (CAST(a.sy_g AS DOUBLE) / a.n_users
    - ((CAST(g.n AS DOUBLE) * CAST(g.sxy AS DOUBLE)
        - CAST(g.sx AS DOUBLE) * CAST(g.sy AS DOUBLE))
       / nullif(CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE), 0.0))
      * (CAST(a.sx_g AS DOUBLE) / a.n_users
         - CAST(g.sx AS DOUBLE) / g.n)) + 0.5) AS BIGINT)
    AS adj_mean_y_milli
FROM arms a CROSS JOIN g
"""


@query(
    "cuped_adjusted_uplift",
    oracle=_cuped_oracle(),
    tags=("experiment", "statistics", "variance-reduction"),
)
def cuped_adjusted_uplift(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import (
        scalar_frame_crossjoin,
        with_scalar_frame,
    )

    e = T(spark, sf_dir, "events")
    d0 = e.agg(
        F.min(
            F.expr(
                "cast(unix_timestamp(date_trunc('day', ts)) div 86400"
                " as bigint)"
            )
        ).alias("d0")
    )
    day = "cast(unix_timestamp(date_trunc('day', ts)) div 86400 as bigint)"
    u = (
        scalar_frame_crossjoin(e, d0)
        .groupBy("user_id")
        .agg(
            F.expr(
                f"cast(sum(case when ({day}) < d0 + 15 then"
                " cast(floor(value * 100 + 0.5) as bigint) else 0 end)"
                " div 100 as bigint)"
            ).alias("x"),
            F.expr(
                f"cast(sum(case when ({day}) >= d0 + 15 then"
                " cast(floor(value * 100 + 0.5) as bigint) else 0 end)"
                " div 100 as bigint)"
            ).alias("y"),
        )
    )
    u = u.localCheckpoint()  # user grain feeds global moments + arm sums
    g = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
    )
    arm = spark_hex2long(_ARM_H_SPARK, digits=8)
    arms = u.groupBy(
        F.expr(
            f"case when ({arm}) % 2 = 0 then 'control' else 'treatment' end"
        ).alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx_g"),
        F.sum("y").cast("bigint").alias("sy_g"),
    )
    return arms.transform(with_scalar_frame(g)).select(
        "arm",
        "n_users",
        F.expr(
            "cast(floor(1000.0 * cast(sy_g as double) / n_users + 0.5)"
            " as bigint)"
        ).alias("mean_y_milli"),
        F.expr(
            "cast(floor(1000.0 * (cast(sy_g as double) / n_users"
            " - ((cast(n as double) * cast(sxy as double)"
            "     - cast(sx as double) * cast(sy as double))"
            "    / nullif(cast(n as double) * cast(sxx as double)"
            "             - cast(sx as double) * cast(sx as double), 0.0))"
            "   * (cast(sx_g as double) / n_users"
            "      - cast(sx as double) / n)) + 0.5) as bigint)"
        ).alias("adj_mean_y_milli"),
    )
