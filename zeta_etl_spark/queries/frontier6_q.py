"""Frontier batch 5 (round 8): monitoring / survival / drift / clustering —

- ``cusum_changepoint``: one-sided CUSUM change-point detection over daily
  order revenue.  The recursive ``S_t = max(0, S_{t-1} + y_t)`` is NOT a
  window frame, but it has a closed form over running frames:
  ``S_t = P_t - min(0, min_{j<=t} P_j)`` where P is the prefix sum of the
  mean-centered series — two O(n) running frames, one sort shuffle.
- ``survival_km_curve``: Kaplan-Meier-style life table for time-to-first-
  purchase with right-censoring at last-seen, plus the Nelson-Aalen
  cumulative hazard.  All-integer (hazard in ppm), so the curve is
  bit-identical in both engines — no ln/exp (libm results are not
  IEEE-pinned across engines; the repo determinism rule allows only
  +,-,*,/,sqrt on doubles).
- ``source_token_drift``: per-source token-distribution drift vs the global
  corpus — total-variation distance from exact cross-multiplied integer
  numerators (|cnt_s*tot_g - cnt_g*tot_s|), one final IEEE-exact double
  division; plus the argmax drifted token (exact integer argmax).
- ``benford_digit_audit``: first-significant-digit distribution of order
  totals vs Benford's law.  Expected ppm are Python-precomputed literals
  (log tables must not be evaluated by either engine), observed ppm is
  exact integer division.
- ``kmeans_update_step``: one distributed Lloyd iteration — assign every
  embedding to its nearest seed centroid (exact scaled-int L2), emit the
  per-cluster per-dim re-estimated centroid (exact integer sums, one
  final exact double division).  The iterative-algorithm step shape:
  broadcast K seeds, one scan, one (cluster, dim) agg.

Scale notes: cusum/survival sort on a day grain (|days| rows after the
pre-agg — tiny at any corpus size); drift shuffles once on token then once
on source; kmeans is a broadcast-join scan plus a 512-group agg.  Nothing
here is quadratic in the fact tables.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_tokens, spark_tokens
from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin
from zeta_etl_spark.queries.registry import T, query

# --- cusum_changepoint --------------------------------------------------------
# Daily revenue cents, mean-centered; one-sided positive CUSUM with the
# prefix-sum/running-min identity; alarm when the statistic exceeds
# 3x the global daily mean.  Exact BIGINT end to end.

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1
), mu AS (
  SELECT CAST(SUM(cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mu
  FROM daily
), p AS (
  SELECT day, cents,
    CAST(SUM(cents - (SELECT mu FROM mu)) OVER
      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS pre
  FROM daily
), s AS (
  SELECT day, cents, pre,
    pre - LEAST(0, MIN(pre) OVER
      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      AS cusum
  FROM p
)
SELECT day, cents AS daily_cents, CAST(cusum AS BIGINT) AS cusum_cents,
  CAST(CASE WHEN cusum > 3 * (SELECT mu FROM mu) THEN 1 ELSE 0 END
    AS BIGINT) AS is_alarm
FROM s
"""


@query(
    "cusum_changepoint",
    oracle=_CUSUM_ORACLE,
    tags=("window", "changepoint", "monitoring"),
)
def cusum_changepoint(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    # day-grain frame (tiny at any fact size) feeds both the scalar mean
    # and the main branch — materialize once so the fact scans ONCE
    daily = daily.localCheckpoint()
    mu = daily.agg(
        F.expr(
            "cast(sum(cents) as bigint) div cast(count(*) as bigint)"
        ).alias("mu")
    )
    # |days| rows after the pre-agg: the running frames sort a tiny,
    # fact-size-independent series (single partition is correct here)
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = scalar_frame_crossjoin(daily, mu).withColumn(
        "pre", F.sum(F.col("cents") - F.col("mu")).over(run).cast("bigint")
    )
    s = p.withColumn(
        "cusum", F.col("pre") - F.least(F.lit(0), F.min("pre").over(run))
    )
    return s.select(
        "day",
        F.col("cents").alias("daily_cents"),
        F.col("cusum").cast("bigint").alias("cusum_cents"),
        F.when(F.col("cusum") > 3 * F.col("mu"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_alarm"),
    )


# --- survival_km_curve --------------------------------------------------------
# Life table for time-to-first-purchase per user: birth = first event,
# event = first purchase, censor = last-seen for never-purchasers.
# n_at_risk descends by the (events + censored) leaving at each prior
# duration; hazard_ppm = 1e6 * d_i // n_i exact; cumhaz_ppm is the
# Nelson-Aalen cumulative hazard (an exact BIGINT running sum).

_KM_ORACLE = """
WITH u AS (
  SELECT user_id,
    MIN(CAST(ts AS DATE)) AS birth,
    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
      AS conv,
    MAX(CAST(ts AS DATE)) AS last_seen
  FROM events GROUP BY user_id
), d AS (
  SELECT user_id,
    CASE WHEN conv IS NOT NULL THEN date_diff('day', birth, conv)
         ELSE date_diff('day', birth, last_seen) END AS dur,
    CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
), g AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_i,
    CAST(SUM(1 - ev) AS BIGINT) AS c_i
  FROM d GROUP BY dur
), r AS (
  SELECT dur, d_i, c_i,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM d)
      - CAST(COALESCE(SUM(d_i + c_i) OVER
          (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) AS BIGINT) AS n_at_risk
  FROM g
)
SELECT CAST(dur AS BIGINT) AS duration_days, n_at_risk,
  d_i AS n_events, c_i AS n_censored,
  CAST((1000000 * d_i) // n_at_risk AS BIGINT) AS hazard_ppm,
  CAST(SUM((1000000 * d_i) // n_at_risk) OVER
    (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS BIGINT) AS cumhaz_ppm
FROM r
"""


@query(
    "survival_km_curve",
    oracle=_KM_ORACLE,
    tags=("agg", "survival", "lifecycle"),
)
def survival_km_curve(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("birth"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts").cast("date")
            )
        ).alias("conv"),
        F.max(F.col("ts").cast("date")).alias("last_seen"),
    )
    d = u.select(
        F.when(
            F.col("conv").isNotNull(),
            F.datediff(F.col("conv"), F.col("birth")),
        )
        .otherwise(F.datediff(F.col("last_seen"), F.col("birth")))
        .alias("dur"),
        F.when(F.col("conv").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    g = d.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d_i"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c_i"),
    )
    # duration-grain frame (tiny) feeds both the total and the life table;
    # total = sum(d_i + c_i) over it, so the fact scans ONCE
    g = g.localCheckpoint()
    total = g.agg(
        F.sum(F.col("d_i") + F.col("c_i")).cast("bigint").alias("total")
    )
    prior = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    run = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    # duration-day grain: |rows| independent of fact size — safe to sort
    r = scalar_frame_crossjoin(g, total).withColumn(
        "n_at_risk",
        F.col("total")
        - F.coalesce(
            F.sum(F.col("d_i") + F.col("c_i")).over(prior), F.lit(0)
        ).cast("bigint"),
    )
    hz = F.expr("(1000000 * d_i) div n_at_risk")
    return r.select(
        F.col("dur").cast("bigint").alias("duration_days"),
        "n_at_risk",
        F.col("d_i").alias("n_events"),
        F.col("c_i").alias("n_censored"),
        hz.cast("bigint").alias("hazard_ppm"),
        F.sum(hz).over(run).cast("bigint").alias("cumhaz_ppm"),
    )


# --- source_token_drift -------------------------------------------------------
# Per source s and token t: p_t = cnt_st/tot_s, q_t = cnt_gt/tot_g.  The
# total-variation distance  TV = (1/2) * sum_t |p_t - q_t|  is computed
# from the exact integer numerator |cnt_st*tot_g - cnt_gt*tot_s| (fits
# BIGINT: counts and totals are both <= corpus tokens), with ONE double
# division at the end (IEEE-exact).  Tokens absent from a source still
# contribute q_t to its TV — handled by summing present-token numerators
# and adding (tot_g - sum of cnt_gt over the source's present tokens)
# * tot_s for the absent mass, all integers.

_DRIFT_ORACLE = f"""
WITH tok AS (
  SELECT source, UNNEST({duck_tokens()}) AS token FROM documents
), st AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt_st
  FROM tok GROUP BY source, token
), gt AS (
  SELECT token, CAST(SUM(cnt_st) AS BIGINT) AS cnt_gt FROM st GROUP BY token
), tots AS (
  SELECT CAST(SUM(cnt_gt) AS BIGINT) AS tot_g FROM gt
), ts AS (
  SELECT source, CAST(SUM(cnt_st) AS BIGINT) AS tot_s FROM st GROUP BY source
), terms AS (
  SELECT st.source,
    st.token,
    abs(st.cnt_st * (SELECT tot_g FROM tots) - gt.cnt_gt * ts.tot_s)
      AS num,
    gt.cnt_gt
  FROM st JOIN gt USING (token) JOIN ts ON ts.source = st.source
), agg AS (
  SELECT source,
    CAST(SUM(num) AS BIGINT) AS present_num,
    CAST(SUM(cnt_gt) AS BIGINT) AS present_gt
  FROM terms GROUP BY source
), top AS (
  SELECT source, token AS top_token FROM (
    SELECT source, token, ROW_NUMBER() OVER
      (PARTITION BY source ORDER BY num DESC, token DESC) AS rn
    FROM terms
  ) WHERE rn = 1
)
SELECT a.source, t.tot_s AS n_tokens,
  CAST(a.present_num
       + ((SELECT tot_g FROM tots) - a.present_gt) * t.tot_s AS DOUBLE)
    / (2.0 * CAST(t.tot_s AS DOUBLE)
           * CAST((SELECT tot_g FROM tots) AS DOUBLE)) AS tv_distance,
  tp.top_token
FROM agg a JOIN ts t ON t.source = a.source
JOIN top tp ON tp.source = a.source
"""


@query(
    "source_token_drift",
    oracle=_DRIFT_ORACLE,
    tags=("text", "drift", "curation"),
)
def source_token_drift(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.expr(spark_tokens())).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_st")
    )
    st = st.localCheckpoint()  # reused by gt, ts, and terms
    gt = st.groupBy("token").agg(
        F.sum("cnt_st").cast("bigint").alias("cnt_gt")
    )
    tots = gt.agg(F.sum("cnt_gt").cast("bigint").alias("tot_g"))
    ts_ = st.groupBy("source").agg(
        F.sum("cnt_st").cast("bigint").alias("tot_s")
    )
    terms = (
        st.join(gt, "token")
        .join(ts_, "source")
        .select(
            "source",
            "token",
            "cnt_gt",
            "tot_s",
            (F.col("cnt_st") * F.lit(1)).alias("cnt_st"),
        )
    )
    terms = scalar_frame_crossjoin(terms, tots).withColumn(
        "num",
        F.abs(
            F.col("cnt_st") * F.col("tot_g")
            - F.col("cnt_gt") * F.col("tot_s")
        ),
    )
    agg = terms.groupBy("source", "tot_s", "tot_g").agg(
        F.sum("num").cast("bigint").alias("present_num"),
        F.sum("cnt_gt").cast("bigint").alias("present_gt"),
        # exact integer argmax with token tie-break, mirrors MAX_BY(.., (num, token))
        F.max(F.struct(F.col("num"), F.col("token"))).alias("mx"),
    )
    return agg.select(
        "source",
        F.col("tot_s").alias("n_tokens"),
        (
            (
                F.col("present_num")
                + (F.col("tot_g") - F.col("present_gt")) * F.col("tot_s")
            ).cast("double")
            / (
                F.lit(2.0)
                * F.col("tot_s").cast("double")
                * F.col("tot_g").cast("double")
            )
        ).alias("tv_distance"),
        F.col("mx.token").alias("top_token"),
    )


# --- benford_digit_audit ------------------------------------------------------
# First significant digit of the order total (cents as a string — exact in
# both engines), observed share in ppm vs the Benford expectation.  The
# expected ppm are PYTHON-precomputed literals: neither engine evaluates a
# log, so the comparison is pure integer arithmetic.

_BENFORD_PPM = {
    d: int(math.floor(math.log10(1 + 1 / d) * 1_000_000 + 0.5))
    for d in range(1, 10)
}

_BENFORD_CASE_SQL = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
)

_BENFORD_ORACLE = f"""
WITH c AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
    AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), g AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders FROM c GROUP BY digit
), t AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM g
)
SELECT digit, n_orders,
  CAST((1000000 * n_orders) // (SELECT total FROM t) AS BIGINT)
    AS observed_ppm,
  CAST(CASE digit {_BENFORD_CASE_SQL} END AS BIGINT) AS benford_ppm,
  CAST(abs((1000000 * n_orders) // (SELECT total FROM t)
           - CASE digit {_BENFORD_CASE_SQL} END) AS BIGINT)
    AS deviation_ppm
FROM g
"""


@query(
    "benford_digit_audit",
    oracle=_BENFORD_ORACLE,
    tags=("agg", "audit", "quality"),
)
def benford_digit_audit(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = o.select(
        F.expr(
            "cast(substr(cast(cast(floor(o_totalprice * 100 + 0.5) as bigint)"
            " as string), 1, 1) as bigint)"
        ).alias("digit")
    )
    g = c.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    g = g.localCheckpoint()  # 9-row digit frame; fact scans once
    t = g.agg(F.sum("n_orders").cast("bigint").alias("total"))
    exp_col = f"cast(case digit {_BENFORD_CASE_SQL} end as bigint)"
    return scalar_frame_crossjoin(g, t).select(
        "digit",
        "n_orders",
        F.expr("cast((1000000 * n_orders) div total as bigint)").alias(
            "observed_ppm"
        ),
        F.expr(exp_col).alias("benford_ppm"),
        F.expr(
            f"cast(abs((1000000 * n_orders) div total - {exp_col}) as bigint)"
        ).alias("deviation_ppm"),
    )


# --- kmeans_update_step -------------------------------------------------------
# One Lloyd iteration: K = 8 seeds (the vectors with vec_id < 8, already
# exact scaled ints), nearest-seed assignment by exact integer L2, then the
# re-estimated per-cluster per-dim centroid (exact integer sums, one
# IEEE-exact double division).  Scale shape: broadcast 8 seeds, one corpus
# scan, one 8x64-group agg — the canonical distributed k-means step.

_KM_K = 8

_KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cluster_id, sv AS cv FROM e WHERE vec_id < {_KM_K}
), ex AS (
  SELECT e.vec_id, CAST(i AS BIGINT) AS dim, e.sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, 65) t(i)
), cx AS (
  SELECT s.cluster_id, CAST(i AS BIGINT) AS dim, s.cv[CAST(i AS INT)] AS cv
  FROM seeds s CROSS JOIN range(1, 65) t(i)
), dists AS (
  SELECT ex.vec_id, cx.cluster_id,
    CAST(SUM((ex.v - cx.cv) * (ex.v - cx.cv)) AS BIGINT) AS dist2
  FROM ex JOIN cx ON ex.dim = cx.dim
  GROUP BY 1, 2
), assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cluster_id) AS rn
    FROM dists
  ) WHERE rn = 1
)
SELECT a.cluster_id, CAST(x.dim AS BIGINT) AS dim,
  CAST(COUNT(*) AS BIGINT) AS n_members,
  CAST(SUM(x.v) AS DOUBLE) / (1000000.0 * COUNT(*)) AS new_centroid
FROM assigned a JOIN ex x ON x.vec_id = a.vec_id
GROUP BY a.cluster_id, x.dim
"""


@query(
    "kmeans_update_step",
    oracle=_KMEANS_ORACLE,
    tags=("vectors", "kmeans", "iterative"),
)
def kmeans_update_step(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select(
        "vec_id", "sv"
    )
    # pack the K seeds into ONE global-agg row (the _packed_centroids
    # shape, operators/vectors.py:207): the broadcast side is provably
    # bounded from the plan, and assignment is a zero-shuffle per-row
    # zip_with argmin inside whole-stage codegen — no K-way row multiply
    packed = (
        emb.where(F.col("vec_id") < _KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cid", "cv"))
            ).alias("cents")
        )
    )
    assigned = emb.transform(with_scalar_frame(packed)).select(
        "vec_id",
        "sv",
        F.expr(
            "array_sort(transform(cents, c -> struct("
            "aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (a, v) -> a + v) AS dist2, c.cid AS cid)))[0].cid"
        ).alias("cluster_id"),
    )
    ex = assigned.select(
        "cluster_id", F.posexplode("sv").alias("dim0", "v")
    ).select(
        "cluster_id", (F.col("dim0") + 1).cast("bigint").alias("dim"), "v"
    )
    return (
        ex.groupBy("cluster_id", "dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            (
                F.sum("v").cast("double")
                / (F.lit(1000000.0) * F.count(F.lit(1)))
            ).alias("new_centroid"),
        )
        .select("cluster_id", "dim", "n_members", "new_centroid")
    )
