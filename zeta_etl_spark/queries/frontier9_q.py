"""Frontier batch 8 (round 8, session 3): privacy, categorical association
and model-calibration operators —

- ``randomized_response_counts``: privatized daily purchase counts via the
  randomized-response mechanism (Warner 1965, the local-DP primitive):
  each event's reported bit is its true bit XOR a deterministic
  md5-derived coin (p_flip = 1/4), and the debiased estimator
  ``2*O - N/2`` inverts the noise in expectation.  The coin is the
  repo-wide md5 hashing rule, so both engines privatize IDENTICALLY —
  the mechanism's plumbing (per-record coin, per-group debias) is what a
  pipeline ships; a production deployment would swap the coin seed
  per-release.
- ``mcnemar_test``: McNemar's chi-squared (continuity-corrected) on the
  paired disagreements of the two document-quality rules from
  ``classifier_eval_kappa`` — the paired-classifier significance test.
  Exact integer rational.
- ``cramers_v``: Cramer's V association strength between customer market
  segment and order priority — a 25-cell contingency chi-squared from
  exact BIGINT counts, doubles only in the identical final expression
  tree (+,-,*,/,sqrt).
- ``calibration_bins``: reliability diagram of a quantity-based return
  'score' — fixed-width score bins (deterministic, unlike ntile-on-ties),
  per-bin observed rate vs mean predicted ppm and the absolute gap (the
  per-bin term of expected calibration error).
- ``degree_assortativity``: Pearson degree-degree correlation over the
  co-purchase graph's directed edge ends (Newman 2002) — are high-degree
  parts co-bought with high-degree parts?  Exact BIGINT moments,
  identical double tree for the correlation.

Scale notes: every query is one fact scan plus dim-sized frames; the
assortativity edge list is the bounded basket-pair graph (work =
sum(|basket|^2)); nothing joins fact-to-fact unkeyed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.queries.registry import T, query

# --- randomized_response_counts ---------------------------------------------
# flip coin: md5(event_id || ':rr') low 2 bits == 0  (p = 1/4)
# reported = true XOR flip; T_hat = (O - N/4) / (1 - 2/4) = 2*O - N/2;
# output milli-units so the estimate stays integral: 2000*O - 500*N.

_RR_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS day,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS truth,
    CASE WHEN ({duck_hex2long("CAST(event_id AS VARCHAR) || ':rr'", 8)}) % 4 = 0
         THEN 1 ELSE 0 END AS flip
  FROM events
), rep AS (
  SELECT day, truth,
    CASE WHEN flip = 1 THEN 1 - truth ELSE truth END AS reported
  FROM base
)
SELECT day,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(truth) AS BIGINT) AS true_purchases,
  CAST(SUM(reported) AS BIGINT) AS observed_purchases,
  CAST(2000 * SUM(reported) - 500 * COUNT(*) AS BIGINT)
    AS debiased_estimate_milli
FROM rep GROUP BY day
"""


@query(
    "randomized_response_counts",
    oracle=_RR_ORACLE,
    tags=("privacy", "local-dp", "aggregation"),
)
def randomized_response_counts(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    base = e.select(
        F.col("ts").cast("date").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "truth"
        ),
        F.when(
            F.expr(
                "("
                + spark_hex2long("concat(cast(event_id as string), ':rr')", 8)
                + ") % 4 = 0"
            ),
            1,
        )
        .otherwise(0)
        .alias("flip"),
    )
    rep = base.select(
        "day",
        "truth",
        F.when(F.col("flip") == 1, 1 - F.col("truth"))
        .otherwise(F.col("truth"))
        .alias("reported"),
    )
    return rep.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("truth").cast("bigint").alias("true_purchases"),
        F.sum("reported").cast("bigint").alias("observed_purchases"),
        F.expr("cast(2000 * sum(reported) - 500 * count(*) as bigint)").alias(
            "debiased_estimate_milli"
        ),
    )


# --- mcnemar_test ------------------------------------------------------------

_MCNEMAR_ORACLE = """
WITH lab AS (
  SELECT
    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pred,
    CASE WHEN len(list_distinct(string_split(text, ' '))) >= 28
         THEN 1 ELSE 0 END AS ref
  FROM documents
), c AS (
  SELECT
    CAST(SUM(pred * (1 - ref)) AS BIGINT) AS b,
    CAST(SUM((1 - pred) * ref) AS BIGINT) AS c
  FROM lab
)
SELECT b AS n_pred_only, c AS n_ref_only,
  CASE WHEN b + c = 0 THEN CAST(0 AS BIGINT)
       ELSE ((abs(b - c) - 1) * (abs(b - c) - 1) * 1000) // (b + c)
  END AS chi2_milli
FROM c
"""


@query(
    "mcnemar_test",
    oracle=_MCNEMAR_ORACLE,
    tags=("statistics", "hypothesis-test", "evaluation"),
)
def mcnemar_test(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    lab = d.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pred"),
        F.when(F.expr("size(array_distinct(split(text, ' ')))") >= 28, 1)
        .otherwise(0)
        .alias("ref"),
    )
    c = lab.agg(
        F.sum(F.expr("pred * (1 - ref)")).cast("bigint").alias("b"),
        F.sum(F.expr("(1 - pred) * ref")).cast("bigint").alias("c"),
    )
    return c.select(
        F.col("b").alias("n_pred_only"),
        F.col("c").alias("n_ref_only"),
        F.when(F.expr("b + c") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                "((abs(b - c) - 1) * (abs(b - c) - 1) * 1000) div (b + c)"
            )
        )
        .alias("chi2_milli"),
    )


# --- cramers_v ---------------------------------------------------------------
# 5x5 contingency (c_mktsegment x o_orderpriority); chi2 from exact cell
# counts, e_ij = row_i * col_j / n in doubles (identical trees);
# V = sqrt(chi2 / (n * min(r-1, c-1))).

_CRAMERS_ORACLE = """
WITH joined AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), cells AS (
  SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM joined GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
    CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
    CAST(COUNT(DISTINCT pri) AS BIGINT) AS c
  FROM cells
), marg AS (
  SELECT cells.seg, cells.pri, cells.cnt,
    CAST(SUM(cnt) OVER (PARTITION BY cells.seg) AS BIGINT) AS row_tot,
    CAST(SUM(cnt) OVER (PARTITION BY cells.pri) AS BIGINT) AS col_tot
  FROM cells
), chi AS (
  SELECT
    SUM(
      (CAST(cnt AS DOUBLE)
       - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
         / CAST(t.n AS DOUBLE))
      * (CAST(cnt AS DOUBLE)
         - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
           / CAST(t.n AS DOUBLE))
      / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
         / CAST(t.n AS DOUBLE))
    ) AS chi2,
    MAX(t.n) AS n, MAX(t.r) AS r, MAX(t.c) AS c
  FROM marg CROSS JOIN tot t
)
SELECT CAST(n AS BIGINT) AS n_orders,
  CAST(floor(chi2 * 1000 + 0.5) AS BIGINT) AS chi2_milli,
  CAST(floor(sqrt(chi2 / (CAST(n AS DOUBLE)
    * CAST(least(r - 1, c - 1) AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)
    AS cramers_v_ppm
FROM chi
"""


@query(
    "cramers_v",
    oracle=_CRAMERS_ORACLE,
    tags=("statistics", "association", "categorical"),
)
def cramers_v(spark, sf_dir):
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    cells = joined.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # 25-cell frame from here on — every window/aggregate below is
    # constant-size regardless of the orders fact
    cells = cells.localCheckpoint()
    marg = cells.select(
        "seg",
        "pri",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("seg")).cast("bigint").alias(
            "row_tot"
        ),
        F.sum("cnt").over(Window.partitionBy("pri")).cast("bigint").alias(
            "col_tot"
        ),
    )
    tot = cells.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.countDistinct("seg").cast("bigint").alias("r"),
        F.countDistinct("pri").cast("bigint").alias("c"),
    )
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    chi = scalar_frame_crossjoin(marg, tot).agg(
        F.sum(
            F.expr(
                "(cast(cnt as double) - cast(row_tot as double) "
                "* cast(col_tot as double) / cast(n as double)) "
                "* (cast(cnt as double) - cast(row_tot as double) "
                "* cast(col_tot as double) / cast(n as double)) "
                "/ (cast(row_tot as double) * cast(col_tot as double) "
                "/ cast(n as double))"
            )
        ).alias("chi2"),
        F.max("n").alias("n"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.expr("cast(floor(chi2 * 1000 + 0.5) as bigint)").alias(
            "chi2_milli"
        ),
        F.expr(
            "cast(floor(sqrt(chi2 / (cast(n as double) "
            "* cast(least(r - 1, c - 1) as double))) * 1000000 + 0.5) "
            "as bigint)"
        ).alias("cramers_v_ppm"),
    )


# --- calibration_bins --------------------------------------------------------
# 'Model': score_ppm = qty * 20000 (qty 1..50 -> 20k..1e6 ppm) predicting
# l_returnflag = 'R'.  Fixed-width bins bin = (qty - 1) div 5 are
# deterministic under ties (ntile is not); per bin: observed rate vs mean
# predicted, and the absolute gap — the reliability-diagram rows.

_CALIB_ORACLE = """
WITH s AS (
  SELECT CAST(l_quantity AS BIGINT) * 20000 AS score_ppm,
    (CAST(l_quantity AS BIGINT) - 1) // 5 AS bin,
    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
)
SELECT bin,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(score_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
    AS mean_score_ppm,
  (CAST(SUM(y) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT)
    AS observed_rate_ppm,
  abs(CAST(SUM(score_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
      - (CAST(SUM(y) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT))
    AS gap_ppm
FROM s GROUP BY bin
"""


@query(
    "calibration_bins",
    oracle=_CALIB_ORACLE,
    tags=("evaluation", "calibration", "ml"),
)
def calibration_bins(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    s = li.select(
        F.expr("cast(l_quantity as bigint) * 20000").alias("score_ppm"),
        F.expr("(cast(l_quantity as bigint) - 1) div 5").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    return s.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "cast(sum(score_ppm) as bigint) div cast(count(*) as bigint)"
        ).alias("mean_score_ppm"),
        F.expr(
            "(cast(sum(y) as bigint) * 1000000) div cast(count(*) as bigint)"
        ).alias("observed_rate_ppm"),
        F.expr(
            "abs(cast(sum(score_ppm) as bigint) div cast(count(*) as bigint)"
            " - (cast(sum(y) as bigint) * 1000000) "
            "div cast(count(*) as bigint))"
        ).alias("gap_ppm"),
    )


# --- degree_assortativity ----------------------------------------------------
# Newman (2002) degree assortativity r over the co-purchase graph: Pearson
# correlation of (deg(u), deg(v)) across DIRECTED edge ends.  Moments are
# exact BIGINTs; products that could exceed int64 at extreme scale happen
# in doubles with identical trees.  By symmetry Sx = Sy and Sxx = Syy.

_ASSORT_ORACLE = """
WITH i AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
), deg AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
  ) t GROUP BY x
), ends AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
  UNION ALL
  SELECT dv.d, du.d
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
    CAST(SUM(dx) AS BIGINT) AS sx,
    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
    CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM ends
)
SELECT m AS n_edge_ends, sx AS sum_deg,
  CAST(floor(
    (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    * 1000000 + 0.5) AS BIGINT) AS assortativity_ppm
FROM mom
"""


@query(
    "degree_assortativity",
    oracle=_ASSORT_ORACLE,
    tags=("graph", "statistics", "basket"),
)
def degree_assortativity(spark, sf_dir):
    from zeta_etl_spark.operators.graph import cobasket_pairs

    li = T(spark, sf_dir, "lineitem")
    # basket pair generation without the self-join (operators/graph.py):
    # same (u < v) pair multiset, one exchange instead of three
    e = (
        cobasket_pairs(
            li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("u", "v")
    )
    e = e.localCheckpoint()  # edge frame feeds degree agg + the end join
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # By the ends symmetry, three of the four moments are functions of the
    # DEGREE table alone: vertex x contributes d(x) directed edge ends, each
    # with dx = d(x), so m = Σd, sx = Σd², sxx = Σd³ — no edge join needed.
    # Only sxy touches edges: Σ_ends dx·dy = Σ_e (du·dv + dv·du) = 2·Σ du·dv,
    # computed in ONE pass over e⋈deg⋈deg instead of the former
    # unionAll-of-two-identical-join-subtrees (which ran both joins twice).
    # Every sum is the same exact-BIGINT total the unioned form produced.
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    paired = (
        e.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
        .select("du", "dv")
    )
    sxy_row = paired.agg(
        (F.lit(2) * F.sum(F.expr("du * dv"))).cast("bigint").alias("sxy")
    )
    mom = scalar_frame_crossjoin(
        deg.agg(
            F.sum("d").cast("bigint").alias("m"),
            F.sum(F.expr("d * d")).cast("bigint").alias("sx"),
            F.sum(F.expr("d * d * d")).cast("bigint").alias("sxx"),
        ),
        sxy_row,
        bound=1,
    )
    return mom.select(
        F.col("m").alias("n_edge_ends"),
        F.col("sx").alias("sum_deg"),
        F.expr(
            "cast(floor((cast(m as double) * cast(sxy as double) "
            "- cast(sx as double) * cast(sx as double)) "
            "/ (cast(m as double) * cast(sxx as double) "
            "- cast(sx as double) * cast(sx as double)) "
            "* 1000000 + 0.5) as bigint)"
        ).alias("assortativity_ppm"),
    )
