"""Frontier batch 9 (round 8, session 3): exact weighted quantiles,
weight-proportional sampling, and concentration-bound gating —

- ``weighted_median_order_value``: exact weighted median + quartiles of
  line price weighted by quantity, per order priority.  The running
  frames ride the (priority, cents) GRAIN — bounded by the price domain,
  never the fact row count — after one hash agg.
- ``systematic_weighted_sample``: deterministic weight-proportional
  systematic sampling (the PPS export step of a curation pipeline):
  K midpoint thresholds over the cumulative n_chars weight; a doc is
  selected iff its cumulative-weight interval covers a threshold.
  Threshold membership is pure integer arithmetic —
  count(thresholds <= x) = ((2K*x) div W + 1) div 2 — so both engines
  agree bit-for-bit.  The cumulative weight is two-level (per-source
  offsets + within-source running sum) so no single task sorts the
  corpus.
- ``hoeffding_rate_gate``: per-source short-doc rate gated against the
  global rate with the Hoeffding concentration bound eps =
  sqrt(L / 2n), L = ln(2/0.05) precomputed as a Python literal — the
  sample-size-aware version of a fixed-threshold quality gate (small
  sources need bigger deviations to alarm).  No engine evaluates a log.
- ``jaccard_event_type_overlap``: user-set Jaccard similarity between
  every event-type pair — |types|^2/2 output rows from one fact scan +
  one bounded per-user type-set explode (set sizes <= |types|).

Scale notes: every aggregate is exact-integer; the only sorts are on
bounded grains (price cents, |sources|, |types|^2).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query

# --- weighted_median_order_value --------------------------------------------
# Lower weighted quantiles: q_p = min cents with cumw * q_den >= q_num * W.

_WMED_ORACLE = """
WITH g AS (
  SELECT o.o_orderpriority AS priority,
    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), r AS (
  SELECT priority, cents, w,
    CAST(SUM(w) OVER (PARTITION BY priority ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
    CAST(SUM(w) OVER (PARTITION BY priority) AS BIGINT) AS tw
  FROM g
)
SELECT priority,
  MIN(CASE WHEN cumw * 4 >= tw THEN cents END) AS p25_cents,
  MIN(CASE WHEN cumw * 2 >= tw THEN cents END) AS median_cents,
  MIN(CASE WHEN cumw * 4 >= tw * 3 THEN cents END) AS p75_cents,
  MAX(tw) AS total_weight
FROM r GROUP BY priority
"""


@query(
    "weighted_median_order_value",
    oracle=_WMED_ORACLE,
    tags=("aggregation", "quantiles", "weighted"),
)
def weighted_median_order_value(spark, sf_dir):
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    g = (
        li.join(
            o.select("o_orderkey", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
            ).alias("cents"),
        )
        .agg(F.expr("cast(sum(cast(l_quantity as bigint)) as bigint)").alias("w"))
    )
    run = (
        Window.partitionBy("priority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = g.select(
        "priority",
        "cents",
        "w",
        F.sum("w").over(run).cast("bigint").alias("cumw"),
        F.sum("w")
        .over(Window.partitionBy("priority"))
        .cast("bigint")
        .alias("tw"),
    )
    return r.groupBy("priority").agg(
        F.min(F.when(F.expr("cumw * 4 >= tw"), F.col("cents"))).alias(
            "p25_cents"
        ),
        F.min(F.when(F.expr("cumw * 2 >= tw"), F.col("cents"))).alias(
            "median_cents"
        ),
        F.min(F.when(F.expr("cumw * 4 >= tw * 3"), F.col("cents"))).alias(
            "p75_cents"
        ),
        F.max("tw").alias("total_weight"),
    )


# --- systematic_weighted_sample ---------------------------------------------

_SWS_K = 20

_SWS_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt FROM documents
), r AS (
  SELECT doc_id, source, wt,
    CAST(SUM(wt) OVER (ORDER BY source, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
    CAST(SUM(wt) OVER () AS BIGINT) AS tot
  FROM w
), s AS (
  SELECT doc_id, source, wt, cw, tot,
    (((2 * {_SWS_K} * cw) // tot + 1) // 2)
      - (((2 * {_SWS_K} * (cw - wt)) // tot + 1) // 2) AS n_hits
  FROM r
)
SELECT doc_id, source, wt AS weight, cw AS cum_weight,
  CAST(n_hits AS BIGINT) AS n_thresholds_hit
FROM s WHERE n_hits > 0
"""


@query(
    "systematic_weighted_sample",
    oracle=_SWS_ORACLE,
    tags=("sampling", "curation", "weighted"),
)
def systematic_weighted_sample(spark, sf_dir):
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "source", F.expr("cast(n_chars as bigint)").alias("wt")
    )
    # two-level cumulative weight over the (source, doc_id) total order:
    # within-source running sums (partitioned sort) + bounded per-source
    # offsets — no single task ever sorts the corpus
    per_src = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = w.select(
        "doc_id",
        "source",
        "wt",
        F.sum("wt").over(per_src).cast("bigint").alias("lcw"),
    )
    offs = (
        w.groupBy("source")
        .agg(F.sum("wt").cast("bigint").alias("stot"))
        .select(
            "source",
            F.expr(
                "cast(coalesce(sum(stot) over (order by source "
                "rows between unbounded preceding and 1 preceding), 0) "
                "as bigint)"
            ).alias("off"),
            F.expr(
                "cast(sum(stot) over (rows between unbounded preceding "
                "and unbounded following) as bigint)"
            ).alias("tot"),
        )
    )
    r = local.join(F.broadcast(offs), "source").select(
        "doc_id",
        "source",
        "wt",
        (F.col("lcw") + F.col("off")).alias("cw"),
        "tot",
    )
    s = r.select(
        "doc_id",
        "source",
        "wt",
        "cw",
        F.expr(
            f"(((2 * {_SWS_K} * cw) div tot + 1) div 2) "
            f"- (((2 * {_SWS_K} * (cw - wt)) div tot + 1) div 2)"
        ).alias("n_hits"),
    )
    return s.filter(F.col("n_hits") > 0).select(
        "doc_id",
        "source",
        F.col("wt").alias("weight"),
        F.col("cw").alias("cum_weight"),
        F.col("n_hits").cast("bigint").alias("n_thresholds_hit"),
    )


# --- hoeffding_rate_gate -----------------------------------------------------

_HOEFF_L = math.log(2.0 / 0.05)  # ln(2/delta), delta = 0.05 — Python literal

_HOEFF_ORACLE = f"""
WITH s AS (
  SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS short
  FROM documents GROUP BY 1
), g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(short) AS BIGINT) AS gshort
  FROM s
)
SELECT s.source, s.n,
  (s.short * 1000000) // s.n AS rate_ppm,
  (g.gshort * 1000000) // g.gn AS global_rate_ppm,
  CAST(floor(sqrt({_HOEFF_L!r} / (2.0 * CAST(s.n AS DOUBLE))) * 1000000
    + 0.5) AS BIGINT) AS eps_ppm,
  CAST(CASE WHEN CAST(s.short AS DOUBLE) / CAST(s.n AS DOUBLE)
         - CAST(g.gshort AS DOUBLE) / CAST(g.gn AS DOUBLE)
         > sqrt({_HOEFF_L!r} / (2.0 * CAST(s.n AS DOUBLE)))
       THEN 1 ELSE 0 END AS BIGINT) AS is_flagged
FROM s CROSS JOIN g
"""


@query(
    "hoeffding_rate_gate",
    oracle=_HOEFF_ORACLE,
    tags=("quality", "statistics", "gating"),
)
def hoeffding_rate_gate(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    d = T(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0))
        .cast("bigint")
        .alias("short"),
    )
    s = s.localCheckpoint()  # source grain feeds the global scalar + rows
    g = s.agg(
        F.sum("n").cast("bigint").alias("gn"),
        F.sum("short").cast("bigint").alias("gshort"),
    )
    return scalar_frame_crossjoin(s, g).select(
        "source",
        "n",
        F.expr("(short * 1000000) div n").alias("rate_ppm"),
        F.expr("(gshort * 1000000) div gn").alias("global_rate_ppm"),
        F.expr(
            f"cast(floor(sqrt({_HOEFF_L!r} / (2.0 * cast(n as double))) "
            "* 1000000 + 0.5) as bigint)"
        ).alias("eps_ppm"),
        F.expr(
            "cast(case when cast(short as double) / cast(n as double) "
            "- cast(gshort as double) / cast(gn as double) "
            f"> sqrt({_HOEFF_L!r} / (2.0 * cast(n as double))) "
            "then 1 else 0 end as bigint)"
        ).alias("is_flagged"),
    )


# --- jaccard_event_type_overlap ---------------------------------------------

_JACC_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sz AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ut GROUP BY 1
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_both,
  sa.n_users AS n_a, sb.n_users AS n_b,
  (i.n_both * 1000000) // (sa.n_users + sb.n_users - i.n_both)
    AS jaccard_ppm
FROM inter i
JOIN sz sa ON sa.event_type = i.type_a
JOIN sz sb ON sb.event_type = i.type_b
"""


@query(
    "jaccard_event_type_overlap",
    oracle=_JACC_ORACLE,
    tags=("set-similarity", "aggregation"),
)
def jaccard_event_type_overlap(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    ut = ut.localCheckpoint()  # feeds sizes + the within-user pair join
    sz = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    inter = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(
                sz.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_users").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                sz.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_users").alias("n_b"),
                )
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "(n_both * 1000000) div (n_a + n_b - n_both)"
            ).alias("jaccard_ppm"),
        )
    )
