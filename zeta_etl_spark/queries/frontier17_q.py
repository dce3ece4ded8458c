"""Frontier batch 16 (round 8, session 5): differential privacy via the
geometric mechanism, bounded-graph harmonic centrality, and sampled join
cardinality estimation —

- ``dp_geometric_histogram``: the discrete/geometric mechanism (Ghosh,
  Roughgarden & Sundararajan'09) over the event-type histogram —
  two-sided geometric noise Z = G1 − G2 with G ~ Geom(1/2) (ε = ln 2
  for a count query of sensitivity 1), each G drawn by comparing a
  60-bit md5 uniform against PRE-COMPUTED integer CDF thresholds
  (Python literals — neither engine evaluates a log or a power at query
  time, the Poisson-bootstrap device).  Emits true count, noise, noisy
  count, and absolute error per type.  Complements the local-DP
  randomized_response_counts with the central-DP release primitive.
- ``brand_harmonic_centrality``: harmonic centrality (Boldi & Vigna's
  recommended closeness variant — sums 1/d, handles disconnection) on
  the top-40-edge brand co-purchase graph, BFS radius 3 unrolled.
  1/d contributions are ppm literals (1000000, 500000, 333333) so the
  score is pure BIGINT.  The one expensive step is the basket-pair
  aggregate; the BFS runs on a ≤ 25-node edge list.
- ``sampled_join_cardinality``: join-size estimation by key sampling
  (the optimizer's "sample the build side" trick): customers whose
  md5 lands in a 1-in-20 bucket contribute their order count × 20 —
  an unbiased Horvitz-Thompson estimate of |customer ⋈ orders|,
  reported against the exact answer with signed error ppm.  Pairs with
  cms_join_size_estimate as the sampling-vs-sketch comparison.

Scale notes: the DP histogram rides the bounded event-type alphabet;
the centrality graph is a fixed-size edge list; the sampled join prunes
19/20 of the probe side BEFORE the join (the filter pushes to the scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
from zeta_etl_spark.queries.registry import T, query

# --- dp_geometric_histogram ---------------------------------------------------

_TWO60 = 1 << 60
# CDF(k) = 1 - (1/2)^(k+1) for k = 0..19, scaled to the 60-bit hash space;
# G = #{thresholds <= u} (P(G > 19) < 1e-6, truncated — both engines
# compare the same integers, so the draw is exact and identical)
_GEO_T = []
_c = 0.0
for _k in range(20):
    _c += 0.5 ** (_k + 1)
    _GEO_T.append(int(_c * _TWO60))


def _geo_draw_sql(hex2long, tag: str, cast_str: str) -> str:
    u = hex2long(f"concat('{tag}:', {cast_str})")
    return (
        "("
        + " + ".join(f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _GEO_T)
        + ")"
    )


def _dp_oracle() -> str:
    g1 = _geo_draw_sql(duck_hex2long, "dpg1", "event_type")
    g2 = _geo_draw_sql(duck_hex2long, "dpg2", "event_type")
    return f"""
WITH h AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
)
SELECT event_type, n,
  CAST({g1} - {g2} AS BIGINT) AS noise,
  CAST(n + {g1} - {g2} AS BIGINT) AS noisy_n,
  CAST(abs({g1} - {g2}) AS BIGINT) AS abs_err
FROM h
"""


@query(
    "dp_geometric_histogram",
    oracle=_dp_oracle(),
    tags=("privacy", "dp", "statistics"),
)
def dp_geometric_histogram(spark, sf_dir):
    g1 = _geo_draw_sql(spark_hex2long, "dpg1", "event_type")
    g2 = _geo_draw_sql(spark_hex2long, "dpg2", "event_type")
    h = (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return h.select(
        "event_type",
        "n",
        F.expr(f"cast({g1} - {g2} as bigint)").alias("noise"),
        F.expr(f"cast(n + {g1} - {g2} as bigint)").alias("noisy_n"),
        F.expr(f"cast(abs({g1} - {g2}) as bigint)").alias("abs_err"),
    )


# --- brand_harmonic_centrality ------------------------------------------------

_HC_EDGES = 40

from zeta_etl_spark.functions.basket import (  # noqa: E402
    duck_brand_edges_cte,
    spark_brand_edges,
)

_HC_ORACLE = f"""
WITH {duck_brand_edges_cte(_HC_EDGES)}, nbr AS MATERIALIZED (
  SELECT ba AS b, bb AS n FROM edges UNION ALL SELECT bb, ba FROM edges
), d1 AS MATERIALIZED (
  SELECT DISTINCT b AS src, n AS dst FROM nbr
), d2 AS MATERIALIZED (
  SELECT DISTINCT d1.src, nbr.n AS dst
  FROM d1 JOIN nbr ON nbr.b = d1.dst
  WHERE nbr.n <> d1.src
    AND NOT EXISTS (SELECT 1 FROM d1 x WHERE x.src = d1.src AND x.dst = nbr.n)
), d3 AS MATERIALIZED (
  SELECT DISTINCT d2.src, nbr.n AS dst
  FROM d2 JOIN nbr ON nbr.b = d2.dst
  WHERE nbr.n <> d2.src
    AND NOT EXISTS (SELECT 1 FROM d1 x WHERE x.src = d2.src AND x.dst = nbr.n)
    AND NOT EXISTS (SELECT 1 FROM d2 x WHERE x.src = d2.src AND x.dst = nbr.n)
), sc AS (
  SELECT src, CAST(1000000 AS BIGINT) AS w FROM d1
  UNION ALL SELECT src, 500000 FROM d2
  UNION ALL SELECT src, 333333 FROM d3
)
SELECT src AS brand,
  CAST(COUNT(*) AS BIGINT) AS n_reached_3,
  CAST(SUM(w) AS BIGINT) AS harmonic_ppm
FROM sc GROUP BY 1
"""


@query(
    "brand_harmonic_centrality",
    oracle=_HC_ORACLE,
    tags=("graph", "centrality", "basket"),
)
def brand_harmonic_centrality(spark, sf_dir):
    edges = spark_brand_edges(spark, sf_dir, _HC_EDGES)
    nbr = edges.select(
        F.col("ba").alias("b"), F.col("bb").alias("n")
    ).union(edges.select(F.col("bb").alias("b"), F.col("ba").alias("n")))
    d1 = nbr.select(F.col("b").alias("src"), F.col("n").alias("dst")).distinct()
    d1 = d1.localCheckpoint()

    def expand(frontier, *seen):
        nxt = (
            frontier.join(nbr, frontier.dst == nbr.b)
            .filter(F.col("n") != F.col("src"))
            .select("src", F.col("n").alias("dst"))
            .distinct()
        )
        for s in seen:
            nxt = nxt.join(s, ["src", "dst"], "left_anti")
        return nxt.localCheckpoint()

    d2 = expand(d1, d1)
    d3 = expand(d2, d1, d2)
    sc = (
        d1.select("src", F.lit(1000000).cast("bigint").alias("w"))
        .union(d2.select("src", F.lit(500000).cast("bigint").alias("w")))
        .union(d3.select("src", F.lit(333333).cast("bigint").alias("w")))
    )
    return sc.groupBy(F.col("src").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reached_3"),
        F.sum("w").cast("bigint").alias("harmonic_ppm"),
    )


# --- sampled_join_cardinality ---------------------------------------------------

_SJ_RATE = 20  # 1-in-20 key sample

_SJ_ORACLE = f"""
WITH exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), est AS (
  SELECT CAST(COUNT(*) * {_SJ_RATE} AS BIGINT) AS est_rows
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE {duck_hex2long("concat('sj:', CAST(c.c_custkey AS VARCHAR))")}
    % {_SJ_RATE} = 0
)
SELECT exact_rows, est_rows,
  CAST((est_rows - exact_rows) * 1000000 // exact_rows AS BIGINT)
    AS err_ppm
FROM exact CROSS JOIN est
"""


@query(
    "sampled_join_cardinality",
    oracle=_SJ_ORACLE,
    tags=("statistics", "sampling", "join"),
)
def sampled_join_cardinality(spark, sf_dir):
    h = spark_hex2long("concat('sj:', cast(c_custkey as string))")
    o = T(spark, sf_dir, "orders").select("o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey")
    exact = o.join(c, o.o_custkey == c.c_custkey).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_rows")
    )
    cs = c.filter(F.expr(f"{h} % {_SJ_RATE} = 0"))
    est = o.join(cs, o.o_custkey == cs.c_custkey).agg(
        (F.count(F.lit(1)) * _SJ_RATE).cast("bigint").alias("est_rows")
    )
    return (
        exact.transform(with_scalar_frame(est))
        .select(
            "exact_rows",
            "est_rows",
            F.expr(
                "cast((est_rows - exact_rows) * 1000000 div exact_rows"
                " as bigint)"
            ).alias("err_ppm"),
        )
    )


# --- fdr_bh_rejections: Benjamini–Hochberg multiple-testing control ----------
# Releasing per-segment "significant" differences without multiplicity
# control inflates false discoveries; BH is the standard FDR procedure.
# Test per event type: a sign test against the GLOBAL exact median of
# value (under the null each type has half its rows above the corpus
# median), z² = (2k−n)²/n which is χ²(1).  BH runs in statistic space —
# sort z² descending, reject ranks 1..k* where k* is the largest rank
# with z²_(i) ≥ χ²-quantile(1 − i·α/m) — using PRE-COMPUTED χ²(1)
# upper-tail literals for α=0.05, m=5 (the corpus' event-type alphabet;
# standard table values, no runtime distribution functions — the house
# literal device).  Integer exactness: z2_ppm via the split identity
# (a//n)·1e6 + (a%n)·1e6//n ≡ a·1e6//n with no overflow until
# (2k−n)² ≈ 9e12·n; the median is the exact lower-median rank (N+1)//2.
# Scale shape: the only data-sized steps are ONE distributed global
# row_number (range-partitioned, no single-task sort) and one hash agg
# to the 5-row type grain; BH itself runs on 5 rows.
#
# The synthetic corpus draws value iid across types (nothing to detect,
# every z² ≈ 0), so a deterministic +25% shift is applied to 'purchase'
# rows IDENTICALLY on both engines — the graded artifact is the BH
# machinery, exercised with BOTH outcomes present (the shifted type
# rejects, the iid types survive) at every scale factor.

_BH_THRESH_PPM = [
    (1, 6634897),  # chi2(1) isf(0.01)
    (2, 5411894),  # isf(0.02)
    (3, 4709292),  # isf(0.03)
    (4, 4217885),  # isf(0.04)
    (5, 3841459),  # isf(0.05)
]

_FDR_ORACLE = f"""
WITH e AS (
  SELECT event_type,
    CASE WHEN event_type = 'purchase' THEN value * 1.25 ELSE value END
      AS value,
    event_id
  FROM events WHERE value IS NOT NULL
), cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
med AS MATERIALIZED (
  SELECT value AS m FROM (
    SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn
    FROM e
  ) WHERE rn = (SELECT (n + 1) // 2 FROM cnt)
), per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_i,
    CAST(COUNT(*) FILTER (WHERE value > (SELECT m FROM med)) AS BIGINT)
      AS k_i
  FROM e GROUP BY event_type
), z AS (
  SELECT event_type, n_i, k_i,
    ((2 * k_i - n_i) * (2 * k_i - n_i) // n_i) * 1000000
      + ((2 * k_i - n_i) * (2 * k_i - n_i) % n_i) * 1000000 // n_i
      AS z2_ppm
  FROM per
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY z2_ppm DESC, event_type)
    AS BIGINT) AS bh_rank
  FROM z
), hits AS (
  SELECT r.*, CASE WHEN r.z2_ppm >= t.t_ppm THEN r.bh_rank ELSE 0 END
    AS hit
  FROM ranked r
  JOIN (VALUES {", ".join(f"({i}, {t})" for i, t in _BH_THRESH_PPM)})
    t(rnk, t_ppm) ON t.rnk = r.bh_rank
), kstar AS (SELECT CAST(COALESCE(MAX(hit), 0) AS BIGINT) AS ks FROM hits)
SELECT event_type, n_i, k_i, z2_ppm, bh_rank,
  CAST(CASE WHEN bh_rank <= (SELECT ks FROM kstar) THEN 1 ELSE 0 END
    AS BIGINT) AS rejected
FROM hits
"""


@query(
    "fdr_bh_rejections",
    oracle=_FDR_ORACLE,
    tags=("analytics", "testing", "fdr"),
)
def fdr_bh_rejections(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from zeta_etl_spark.operators.windows import global_row_number

    e = (
        T(spark, sf_dir, "events")
        .select(
            "event_type",
            F.when(
                F.col("event_type") == "purchase",
                F.col("value") * F.lit(1.25),
            )
            .otherwise(F.col("value"))
            .alias("value"),
            "event_id",
        )
        .filter(F.col("value").isNotNull())
    )
    cnt = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked_vals = global_row_number(e, ["value", "event_id"])
    med = (
        ranked_vals.transform(with_scalar_frame(cnt))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("value").alias("m"))
    )
    per = (
        # bound=1: exactly one row has rn == (N+1) div 2 (rn is a
        # bijection onto 1..N) — the filter is not plan-provable
        e.transform(with_scalar_frame(med, bound=1))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.count(F.when(F.col("value") > F.col("m"), 1))
            .cast("bigint")
            .alias("k_i"),
        )
    )
    z = per.withColumn(
        "z2_ppm",
        F.expr(
            "((2 * k_i - n_i) * (2 * k_i - n_i) div n_i) * 1000000 "
            "+ ((2 * k_i - n_i) * (2 * k_i - n_i) % n_i) "
            "* 1000000 div n_i"
        ).cast("bigint"),
    )
    ranked = z.withColumn(
        "bh_rank",
        F.row_number()
        .over(W.orderBy(F.col("z2_ppm").desc(), "event_type"))
        .cast("bigint"),
    )
    thresh = spark.createDataFrame(_BH_THRESH_PPM, "rnk bigint, t_ppm bigint")
    hits = ranked.join(
        F.broadcast(thresh), ranked["bh_rank"] == thresh["rnk"]
    ).withColumn(
        "hit",
        F.when(F.col("z2_ppm") >= F.col("t_ppm"), F.col("bh_rank"))
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
    kstar = hits.agg(
        F.coalesce(F.max("hit"), F.lit(0)).cast("bigint").alias("ks")
    )
    return (
        hits.transform(with_scalar_frame(kstar))
        .select(
            "event_type",
            "n_i",
            "k_i",
            "z2_ppm",
            "bh_rank",
            F.when(F.col("bh_rank") <= F.col("ks"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("rejected"),
        )
    )
