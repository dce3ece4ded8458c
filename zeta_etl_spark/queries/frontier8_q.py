"""Frontier batch 7 (round 8, session 3): classical statistical tests and
ML building blocks, all exact-integer or pinned-double —

- ``welch_t_test``: Welch's unequal-variance t-test comparing purchase vs
  click value.  Moments are exact BIGINT sums; every double derives from
  them through the SAME expression tree in both engines (the repo
  determinism rule: +,-,*,/,sqrt only).
- ``ks_test_two_sample``: two-sample Kolmogorov-Smirnov D statistic from
  cross-multiplied integer ECDF counts — max |c1*n2 - c2*n1| over the
  pooled support, one running frame on the CENT-VALUE grain (bounded by
  the value domain, not the row count).
- ``simpson_diversity_sources``: per-source token diversity via the
  Simpson index (probability two random tokens differ) — the no-log
  diversity measure (Shannon entropy needs ln, which is banned in
  oracle-compared columns because libm is not IEEE-pinned).
- ``gini_impurity_split``: best decision-stump split of l_quantity for
  predicting returns — the CART split-search step.  The 49 candidate
  thresholds live on a 50-row cumulative frame after ONE fact scan.
- ``pca_power_iteration``: leading principal component of the embedding
  cloud by 2 unrolled power-iteration rounds on the integer Gram matrix
  of centered vectors.  The Gram agg is the only data-sized pass
  (map-side partial agg means shuffle volume is 64x64 rows per
  partition, independent of corpus size); each matvec is a 4096-row
  broadcast-sized join.

Magnitude audit (what keeps every BIGINT in range at sf1000 = ~2e7
vectors, ~5e8 orders): centered components |c| <= ~1100 (scale-1000
embeddings), Gram terms <= 1.2e6, Gram sums <= 2.6e13; matvec w =
G_div_n x v_ppm <= 64 * 1.3e6 * 1e6 ~ 8e13; norm accumulators use
w div 1e6 (<= 8e7, squares 6e15 x 64 ~ 4e17).  KS cross products are
<= n1*n2 <= 6e17.  All inside int64.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin
from zeta_etl_spark.queries.registry import T, query

# --- welch_t_test ------------------------------------------------------------

_WELCH_SE = "sqrt(v1 / n1 + v2 / n2)"
_WELCH_DF = (
    "((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)) / "
    "((v1 / n1) * (v1 / n1) / (n1 - 1.0) + (v2 / n2) * (v2 / n2) / (n2 - 1.0))"
)

_WELCH_ORACLE = f"""
WITH g AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
             * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s2
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1
), m AS (
  SELECT
    MAX(CASE WHEN event_type = 'purchase' THEN CAST(n AS DOUBLE) END) AS n1,
    MAX(CASE WHEN event_type = 'purchase' THEN CAST(s1 AS DOUBLE) END) AS a1,
    MAX(CASE WHEN event_type = 'purchase' THEN CAST(s2 AS DOUBLE) END) AS b1,
    MAX(CASE WHEN event_type = 'click' THEN CAST(n AS DOUBLE) END) AS n2,
    MAX(CASE WHEN event_type = 'click' THEN CAST(s1 AS DOUBLE) END) AS a2,
    MAX(CASE WHEN event_type = 'click' THEN CAST(s2 AS DOUBLE) END) AS b2
  FROM g
), v AS (
  SELECT n1, n2, a1 / n1 AS m1, a2 / n2 AS m2,
    (b1 - a1 * (a1 / n1)) / (n1 - 1.0) AS v1,
    (b2 - a2 * (a2 / n2)) / (n2 - 1.0) AS v2
  FROM m
)
SELECT
  CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
  CAST(floor(m1 * 1000 + 0.5) AS BIGINT) AS mean_purchase_milli,
  CAST(floor(m2 * 1000 + 0.5) AS BIGINT) AS mean_click_milli,
  CAST(floor((m1 - m2) / ({_WELCH_SE}) * 1000 + 0.5) AS BIGINT) AS t_milli,
  CAST(floor(({_WELCH_DF}) * 1000 + 0.5) AS BIGINT) AS df_milli
FROM v
"""


@query(
    "welch_t_test",
    oracle=_WELCH_ORACLE,
    tags=("statistics", "hypothesis-test"),
)
def welch_t_test(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    cents = "cast(floor(value * 100 + 0.5) as bigint)"
    g = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(f"cast(sum({cents}) as bigint)").alias("s1"),
            F.expr(f"cast(sum({cents} * {cents}) as bigint)").alias("s2"),
        )
    )
    m = g.agg(
        *[
            F.max(
                F.when(
                    F.col("event_type") == t, F.col(c).cast("double")
                )
            ).alias(a)
            for t, pre in (("purchase", "1"), ("click", "2"))
            for c, a in (
                ("n", f"n{pre}"),
                ("s1", f"a{pre}"),
                ("s2", f"b{pre}"),
            )
        ]
    )
    v = m.select(
        "n1",
        "n2",
        F.expr("a1 / n1").alias("m1"),
        F.expr("a2 / n2").alias("m2"),
        F.expr("(b1 - a1 * (a1 / n1)) / (n1 - 1.0)").alias("v1"),
        F.expr("(b2 - a2 * (a2 / n2)) / (n2 - 1.0)").alias("v2"),
    )
    return v.select(
        F.expr("cast(n1 as bigint)").alias("n_purchase"),
        F.expr("cast(n2 as bigint)").alias("n_click"),
        F.expr("cast(floor(m1 * 1000 + 0.5) as bigint)").alias(
            "mean_purchase_milli"
        ),
        F.expr("cast(floor(m2 * 1000 + 0.5) as bigint)").alias(
            "mean_click_milli"
        ),
        F.expr(
            f"cast(floor((m1 - m2) / ({_WELCH_SE}) * 1000 + 0.5) as bigint)"
        ).alias("t_milli"),
        F.expr(
            f"cast(floor(({_WELCH_DF}) * 1000 + 0.5) as bigint)"
        ).alias("df_milli"),
    )


# --- ks_test_two_sample ------------------------------------------------------
# D = max over pooled support of |F1(x) - F2(x)|, computed as integer
# cross products |c1*n2 - c2*n1| (<= n1*n2 ~ 6e17 at sf1000).  The
# running frame sorts the CENT grain (|distinct cents| ~ value domain x
# 100 — bounded), not events.

_KS_ORACLE = """
WITH pts AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS d1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS d2
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2
  FROM pts
), run AS (
  SELECT cents,
    CAST(SUM(d1) OVER (ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
    CAST(SUM(d2) OVER (ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
  FROM pts
), d AS (
  SELECT r.cents, abs(r.c1 * t.n2 - r.c2 * t.n1) AS dnum, t.n1, t.n2
  FROM run r CROSS JOIN tot t
), best AS (
  SELECT min(struct_pack(negd := -dnum, cents := cents)) AS pick,
    MAX(n1) AS n1, MAX(n2) AS n2
  FROM d
)
SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
  CAST(-pick['negd'] AS BIGINT) * 1000000 // (n1 * n2) AS ks_d_ppm,
  CAST(pick['cents'] AS BIGINT) AS argmax_cents
FROM best
"""


@query(
    "ks_test_two_sample",
    oracle=_KS_ORACLE,
    tags=("statistics", "hypothesis-test", "distribution"),
)
def ks_test_two_sample(spark, sf_dir):
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    pts = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("d1"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("d2"),
        )
    )
    # cent-grain frame feeds both the totals scalar and the running ECDF —
    # materialize once so the fact scans once
    pts = pts.localCheckpoint()
    tot = pts.agg(
        F.sum("d1").cast("bigint").alias("n1"),
        F.sum("d2").cast("bigint").alias("n2"),
    )
    run = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    r = pts.select(
        "cents",
        F.sum("d1").over(run).cast("bigint").alias("c1"),
        F.sum("d2").over(run).cast("bigint").alias("c2"),
    )
    d = scalar_frame_crossjoin(r, tot).select(
        "cents",
        F.expr("abs(c1 * n2 - c2 * n1)").alias("dnum"),
        "n1",
        "n2",
    )
    best = d.agg(
        F.min(
            F.struct(
                (-F.col("dnum")).alias("negd"), F.col("cents").alias("cents")
            )
        ).alias("pick"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    return best.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
        F.expr(
            "(cast(-pick.negd as bigint) * 1000000) div (n1 * n2)"
        ).alias("ks_d_ppm"),
        F.expr("cast(pick.cents as bigint)").alias("argmax_cents"),
    )


# --- simpson_diversity_sources ----------------------------------------------
# Per source: Simpson index lambda = sum(cnt_i*(cnt_i-1)) / (N*(N-1)) over
# the token distribution; diversity = 1 - lambda.  Exact BIGINT moments,
# one IEEE-exact final division (the only double).

_SIMPSON_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), cnt AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
), agg AS (
  SELECT source,
    CAST(SUM(c) AS BIGINT) AS n_tokens,
    CAST(COUNT(*) AS BIGINT) AS n_distinct,
    CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs_same
  FROM cnt GROUP BY 1
)
SELECT source, n_tokens, n_distinct,
  CAST(floor((1.0 - CAST(pairs_same AS DOUBLE)
              / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)) * 1000000 + 0.5)
    AS BIGINT) AS simpson_diversity_ppm
FROM agg
"""


@query(
    "simpson_diversity_sources",
    oracle=_SIMPSON_ORACLE,
    tags=("text", "diversity", "curation"),
)
def simpson_diversity_sources(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(F.expr("split(text, ' ')")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    agg = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.expr("c * (c - 1)")).cast("bigint").alias("pairs_same"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_distinct",
        F.expr(
            "cast(floor((1.0 - cast(pairs_same as double) "
            "/ cast(n_tokens * (n_tokens - 1) as double)) * 1000000 + 0.5) "
            "as bigint)"
        ).alias("simpson_diversity_ppm"),
    )


# --- gini_impurity_split -----------------------------------------------------
# CART decision-stump search: best l_quantity threshold for predicting
# l_returnflag = 'R'.  One fact scan -> 50-row quantity grain -> running
# class counts -> weighted Gini per threshold (doubles from exact ints,
# identical trees) -> deterministic argmin (impurity asc, threshold asc).

_GINI_IMP = (
    "(nl * (1.0 - (pl * pl + ql * ql)) + nr * (1.0 - (pr * pr + qr * qr)))"
    " / n"
)

_GINI_ORACLE = f"""
WITH q AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      AS pos,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
), run AS (
  SELECT qty,
    CAST(SUM(pos) OVER w AS BIGINT) AS cpos,
    CAST(SUM(cnt) OVER w AS BIGINT) AS ccnt,
    CAST(SUM(pos) OVER () AS BIGINT) AS tpos,
    CAST(SUM(cnt) OVER () AS BIGINT) AS tcnt
  FROM q
  WINDOW w AS (ORDER BY qty ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), cand AS (
  SELECT qty AS threshold,
    CAST(ccnt AS DOUBLE) AS nl, CAST(tcnt - ccnt AS DOUBLE) AS nr,
    CAST(tcnt AS DOUBLE) AS n,
    CAST(cpos AS DOUBLE) / CAST(ccnt AS DOUBLE) AS pl,
    CAST(ccnt - cpos AS DOUBLE) / CAST(ccnt AS DOUBLE) AS ql,
    CAST(tpos - cpos AS DOUBLE) / CAST(tcnt - ccnt AS DOUBLE) AS pr,
    CAST((tcnt - ccnt) - (tpos - cpos) AS DOUBLE)
      / CAST(tcnt - ccnt AS DOUBLE) AS qr,
    CAST(tpos AS DOUBLE) / CAST(tcnt AS DOUBLE) AS pp,
    CAST(tcnt - tpos AS DOUBLE) / CAST(tcnt AS DOUBLE) AS qq
  FROM run WHERE ccnt > 0 AND ccnt < tcnt
), scored AS (
  SELECT threshold,
    CAST(floor({_GINI_IMP} * 1000000 + 0.5) AS BIGINT) AS split_gini_ppm,
    CAST(floor((1.0 - (pp * pp + qq * qq)) * 1000000 + 0.5) AS BIGINT)
      AS parent_gini_ppm
  FROM cand
)
SELECT s.threshold AS best_threshold, s.split_gini_ppm, s.parent_gini_ppm,
  s.parent_gini_ppm - s.split_gini_ppm AS gain_ppm
FROM scored s
JOIN (
  SELECT min(struct_pack(g := split_gini_ppm, t := threshold)) AS pick
  FROM scored
) b ON s.split_gini_ppm = b.pick['g'] AND s.threshold = b.pick['t']
"""


@query(
    "gini_impurity_split",
    oracle=_GINI_ORACLE,
    tags=("ml", "decision-tree", "statistics"),
)
def gini_impurity_split(spark, sf_dir):
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    q = li.groupBy(F.expr("cast(l_quantity as bigint)").alias("qty")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    run = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    allw = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = q.select(
        "qty",
        F.sum("pos").over(run).cast("bigint").alias("cpos"),
        F.sum("cnt").over(run).cast("bigint").alias("ccnt"),
        F.sum("pos").over(allw).cast("bigint").alias("tpos"),
        F.sum("cnt").over(allw).cast("bigint").alias("tcnt"),
    )
    cand = r.filter("ccnt > 0 and ccnt < tcnt").select(
        F.col("qty").alias("threshold"),
        F.expr("cast(ccnt as double)").alias("nl"),
        F.expr("cast(tcnt - ccnt as double)").alias("nr"),
        F.expr("cast(tcnt as double)").alias("n"),
        F.expr("cast(cpos as double) / cast(ccnt as double)").alias("pl"),
        F.expr("cast(ccnt - cpos as double) / cast(ccnt as double)").alias(
            "ql"
        ),
        F.expr(
            "cast(tpos - cpos as double) / cast(tcnt - ccnt as double)"
        ).alias("pr"),
        F.expr(
            "cast((tcnt - ccnt) - (tpos - cpos) as double) "
            "/ cast(tcnt - ccnt as double)"
        ).alias("qr"),
        F.expr("cast(tpos as double) / cast(tcnt as double)").alias("pp"),
        F.expr("cast(tcnt - tpos as double) / cast(tcnt as double)").alias(
            "qq"
        ),
    )
    scored = cand.select(
        "threshold",
        F.expr(
            f"cast(floor({_GINI_IMP} * 1000000 + 0.5) as bigint)"
        ).alias("split_gini_ppm"),
        F.expr(
            "cast(floor((1.0 - (pp * pp + qq * qq)) * 1000000 + 0.5) "
            "as bigint)"
        ).alias("parent_gini_ppm"),
    )
    scored = scored.localCheckpoint()
    best = scored.agg(
        F.min(
            F.struct(
                F.col("split_gini_ppm").alias("g"),
                F.col("threshold").alias("t"),
            )
        ).alias("pick")
    )
    return (
        scalar_frame_crossjoin(scored, best, bound=1)
        .filter(
            (F.col("split_gini_ppm") == F.col("pick.g"))
            & (F.col("threshold") == F.col("pick.t"))
        )
        .select(
            F.col("threshold").alias("best_threshold"),
            "split_gini_ppm",
            "parent_gini_ppm",
            (F.col("parent_gini_ppm") - F.col("split_gini_ppm")).alias(
                "gain_ppm"
            ),
        )
    )


# --- pca_power_iteration -----------------------------------------------------
# Leading principal component by 2 unrolled power-iteration rounds on the
# exact integer Gram matrix of centered scale-1000 embeddings.
#
#   cm_i  = sum(sv_i) div n                 (integer mean, truncating div
#                                            is identical in both engines,
#                                            negatives included)
#   G_ij  = sum((sv_i - cm_i)(sv_j - cm_j))  exact BIGINT, <= 2.6e13 @sf1000
#   gn_ij = G_ij div n                       scale-free magnitude ~cov*1e6
#   w1 = gn . ones_ppm ; v1 = ppm-normalize(w1 div 1e6)
#   w2 = gn . v1       ; v2 = ppm-normalize(w2 div 1e6)
#   eigval_scaled = floor(sqrt(sum((w2 div 1e6)^2)) + 0.5)   (gn units)
#
# The Gram aggregation is the ONLY data-sized pass; map-side partial agg
# makes its shuffle 64x64 rows per partition regardless of corpus size.
# Each matvec is a 4096-row frame — driver-free, broadcast-sized.

_PCA_SCALE = 1000

_PCA_DUCK_SV = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_PCA_SCALE}"
    " + 0.5) AS BIGINT))"
)

_PCA_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, {_PCA_DUCK_SV} AS sv FROM embeddings
), nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e
), cm AS MATERIALIZED (
  SELECT CAST(i AS BIGINT) AS dim,
    CAST(SUM(sv[CAST(i AS INT)]) AS BIGINT)
      // (SELECT n FROM nn) AS cm
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY i
), carr AS MATERIALIZED (
  SELECT list(cm ORDER BY dim) AS cv FROM cm
), g AS MATERIALIZED (
  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
    CAST(SUM((e.sv[CAST(i AS INT)] - carr.cv[CAST(i AS INT)])
           * (e.sv[CAST(j AS INT)] - carr.cv[CAST(j AS INT)])) AS BIGINT)
      // (SELECT n FROM nn) AS gn
  FROM e CROSS JOIN carr CROSS JOIN range(1, 65) t(i)
       CROSS JOIN range(1, 65) u(j)
  GROUP BY i, j
), w1 AS MATERIALIZED (
  SELECT i AS dim, CAST(SUM(gn * 1000000) AS BIGINT) // 1000000 AS wr
  FROM g GROUP BY i
), n1 AS MATERIALIZED (
  SELECT CAST(SUM(wr * wr) AS BIGINT) AS norm2 FROM w1
), v1 AS MATERIALIZED (
  SELECT dim, CAST(floor(CAST(wr AS DOUBLE) * 1000000
    / sqrt(CAST((SELECT norm2 FROM n1) AS DOUBLE)) + 0.5) AS BIGINT) AS v
  FROM w1
), w2 AS MATERIALIZED (
  SELECT g.i AS dim, CAST(SUM(g.gn * v1.v) AS BIGINT) // 1000000 AS wr
  FROM g JOIN v1 ON v1.dim = g.j GROUP BY g.i
), n2 AS MATERIALIZED (
  SELECT CAST(SUM(wr * wr) AS BIGINT) AS norm2 FROM w2
)
SELECT w2.dim,
  CAST(floor(CAST(w2.wr AS DOUBLE) * 1000000
    / sqrt(CAST((SELECT norm2 FROM n2) AS DOUBLE)) + 0.5) AS BIGINT)
    AS component_ppm,
  CAST(floor(sqrt(CAST((SELECT norm2 FROM n2) AS DOUBLE)) + 0.5) AS BIGINT)
    AS eigval_scaled
FROM w2
"""


@query(
    "pca_power_iteration",
    oracle=_PCA_ORACLE,
    tags=("vectors", "pca", "linear-algebra"),
)
def pca_power_iteration(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    sv = emb.select(
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * "
            f"{_PCA_SCALE} + 0.5) as bigint))"
        ).alias("sv")
    )
    sv = sv.localCheckpoint()  # feeds count, mean, and Gram passes
    nn = sv.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cm = (
        sv.select(F.posexplode("sv").alias("dim0", "v"))
        .groupBy("dim0")
        .agg(F.sum("v").cast("bigint").alias("s"))
    )
    cm = scalar_frame_crossjoin(cm, nn).select(
        "dim0", F.expr("s div n").alias("cm")
    )
    carr = cm.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim0, cm))), s -> s.cm)"
        ).alias("cv")
    )
    centered = scalar_frame_crossjoin(sv, carr, bound=1).select(
        F.expr("zip_with(sv, cv, (a, b) -> a - b)").alias("c")
    )
    # Gram: the only data-sized pass; partial agg keeps the shuffle at
    # 64x64 rows per partition
    gram = (
        centered.select(F.posexplode("c").alias("i0", "ci"), "c")
        .select("i0", "ci", F.posexplode("c").alias("j0", "cj"))
        .groupBy(
            (F.col("i0") + 1).cast("bigint").alias("i"),
            (F.col("j0") + 1).cast("bigint").alias("j"),
        )
        .agg(F.sum(F.expr("ci * cj")).cast("bigint").alias("gsum"))
    )
    g = scalar_frame_crossjoin(gram, nn).select(
        "i", "j", F.expr("gsum div n").alias("gn")
    )
    g = g.localCheckpoint()  # 4096-row frame drives both matvec rounds
    w1 = g.groupBy(F.col("i").alias("dim")).agg(
        F.expr("cast(sum(gn * 1000000) as bigint) div 1000000").alias("wr")
    )
    w1 = w1.localCheckpoint()
    n1 = w1.agg(F.expr("cast(sum(wr * wr) as bigint)").alias("norm2"))
    v1 = scalar_frame_crossjoin(w1, n1).select(
        "dim",
        F.expr(
            "cast(floor(cast(wr as double) * 1000000 "
            "/ sqrt(cast(norm2 as double)) + 0.5) as bigint)"
        ).alias("v"),
    )
    w2 = (
        g.join(v1.select(F.col("dim").alias("j"), "v"), "j")
        .groupBy(F.col("i").alias("dim"))
        .agg(F.expr("cast(sum(gn * v) as bigint) div 1000000").alias("wr"))
    )
    w2 = w2.localCheckpoint()
    n2 = w2.agg(F.expr("cast(sum(wr * wr) as bigint)").alias("norm2"))
    return scalar_frame_crossjoin(w2, n2).select(
        "dim",
        F.expr(
            "cast(floor(cast(wr as double) * 1000000 "
            "/ sqrt(cast(norm2 as double)) + 0.5) as bigint)"
        ).alias("component_ppm"),
        F.expr(
            "cast(floor(sqrt(cast(norm2 as double)) + 0.5) as bigint)"
        ).alias("eigval_scaled"),
    )
