"""Frontier batch 2 (round 8): four more operator families —

- ``seasonal_decompose_daily``: additive STL-lite decomposition of the
  daily series per event type (trend = 7-day centered MA, seasonal =
  weekday mean of the detrended series, residual) — all integer.
- ``sparse_cosine_pairs``: document-document similarity JOIN through an
  inverted index over tokens (the sparse-vector sibling of
  ``banded_cosine_pairs``): pairwise squared cosine from tf dot products,
  df-capped posting lists so work is sum(df^2) over kept tokens, never
  |docs|^2.
- ``ols2_normal_equations``: closed-form 2-feature least squares per
  brand (normal equations, no intercept): exact BIGINT moment sums, one
  final double solve rounded to 6 dp — the multi-feature sibling of
  ``linear_trend_per_user``.
- ``quantile_normalize_sources``: quantile normalization of per-source
  token-count distributions onto the pooled distribution (the
  bioinformatics/data-curation standard for source harmonization); the
  pooled rank table is built with the distributed exact
  ``global_row_number`` (no single-task sort).

Determinism: SURVEY §5 rules — BIGINT sums, floor ``div``, one trailing
rounded double where a ratio is genuinely fractional.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.operators.windows import global_row_number
from zeta_etl_spark.queries.registry import T, query

# --- seasonal_decompose_daily ------------------------------------------------
# Additive decomposition y = trend + seasonal + residual on the daily
# cent-sums of each event type.  Trend: 7-day CENTERED moving average
# (rows -3..+3 — a bounded frame, O(1)/row); seasonal: weekday mean of
# (y - trend) with the weekday index Monday=0 on both engines (Spark
# weekday() == DuckDB isodow-1); residual closes the identity exactly
# because every term is an integer (floor-div means).

_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), tr AS (
  SELECT *,
    CAST(SUM(cents) OVER w AS BIGINT) // CAST(COUNT(*) OVER w AS BIGINT)
      AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), se AS (
  SELECT *,
    CAST(SUM(cents - trend) OVER s AS BIGINT)
      // CAST(COUNT(*) OVER s AS BIGINT) AS seasonal
  FROM tr
  WINDOW s AS (PARTITION BY event_type, isodow(day) - 1)
)
SELECT event_type, day, cents, trend, seasonal,
  cents - trend - seasonal AS residual
FROM se
"""


@query(
    "seasonal_decompose_daily",
    oracle=_SEASONAL_ORACLE,
    tags=("timeseries", "decomposition", "window"),
)
def seasonal_decompose_daily(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    tr = daily.withColumn(
        "trend",
        F.expr(
            "cast(sum(cents) over (partition by event_type order by day "
            "rows between 3 preceding and 3 following) as bigint) div "
            "cast(count(*) over (partition by event_type order by day "
            "rows between 3 preceding and 3 following) as bigint)"
        ),
    )
    se = tr.withColumn(
        "seasonal",
        F.expr(
            "cast(sum(cents - trend) over "
            "(partition by event_type, weekday(day)) as bigint) div "
            "cast(count(*) over "
            "(partition by event_type, weekday(day)) as bigint)"
        ),
    )
    return se.select(
        "event_type",
        "day",
        "cents",
        "trend",
        "seasonal",
        (F.col("cents") - F.col("trend") - F.col("seasonal")).alias(
            "residual"
        ),
    )


# --- sparse_cosine_pairs -----------------------------------------------------
# Inverted-index similarity join: docs decompose to distinct 5-shingles
# (binary weights — the corpus vocabulary is ~31 tokens, so raw tokens
# are degenerate dimensions while the shingle space is ~10^5 and sparse);
# pairs sharing a shingle accumulate dot = |shared shingles|; squared
# cosine is the fully-integer ratio cos2_ppm = dot^2 * 1e6 // (|A|*|B|).
# Shingles with df > _SPARSE_DF_CAP are DROPPED before pairing (hot-
# dimension cap — same safeguard as the LSH path's _cap_hot_buckets), so
# pairing work is sum(df^2) over kept shingles, never |docs|^2.  Output:
# deterministic top-_SPARSE_TOP by (cos2_ppm desc, doc_a, doc_b).

_SPARSE_DF_CAP = 50
_SPARSE_TOP = 100


def _sparse_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_shingles

    return f"""
WITH sh0 AS (
  SELECT doc_id, unnest({duck_shingles("text", 5)}) AS s FROM documents
), keep AS (
  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= {_SPARSE_DF_CAP}
), sh AS (
  SELECT t.doc_id, t.s FROM sh0 t JOIN keep k ON k.s = t.s
), norm AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS norm2 FROM sh GROUP BY 1
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(COUNT(*) AS BIGINT) AS dot
  FROM sh a
  JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b, d.dot,
  (d.dot * d.dot * 1000000) // (na.norm2 * nb.norm2) AS cos2_ppm
FROM dots d
JOIN norm na ON na.doc_id = d.doc_a
JOIN norm nb ON nb.doc_id = d.doc_b
ORDER BY cos2_ppm DESC, d.doc_a, d.doc_b
LIMIT {_SPARSE_TOP}
"""


@query(
    "sparse_cosine_pairs",
    oracle=_sparse_oracle(),
    tags=("similarity", "inverted-index", "join"),
)
def sparse_cosine_pairs(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_shingles

    docs = T(spark, sf_dir, "documents")
    sh0 = docs.select(
        "doc_id",
        F.explode(F.expr(spark_shingles("text", 5))).alias("s"),
    )
    # Optimization r13 (guide §2.4, cobasket-pairs device): ONE exchange of
    # the exploded postings builds the per-shingle doc-id list; the df cap
    # (hot-dim prune) becomes a size filter — the former shape exploded
    # documents TWICE (keep aggregate + index join) and then self-joined the
    # index.  Pair expansion over the sorted list emits the identical
    # (doc_a < doc_b, one row per shared kept shingle) multiset; work per
    # shingle stays |postings|² ≤ df_cap², the same bound the self-join had
    # after the cap.  Similarity lives in the PRUNED shingle space: norms
    # count kept shingles so cos is a true cosine there.
    #
    # Optimization r14 (guide §5 bounded agg state, VERDICT r13 #4): the df
    # cap is applied BEFORE the collect — `count(*) over (partition by s)`
    # rides the same exchange (the groupBy below reuses the window's hash
    # partitioning, so still ONE data-sized exchange) and the window buffer
    # holds plain rows (sort-based, spills gracefully).  The r13 form
    # collected the FULL posting array and then filtered on size(): a hot
    # stop-shingle (df in the millions at 100 TB) materialized its whole
    # doc-id list inside one ObjectHashAggregate entry before being dropped.
    # Now no array ever exceeds _SPARSE_DF_CAP elements.
    from zeta_etl_spark.operators.graph import capped_postings

    postings = (
        capped_postings(sh0, "s", "doc_id", _SPARSE_DF_CAP)
        .select("ids")
        .localCheckpoint()  # feeds both the norm count and the pair expand
    )
    norm = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("norm2"))
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS a, y AS b))))"
    )
    dots = (
        postings.select(F.explode(F.expr(pair_expr)).alias("_p"))
        .groupBy(
            F.col("_p.a").alias("doc_a"),
            F.col("_p.b").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("dot"))
    )
    return (
        dots.join(
            norm.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "norm2", "na"
            ),
            "doc_a",
        )
        .join(
            norm.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "norm2", "nb"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "dot",
            F.expr("(dot * dot * 1000000) div (na * nb)").alias("cos2_ppm"),
        )
        .orderBy(F.desc("cos2_ppm"), "doc_a", "doc_b")
        .limit(_SPARSE_TOP)
    )


# --- ols2_normal_equations ---------------------------------------------------
# Per-brand least squares price ~ b1*quantity + b2*discount_permille (no
# intercept): moment sums Sx1x1, Sx1x2, Sx2x2, Sx1y, Sx2y are EXACT
# BIGINTs (one shuffle, map-side combinable); the 2x2 normal-equation
# solve happens once per brand on the aggregated row — double Cramer's
# rule, both engines see identical operands, ROUND(.., 6) pins the
# rendering.  Singular systems (det = 0) are excluded.

_OLS2_ORACLE = """
WITH m AS (
  SELECT p.p_brand AS brand,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(l.l_quantity AS BIGINT) * CAST(l.l_quantity AS BIGINT))
      AS BIGINT) AS sx1x1,
    CAST(SUM(CAST(l.l_quantity AS BIGINT)
      * CAST(floor(l.l_discount * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sx1x2,
    CAST(SUM(CAST(floor(l.l_discount * 1000 + 0.5) AS BIGINT)
      * CAST(floor(l.l_discount * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sx2x2,
    CAST(SUM(CAST(l.l_quantity AS BIGINT)
      * CAST(floor(l.l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS sx1y,
    CAST(SUM(CAST(floor(l.l_discount * 1000 + 0.5) AS BIGINT)
      * CAST(floor(l.l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS sx2y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT brand, n,
  ROUND((CAST(sx1y AS DOUBLE) * CAST(sx2x2 AS DOUBLE)
       - CAST(sx2y AS DOUBLE) * CAST(sx1x2 AS DOUBLE))
      / (CAST(sx1x1 AS DOUBLE) * CAST(sx2x2 AS DOUBLE)
       - CAST(sx1x2 AS DOUBLE) * CAST(sx1x2 AS DOUBLE)), 6) AS beta_qty,
  ROUND((CAST(sx1x1 AS DOUBLE) * CAST(sx2y AS DOUBLE)
       - CAST(sx1x2 AS DOUBLE) * CAST(sx1y AS DOUBLE))
      / (CAST(sx1x1 AS DOUBLE) * CAST(sx2x2 AS DOUBLE)
       - CAST(sx1x2 AS DOUBLE) * CAST(sx1x2 AS DOUBLE)), 6) AS beta_disc
FROM m
WHERE CAST(sx1x1 AS DOUBLE) * CAST(sx2x2 AS DOUBLE)
    - CAST(sx1x2 AS DOUBLE) * CAST(sx1x2 AS DOUBLE) <> 0
"""


@query(
    "ols2_normal_equations",
    oracle=_OLS2_ORACLE,
    tags=("statistics", "regression", "aggregation"),
)
def ols2_normal_equations(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(pt.select("p_partkey", "p_brand")),
        li["l_partkey"] == pt["p_partkey"],
    ).select(
        F.col("p_brand").alias("brand"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.expr("cast(floor(l_discount * 1000 + 0.5) as bigint)").alias("x2"),
        F.expr("cast(floor(l_extendedprice + 0.5) as bigint)").alias("y"),
    )
    m = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("sx1x1"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("sx1x2"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("sx2x2"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("sx2y"),
    )
    det = (
        F.col("sx1x1").cast("double") * F.col("sx2x2").cast("double")
        - F.col("sx1x2").cast("double") * F.col("sx1x2").cast("double")
    )
    b1 = (
        F.col("sx1y").cast("double") * F.col("sx2x2").cast("double")
        - F.col("sx2y").cast("double") * F.col("sx1x2").cast("double")
    ) / det
    b2 = (
        F.col("sx1x1").cast("double") * F.col("sx2y").cast("double")
        - F.col("sx1x2").cast("double") * F.col("sx1y").cast("double")
    ) / det
    return m.where(det != 0).select(
        "brand",
        "n",
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
    )


# --- quantile_normalize_sources ----------------------------------------------
# Quantile normalization (Bolstad et al., Bioinformatics'03, the
# cross-source harmonization standard): each document's token count is
# replaced by the POOLED distribution's value at the equivalent quantile
# position.  Within-source ranks are per-source windows (bounded keys);
# the pooled rank table uses the engine's DISTRIBUTED exact global
# row_number (operators/windows.py) — Window.orderBy's single-task sort
# would be the 100 TB bottleneck, global_row_number is the scale path.
# Position mapping: pooled_rank = ((2*r - 1) * N) // (2*n_s) + 1 — the
# midpoint rule, exact integers on both engines.

_QNORM_ORACLE = """
WITH tc AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS token_cnt
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY token_cnt, doc_id) AS r,
    COUNT(*) OVER (PARTITION BY source) AS ns
  FROM tc
), pooled AS (
  SELECT token_cnt AS pooled_cnt,
    ROW_NUMBER() OVER (ORDER BY token_cnt, doc_id) AS pr
  FROM tc
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM tc)
SELECT k.doc_id, k.source, k.token_cnt, p.pooled_cnt AS normalized_cnt
FROM ranked k
CROSS JOIN n
JOIN pooled p ON p.pr = ((2 * k.r - 1) * n.nn) // (2 * k.ns) + 1
"""


@query(
    "quantile_normalize_sources",
    oracle=_QNORM_ORACLE,
    tags=("curation", "normalization", "window"),
)
def quantile_normalize_sources(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    tc = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
            "token_cnt"
        ),
    )
    tc = tc.localCheckpoint()  # consumed by ranked, pooled, and the count
    ws = Window.partitionBy("source").orderBy("token_cnt", "doc_id")
    ranked = tc.select(
        "doc_id",
        "source",
        "token_cnt",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("bigint")
        .alias("ns"),
    )
    pooled = global_row_number(
        tc.select(F.col("token_cnt").alias("pooled_cnt"), "doc_id"),
        order_by=["pooled_cnt", "doc_id"],
        out_col="pr",
    ).select("pooled_cnt", "pr")
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    n = tc.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    k = scalar_frame_crossjoin(ranked, n).withColumn(
        "pr", F.expr("((2 * r - 1) * nn) div (2 * ns) + 1")
    )
    return k.join(pooled, "pr").select(
        "doc_id", "source", "token_cnt", F.col("pooled_cnt").alias("normalized_cnt")
    )
