"""Advanced-analytics queries: ranked-distribution window family
(ntile/cume_dist/percent_rank), TF-IDF term ranking, an Arrow-batched
applyInPandas normalization (the sanctioned Python-UDF path, oracle-verified),
and an iterative Lloyd k-means over the embeddings table.

Beyond-reference breadth (BASELINE.json north star): these are the shapes an
LLM-data platform adds on top of the reference's finance analytics — corpus
term weighting, grouped Python feature engineering, unsupervised clustering.

Determinism notes:
- ntile/cume_dist/percent_rank are rank-arithmetic (exact ints + one double
  division) over fully tie-broken orderings — bit-identical across engines.
- TF-IDF uses the rational idf ``n_docs / df`` (no libm log — ln() last-ulp
  behavior is not guaranteed identical across engines); tf·N/df on exact
  BIGINTs with one final double division.
- The applyInPandas normalizer only uses order-independent group stats
  (median/max/min) and elementwise arithmetic, so pandas float64 matches
  DuckDB's double math exactly; median on even counts is (a+b)/2 in both.
- k-means distances/assignments are exact integer arithmetic on scaled
  vectors; recomputed centroids round via floor(sum/cnt + 0.5) where the
  double division of exact ints (|sum| < 2^53) is IEEE-deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- ntile_cume_dist: ranked-distribution window family (W5 completeness) ---

_NTILE_ORACLE = """
WITH totals AS (
  SELECT user_id,
    CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY user_id
)
SELECT user_id, total_value,
  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
  CUME_DIST() OVER w AS cume,
  PERCENT_RANK() OVER w AS pct_rank
FROM totals
WINDOW w AS (ORDER BY total_value DESC, user_id)
"""


@query("ntile_cume_dist", oracle=_NTILE_ORACLE, tags=("window", "W5"))
def ntile_cume_dist(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(dec_sum("value", "total_value"))
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id"))
    return totals.select(
        "user_id",
        "total_value",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


# --- tfidf_top_terms: corpus term weighting with rational idf ---------------

_TFIDF_ORACLE = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE doc_id < 100
), tokens AS (
  SELECT doc_id, toks[CAST(i AS INT)] AS term
  FROM docs CROSS JOIN range(1, 10000) r(i) WHERE i <= len(toks)
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM docs
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, CAST(rn AS BIGINT) AS term_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rn
  FROM scored
) t WHERE rn <= 3
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("text", "tfidf", "agg"))
def tfidf_top_terms(spark, sf_dir):
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tokens = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df as a WINDOW over tf, not a join against a second token explode:
    # tf rows are unique per (doc, term), so count-over-term == count
    # (DISTINCT doc_id).  The tokenize+explode (the CPU-dominant stage at
    # corpus scale) runs once, and the join+broadcast disappears — 7 → 5
    # exchanges, 2 → 1 explodes (r7 window audit; exchange reuse alone
    # couldn't do it: column pruning de-canonicalizes the shared subtree)
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).alias("df")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.select("doc_id", "term", "tf", df_w)
        .transform(with_scalar_frame(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= 3)
    )


# --- pandas_minmax_norm: the sanctioned Python-UDF path, oracle-verified ----
# The engine keeps Python out of relational hot paths (SURVEY §2.10); when a
# user DOES need grouped Python feature engineering, applyInPandas is the
# shape — Arrow-batched, one group per call.  This query proves the path
# produces hash-identical results to a pure-SQL oracle when the group stats
# are order-independent.

_NORM_ORACLE = """
WITH s AS (
  SELECT user_id, median(value) AS med, max(value) AS mx, min(value) AS mn
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
  CASE WHEN s.mx = s.mn THEN 0.0
       ELSE (e.value - s.med) / (s.mx - s.mn) END AS norm_value
FROM events e JOIN s USING (user_id)
"""


@query(
    "pandas_minmax_norm",
    oracle=_NORM_ORACLE,
    tags=("udf", "applyInPandas", "python"),
    decimal_faithful=False,
)
def pandas_minmax_norm(spark, sf_dir):
    import pandas as pd

    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["value"].median()  # (a+b)/2 on even counts, same as DuckDB
        mx, mn = pdf["value"].max(), pdf["value"].min()
        rng = mx - mn
        norm = (pdf["value"] - med) / rng if rng != 0 else 0.0 * pdf["value"]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"],
             "norm_value": norm}
        )

    return ev.groupBy("user_id").applyInPandas(
        _norm, "event_id bigint, user_id bigint, norm_value double"
    )


# --- kmeans_lloyd_assign: iterative Lloyd clustering over embeddings --------
# Beyond-reference iterative algorithm on the DataFrame API: k seeded
# centroids (first k vectors by vec_id), N unrolled Lloyd iterations, final
# assignment with exact integer distances.  Assignment uses the packed-
# broadcast zip_with shape (zero shuffle on the corpus); recomputation is a
# (cluster, dim) aggregation — the one genuinely necessary shuffle, map-side
# combined.

_KMEANS_K = 8
_KMEANS_ITERS = 2


def _kmeans_oracle() -> str:
    from zeta_etl_spark.operators.vectors import SCALE

    scaled = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} "
        "+ 0.5) AS BIGINT))"
    )
    # one assignment round against centroid table {cl, dim, cv}
    def assign_cte(cent: str, out: str) -> str:
        return f"""
{out}_d AS (
  SELECT e.vec_id, c.cl,
    SUM((e.v - c.cv) * (e.v - c.cv)) AS dist2
  FROM ex e JOIN {cent} c ON e.dim = c.dim GROUP BY 1, 2
), {out} AS (
  SELECT vec_id, cl, dist2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cl) AS rn FROM {out}_d
  ) WHERE rn = 1
)"""

    def recompute_cte(assign: str, out: str) -> str:
        return f"""
{out} AS (
  SELECT a.cl, e.dim,
    CAST(floor(CAST(SUM(e.v) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
  FROM ex e JOIN {assign} a USING (vec_id) GROUP BY 1, 2
)"""

    return f"""
WITH emb AS (
  SELECT vec_id, {scaled} AS sv FROM embeddings
), ex AS (
  SELECT vec_id, CAST(i AS BIGINT) AS dim, sv[CAST(i AS INT)] AS v
  FROM emb CROSS JOIN range(1, 65) t(i)
), cent0 AS (
  SELECT vec_id AS cl, dim, v AS cv FROM ex WHERE vec_id < {_KMEANS_K}
), {assign_cte("cent0", "a1")}, {recompute_cte("a1", "cent1")},
{assign_cte("cent1", "a2")}, {recompute_cte("a2", "cent2")},
{assign_cte("cent2", "afinal")}
SELECT vec_id, cl AS cluster, CAST(dist2 AS BIGINT) AS dist2 FROM afinal
"""


@query(
    "kmeans_lloyd_assign",
    oracle=_kmeans_oracle(),
    tags=("vectors", "kmeans", "iterative"),
)
def kmeans_lloyd_assign(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    # seeded init: the first k vectors ARE the centroids
    cent = (
        emb.filter(F.col("vec_id") < _KMEANS_K)
        .select(F.col("vec_id").alias("cl"), F.col("sv").alias("cv_arr"))
    )

    def packed(c):
        return c.agg(F.array_sort(F.collect_list(F.struct("cl", "cv_arr"))).alias("cents"))

    dists_sorted = (
        "array_sort(transform(cents, c -> struct("
        "aggregate(zip_with(sv, c.cv_arr, (x, y) -> (x - y) * (x - y)), 0L, "
        "(a, v) -> a + v) AS dist2, c.cl AS cl)))"
    )

    def assign(c):
        best = F.expr("element_at(" + dists_sorted + ", 1)")
        return (
            emb.transform(with_scalar_frame(packed(c)))
            .withColumn("_b", best)
            .select(
                "vec_id",
                "sv",
                F.col("_b.cl").alias("cluster"),
                F.col("_b.dist2").alias("dist2"),
            )
        )

    def recompute(assigned):
        ex = assigned.select(
            "cluster", F.posexplode("sv").alias("pos", "v")
        ).withColumn("dim", (F.col("pos") + 1).cast("bigint"))
        per_dim = ex.groupBy("cluster", "dim").agg(
            F.floor(
                F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cv")
        )
        return (
            per_dim.groupBy(F.col("cluster").alias("cl"))
            .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("_s"))
            .select("cl", F.expr("transform(_s, s -> s.cv)").alias("cv_arr"))
        )

    for _ in range(_KMEANS_ITERS):
        cent = recompute(assign(cent))
    final = assign(cent)
    return final.select(
        "vec_id",
        F.col("cluster"),
        F.col("dist2").cast("bigint").alias("dist2"),
    )


# --- minmax_norm_sql: the codegen twin of pandas_minmax_norm ----------------
# Same semantics, same oracle — pure JVM plan (groupBy stats + broadcast
# join + elementwise projection).  Exists to measure the Python-path tax:
# bench runs both; the pandas variant is the deliberate slow-path demo
# (brief: "UDFs are the slow path"), this is what the engine does when the
# logic is expressible relationally.


@query(
    "minmax_norm_sql",
    oracle=_NORM_ORACLE,
    tags=("window", "norm", "codegen-twin"),
    decimal_faithful=False,
)
def minmax_norm_sql(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "value")
    stats = ev.groupBy("user_id").agg(
        F.median("value").alias("med"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
    )
    return ev.join(F.broadcast(stats), "user_id").select(
        "event_id",
        "user_id",
        F.when(F.col("mx") == F.col("mn"), F.lit(0.0))
        .otherwise((F.col("value") - F.col("med")) / (F.col("mx") - F.col("mn")))
        .alias("norm_value"),
    )


# --- linear_trend_per_user: exact least-squares regression on DataFrames ----
# Per-user OLS over (hour index, hourly value): slope/intercept from the
# closed form using ONLY exact accumulators — x is a small int (hours since
# the user's first hour), y stays DECIMAL, so nΣxy − ΣxΣy and nΣx² − (Σx)²
# are exact; the single double division at the end is IEEE-deterministic.
# (Never divide DECIMAL by DECIMAL cross-engine — result scale/rounding is
# engine-specific; cast both operands to double first.)

_TREND_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
    SUM(CAST(value AS DECIMAL(18,6))) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT user_id, y,
    date_diff('hour', MIN(h) OVER (PARTITION BY user_id), h) AS x
  FROM hourly
), s AS (
  SELECT user_id,
    COUNT(*) AS n,
    SUM(x) AS sx,
    SUM(x * x) AS sxx,
    SUM(y) AS sy,
    SUM(y * x) AS sxy
  FROM idx GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_hours,
  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       ELSE (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
            / CAST(n AS DOUBLE) END AS intercept
FROM s
"""


@query(
    "linear_trend_per_user",
    oracle=_TREND_ORACLE,
    tags=("agg", "regression", "ml"),
)
def linear_trend_per_user(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.col("value").cast("DECIMAL(18,6)")).alias("y"))
    w = Window.partitionBy("user_id")
    epoch_h = F.unix_timestamp(F.col("h").cast("timestamp")) / 3600
    idx = hourly.withColumn(
        "x", (epoch_h - F.min(epoch_h).over(w)).cast("bigint")
    )
    s = idx.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / denom.cast("double")
    slope = F.when(denom == 0, F.lit(None)).otherwise(slope)
    intercept = F.when(denom == 0, F.lit(None)).otherwise(
        (
            F.col("sy").cast("double")
            - slope * F.col("sx").cast("double")
        )
        / F.col("n").cast("double")
    )
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_hours"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


# --- exact_variance_per_user: order-independent variance/stddev -------------
# Naive var_pop/stddev over doubles is summation-order-dependent (Welford or
# not, partial aggregation reorders terms); this computes
# var = (nΣx² − (Σx)²) / n² from EXACT integer accumulators (value has ≤2
# decimals → ×100 is exact) so the result is bit-identical under any
# partitioning AND across engines.  sqrt is IEEE-deterministic.

_VAR_ORACLE = """
WITH s AS (
  SELECT user_id,
    COUNT(*) AS n,
    SUM(CAST(round(value * 100) AS BIGINT)) AS sx,
    SUM(CAST(round(value * 100) AS BIGINT)
        * CAST(round(value * 100) AS BIGINT)) AS sxx
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
  CAST(sx AS DOUBLE) / (100.0 * n) AS mean_value,
  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    / (10000.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_pop,
  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (10000.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS stddev_pop
FROM s
"""


@query(
    "exact_variance_per_user",
    oracle=_VAR_ORACLE,
    tags=("agg", "variance", "deterministic"),
)
def exact_variance_per_user(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    # floor(x*100 + 0.5) == round for the non-negative 2-decimal values here,
    # and floor avoids rounding-mode ambiguity (engine-wide rule)
    xi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(xi * xi).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxx").cast("double") - (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    var = num / (F.lit(10000.0) * nd * nd)
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("sx").cast("double") / (F.lit(100.0) * F.col("n"))).alias(
            "mean_value"
        ),
        var.alias("var_pop"),
        F.sqrt(var).alias("stddev_pop"),
    )


# --- value_histogram: fixed-width bucketed distribution ---------------------
# The histogram/width_bucket shape dashboards need: per-event-type counts in
# fixed 5-unit buckets plus bucket share.  Bucket index is exact integer
# floor division; shares are one double division of exact counts.

_HIST_ORACLE = """
WITH b AS (
  SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, SUM(n) AS total FROM b GROUP BY 1
)
SELECT b.event_type, b.bucket,
  b.bucket * 5.0 AS bucket_lo,
  CAST(b.n AS BIGINT) AS n,
  CAST(b.n AS DOUBLE) / tot.total AS share
FROM b JOIN tot USING (event_type)
"""


@query("value_histogram", oracle=_HIST_ORACLE, tags=("agg", "histogram"))
def value_histogram(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 5.0).cast("bigint").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = b.groupBy("event_type").agg(F.sum("n").alias("total"))
    return b.join(tot, "event_type").select(
        "event_type",
        "bucket",
        (F.col("bucket") * 5.0).alias("bucket_lo"),
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("total")).alias("share"),
    )


# --- user_value_gini: exact Gini concentration coefficient ------------------
# How concentrated is total value across users?  Gini from the rank-weighted
# closed form G = 2·Σ(i·x_(i)) / (n·Σx) − (n+1)/n over values sorted
# ascending — every term an exact integer (values scaled ×100), one double
# division at the end.  The concentration/whale metric every trading and
# token-distribution dashboard carries.

_GINI_ORACLE = """
WITH totals AS (
  SELECT user_id, SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY user_id
), ranked AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, user_id) AS i FROM totals
), s AS (
  SELECT COUNT(*) AS n, SUM(v) AS sv, SUM(i * v) AS siv FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_users,
  CAST(sv AS DOUBLE) / 100.0 AS total_value,
  2.0 * CAST(siv AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE))
    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
"""


@query("user_value_gini", oracle=_GINI_ORACLE, tags=("agg", "gini", "concentration"))
def user_value_gini(spark, sf_dir):
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    xi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    totals = ev.groupBy("user_id").agg(F.sum(xi).alias("v"))
    ranked = totals.withColumn(
        "i", F.row_number().over(W.orderBy(F.col("v"), F.col("user_id")))
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("i") * F.col("v")).alias("siv"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        (F.col("sv").cast("double") / 100.0).alias("total_value"),
        (
            F.lit(2.0) * F.col("siv").cast("double") / (nd * F.col("sv").cast("double"))
            - (nd + 1.0) / nd
        ).alias("gini"),
    )


# --- value_hour_correlation: exact Pearson correlation ----------------------
# Does event value correlate with time of day?  Pearson r per event_type
# from the closed form over exact accumulators (x = hour-of-day 0..23,
# y = value scaled ×100) — same determinism recipe as exact_variance and
# linear_trend: every sum an exact integer, one double expression at the
# end (sqrt is IEEE-deterministic).

_CORR_ORACLE = """
WITH e AS (
  SELECT event_type,
    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
    CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM e GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
  CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN NULL
  ELSE (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
          * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
  END AS pearson_r
FROM s
"""


@query(
    "value_hour_correlation",
    oracle=_CORR_ORACLE,
    tags=("agg", "correlation", "deterministic"),
)
def value_hour_correlation(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    x = F.hour(F.col("ts")).cast("bigint")
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    e = ev.select("event_type", x.alias("x"), y.alias("y"))
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    r = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(vx) * F.sqrt(vy)
    )
    # the zero-variance guard must be EXACT integer arithmetic, but BIGINT
    # overflows at 100x (n·syy ≈ 4e22 at sf10 — found by the sf10 sweep);
    # DuckDB widens SUM/products to HUGEINT silently, Spark needs
    # DECIMAL(38,0) (exact to 1e38, overflow-checked under ANSI)
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    zero = (d38("n") * d38("sxx") - d38("sx") * d38("sx") == 0) | (
        d38("n") * d38("syy") - d38("sy") * d38("sy") == 0
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.when(zero, F.lit(None)).otherwise(r).alias("pearson_r"),
    )


# --- countmin_sketch: Count-Min frequency sketch over user_id ----------------
# The classic streaming frequency sketch (Cormode & Muthukrishnan, public
# method) as a distributed aggregation: depth=4 salted md5 hash rows per
# event, width=256 buckets, one groupBy — the sketch table is depth*width
# cells regardless of stream size, mergeable across partitions/batches by
# cell-wise addition (map-side combine IS the merge).  Point estimates
# (min over depths of the hashed cells) are checked against exact counts in
# tests/test_properties.py: CMS never underestimates and overestimates by
# at most the classic eps*N bound.

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_hex2long

    rows = " UNION ALL ".join(
        f"SELECT {d} AS depth, "
        + duck_hex2long(f"concat('cms{d}:', CAST(user_id AS VARCHAR))", digits=8)
        + f" % {_CMS_WIDTH} AS bucket FROM events"
        for d in range(_CMS_DEPTH)
    )
    return f"""
WITH cells AS ({rows})
SELECT CAST(depth AS BIGINT) AS depth, CAST(bucket AS BIGINT) AS bucket,
  COUNT(*) AS cnt
FROM cells GROUP BY depth, bucket
"""


@query("countmin_sketch", oracle=_cms_oracle(), tags=("sketch", "streaming-scale"))
def countmin_sketch(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_hex2long

    e = T(spark, sf_dir, "events")
    depth_rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("bigint").alias("depth"),
                (
                    F.expr(
                        spark_hex2long(
                            f"concat('cms{d}:', cast(user_id as string))",
                            digits=8,
                        )
                    )
                    % _CMS_WIDTH
                ).alias("bucket"),
            )
            for d in range(_CMS_DEPTH)
        ]
    )
    cells = e.select(F.explode(depth_rows).alias("_c")).select(
        F.col("_c.depth").alias("depth"),
        F.col("_c.bucket").cast("bigint").alias("bucket"),
    )
    return cells.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


# --- hll_registers: HyperLogLog register table -------------------------------
# Deterministic HLL (Flajolet et al., public method) with md5 instead of an
# engine-private hash: 256 registers from the low 8 bits of a 60-bit md5
# hash, register value = max leading-zero rank of the remaining 52 bits.
# The register TABLE is the sketch — mergeable by cell-wise MAX, constant
# size for any stream.  bin() (both engines drop leading zeros) gives the
# MSB position without libm logs.  The harmonic-mean estimate is validated
# against exact COUNT(DISTINCT) in tests/test_properties.py (within the
# ~1.04/sqrt(256)=6.5% standard error).

_HLL_B = 8
_HLL_M = 1 << _HLL_B  # 256 registers


def _hll_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_hex2long

    h = duck_hex2long("concat('hll:', CAST(user_id AS VARCHAR))", digits=15)
    return f"""
WITH hashed AS (
  SELECT {h} AS h FROM events
), parts AS (
  SELECT h % {_HLL_M} AS register, h // {_HLL_M} AS rem FROM hashed
)
SELECT CAST(register AS BIGINT) AS register,
  CAST(MAX(CASE WHEN rem = 0 THEN 53 ELSE 53 - length(bin(rem)) END)
    AS BIGINT) AS max_rank
FROM parts GROUP BY register
"""


@query("hll_registers", oracle=_hll_oracle(), tags=("sketch", "distinct"))
def hll_registers(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_hex2long

    e = T(spark, sf_dir, "events")
    h = spark_hex2long("concat('hll:', cast(user_id as string))", digits=15)
    parts = e.select(
        F.expr(f"({h}) % {_HLL_M}").alias("register"),
        F.expr(f"({h}) div {_HLL_M}").alias("rem"),
    )
    rank = F.when(F.col("rem") == 0, 53).otherwise(
        53 - F.length(F.expr("bin(rem)"))
    )
    return parts.groupBy(F.col("register").cast("bigint").alias("register")).agg(
        F.max(rank).cast("bigint").alias("max_rank")
    )


# --- kmv_bottomk: KMV (bottom-k) distinct sketch -----------------------------
# The k minimum hash values of the distinct key set — simultaneously a
# deterministic uniform sample of distinct users AND a distinct-count
# estimator ((k-1) / normalized k-th minimum; validated in tests).  At
# scale this is a per-partition top-k (TakeOrdered shape) — no full sort.

_KMV_K = 64


def _kmv_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_hex2long

    h = duck_hex2long("concat('kmv:', CAST(user_id AS VARCHAR))", digits=15)
    return f"""
WITH hashed AS (
  SELECT DISTINCT user_id, {h} AS hash_val FROM events
)
SELECT user_id, hash_val, CAST(rn AS BIGINT) AS kmv_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY hash_val, user_id) AS rn FROM hashed
) t WHERE rn <= {_KMV_K}
"""


@query("kmv_bottomk", oracle=_kmv_oracle(), tags=("sketch", "distinct", "sample"))
def kmv_bottomk(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from zeta_etl_spark.functions.text import spark_hex2long

    e = T(spark, sf_dir, "events")
    h = spark_hex2long("concat('kmv:', cast(user_id as string))", digits=15)
    hashed = e.select("user_id", F.expr(h).alias("hash_val")).distinct()
    top = hashed.orderBy("hash_val", "user_id").limit(_KMV_K)
    w = W.orderBy("hash_val", "user_id")
    return top.withColumn("kmv_rank", F.row_number().over(w).cast("bigint"))


# --- winsorized_user_stats: robust per-user statistics -----------------------
# Outlier-robust aggregates: clip each user's values at their exact p10/p90
# (rank selection — value at row ceil(q·n), NO percentile interpolation,
# the r3 house rule) and report the winsorized mean next to the raw one.
# Determinism: each clipped double is floor-scaled to BIGINT BEFORE the sum
# (float sums are order-dependent; integer sums are not), one division at
# the end.  Scale shape: two window passes sharing the user_id partition
# key (one Exchange) + one groupBy on the same key.

_WINSOR_ORACLE = """
WITH r AS (
  SELECT user_id, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
), cuts AS (
  SELECT user_id,
    MAX(CASE WHEN rn = (10 * n + 99) // 100 THEN value END) AS p10,
    MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN value END) AS p90
  FROM r GROUP BY user_id
), clipped AS (
  SELECT r.user_id, r.n,
    CAST(floor(LEAST(GREATEST(r.value, c.p10), c.p90) * 1000000 + 0.5)
      AS BIGINT) AS w_scaled,
    CAST(floor(r.value * 1000000 + 0.5) AS BIGINT) AS v_scaled
  FROM r JOIN cuts c ON c.user_id = r.user_id
)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
  CAST(SUM(v_scaled) AS BIGINT) AS raw_sum_e6,
  CAST(SUM(w_scaled) AS BIGINT) AS winsor_sum_e6,
  CAST(SUM(w_scaled) AS DOUBLE) / (1000000.0 * MAX(n)) AS winsor_mean
FROM clipped GROUP BY user_id
"""


@query(
    "winsorized_user_stats",
    oracle=_WINSOR_ORACLE,
    tags=("analytics", "robust", "quantile"),
)
def winsorized_user_stats(spark, sf_dir):
    e = T(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id")
    r = e.select(
        "user_id",
        "value",
        # asc_nulls_last pins Spark to DuckDB's default ASC NULLS LAST
        # (Spark defaults nulls FIRST — latent rank shift if value is ever
        # NULL; same trap class as ROUND_NOTES lesson 2)
        F.row_number()
        .over(
            w.orderBy(
                F.col("value").asc_nulls_last(),
                F.col("event_id").asc_nulls_last(),
            )
        )
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    cuts = r.groupBy("user_id").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(10 * n + 99) div 100"), F.col("value"))
        ).alias("p10"),
        F.max(
            F.when(F.col("rn") == F.expr("(90 * n + 99) div 100"), F.col("value"))
        ).alias("p90"),
    )
    clipped = r.join(cuts, "user_id").select(
        "user_id",
        "n",
        F.expr(
            "cast(floor(least(greatest(value, p10), p90) * 1000000 + 0.5) "
            "as bigint)"
        ).alias("w_scaled"),
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias(
            "v_scaled"
        ),
    )
    return clipped.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.sum("v_scaled").cast("bigint").alias("raw_sum_e6"),
        F.sum("w_scaled").cast("bigint").alias("winsor_sum_e6"),
        (
            F.sum("w_scaled").cast("double")
            / (F.lit(1000000.0) * F.max("n"))
        ).alias("winsor_mean"),
    )


# --- hll_rolling_registers: mergeable-sketch rollup over time windows --------
# How 100 TB distinct-count rollups actually run: per-hour HLL register
# tables are the PRE-AGGREGATE (tiny, mergeable), and any window's distinct
# estimate is a cell-wise MAX merge of the hours it covers — the raw events
# are scanned once ever.  Here: per-(day, register) sketches merged into
# 3-day rolling sketches via an integer MAX over a range window — no float
# anywhere in the merged output (the harmonic estimate stays in pytest,
# same as hll_registers).  Scale shape: sketch rows are days × 256 — the
# window input is sketch-sized, never event-sized.

def _hll_rolling_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_hex2long

    h = duck_hex2long("concat('hll:', CAST(user_id AS VARCHAR))", digits=15)
    return f"""
WITH hashed AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         {h} AS h
  FROM events
), parts AS (
  SELECT day, h % {_HLL_M} AS register, h // {_HLL_M} AS rem FROM hashed
), daily AS (
  SELECT day, CAST(register AS BIGINT) AS register,
    CAST(MAX(CASE WHEN rem = 0 THEN 53 ELSE 53 - length(bin(rem)) END)
      AS BIGINT) AS max_rank
  FROM parts GROUP BY day, register
), grid AS (
  -- densify: a register hit on D-1/D-2 but not on D must still appear in
  -- day D's merged sketch (sparse data otherwise silently undercounts)
  SELECT d.day, CAST(r.register AS BIGINT) AS register
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT unnest(range(256)) AS register) r
), merged AS (
  SELECT g.day, g.register,
    MAX(dl.max_rank) OVER (
      PARTITION BY g.register ORDER BY g.day
      RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW
    ) AS rolling_max_rank
  FROM grid g
  LEFT JOIN daily dl ON dl.day = g.day AND dl.register = g.register
)
SELECT day, register, CAST(rolling_max_rank AS BIGINT) AS rolling_max_rank
FROM merged WHERE rolling_max_rank IS NOT NULL
"""


@query(
    "hll_rolling_registers",
    oracle=_hll_rolling_oracle(),
    tags=("sketch", "distinct", "rolling"),
)
def hll_rolling_registers(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_hex2long

    e = T(spark, sf_dir, "events")
    h = spark_hex2long("concat('hll:', cast(user_id as string))", digits=15)
    parts = e.select(
        F.expr("cast(date_trunc('day', ts) as date)").alias("day"),
        F.expr(f"({h}) % {_HLL_M}").alias("register"),
        F.expr(f"({h}) div {_HLL_M}").alias("rem"),
    )
    rank = F.when(F.col("rem") == 0, 53).otherwise(
        53 - F.length(F.expr("bin(rem)"))
    )
    daily = parts.groupBy(
        "day", F.col("register").cast("bigint").alias("register")
    ).agg(F.max(rank).cast("bigint").alias("max_rank"))
    # densify to the full day x register grid before the window: a register
    # hit on D-1/D-2 but not on D must still appear in day D's merged
    # sketch (review finding: sparse data silently undercounted; window MAX
    # ignores the grid's nulls, absent-everywhere cells are dropped after)
    grid = (
        daily.select("day")
        .distinct()
        .crossJoin(
            spark.range(_HLL_M).select(
                F.col("id").cast("bigint").alias("register")
            )
        )
    )
    dense = grid.join(daily, ["day", "register"], "left")
    w = (
        Window.partitionBy("register")
        .orderBy(F.expr("cast(day as timestamp)").cast("long"))
        .rangeBetween(-2 * 86400, 0)
    )
    return (
        dense.select(
            "day",
            "register",
            F.max("max_rank").over(w).cast("bigint").alias(
                "rolling_max_rank"
            ),
        )
        .filter(F.col("rolling_max_rank").isNotNull())
    )


# --- heavy_hitters_2pass: sketch-guided exact heavy hitters ------------------
# The scale-honest heavy-hitter pattern: pass 1 builds the Count-Min sketch
# (256×4 cells, broadcastable); pass 2 filters each event ROW by its key's
# sketch estimate BEFORE the shuffle — CMS never underestimates, so no true
# heavy hitter is lost — and the exact groupBy + HAVING runs over candidate
# rows only.  At 100 TB the shuffle carries the few hot keys' rows instead
# of the full keyspace, and the final output is EXACT (the oracle is the
# plain exact aggregation; the sketch is invisible in the result, which is
# the point).  Threshold: 1.1× the mean events-per-user (the synthetic
# distribution is near-uniform — min 49 / mean 67 / max 86 per user at
# sf0.01 — so a 1.5× cut matches nothing), integer-derived.

def _hh_threshold_sql() -> str:
    # (11 * total) div (10 * n_users): 1.1× the mean — same integer
    # arithmetic both engines, computed from the data so the query is
    # scale-free.  nullif guards the empty-events case: ANSI mode raises on
    # division by zero where the oracle's HAVING simply never evaluates; a
    # NULL threshold filters every row, matching the oracle's empty result.
    return "(11 * total) div (10 * nullif(n_users, 0))"


_HH_ORACLE = """
WITH stats AS (
  SELECT COUNT(*) AS total, COUNT(DISTINCT user_id) AS n_users FROM events
)
SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e CROSS JOIN stats s
GROUP BY e.user_id, s.total, s.n_users
HAVING COUNT(*) >= (11 * s.total) // (10 * s.n_users)
"""


@query(
    "heavy_hitters_2pass",
    oracle=_HH_ORACLE,
    tags=("sketch", "skew", "heavy-hitters"),
)
def heavy_hitters_2pass(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_hex2long

    e = T(spark, sf_dir, "events").select("user_id")
    # pass 1: the sketch (cells) + scalar threshold, both broadcastable
    cells_df = countmin_sketch(spark, sf_dir)
    depth_maps = cells_df.groupBy("depth").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "cnt"))
        ).alias("m")
    )
    packed = depth_maps.agg(
        F.map_from_entries(
            F.collect_list(F.struct("depth", "m"))
        ).alias("mm")
    ).select(
        *[
            F.expr(
                f"transform(sequence(0, {_CMS_WIDTH - 1}), "
                f"b -> coalesce(try_element_at(try_element_at(mm, "
                f"cast({d} as bigint)), cast(b as bigint)), 0L))"
            ).alias(f"cells_{d}")
            for d in range(_CMS_DEPTH)
        ]
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("user_id").alias("n_users"),
    ).select(F.expr(_hh_threshold_sql()).alias("threshold"))
    # pass 2: per-row estimate = min over depths of the key's cells.  The
    # sketch is packed into DENSE per-depth arrays (one tiny row), so each
    # event row costs depth O(1) array-index lookups instead of
    # lambda-scanning the full cell list per row (review finding: the
    # pre-shuffle scan is the hot path this query exists to keep cheap).
    est_terms = ", ".join(
        "element_at(cells_{d}, cast(({h}) % {w} as int) + 1)".format(
            d=d,
            w=_CMS_WIDTH,
            h=spark_hex2long(
                f"concat('cms{d}:', cast(user_id as string))", digits=8
            ),
        )
        for d in range(_CMS_DEPTH)
    )
    est = F.expr(f"least({est_terms})")
    candidates = (
        e.transform(with_scalar_frame(packed))
        .transform(with_scalar_frame(stats))
        .filter(est >= F.col("threshold"))
        .select("user_id", "threshold")
    )
    return (
        candidates.groupBy("user_id", "threshold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .filter(F.col("n_events") >= F.col("threshold"))
        .select("user_id", "n_events")
    )
