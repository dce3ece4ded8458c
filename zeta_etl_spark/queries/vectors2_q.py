"""Embedding-quality diagnostics: per-label cluster cohesion.

A labeled embedding table (here: ``embeddings.label``, the synthetic class
id) is the shape of every curated training set with taxonomy tags; cohesion
— how tightly each label's vectors hug their own centroid — is the standard
"are these labels worth training on" screen.

Determinism: cosine against the centroid is computed WITHOUT dividing the
centroid by the member count — cosine is scale-invariant, so the integer
centroid SUM vector stands in for the mean and the dot product stays exact
BIGINT arithmetic.  Each per-row cosine (IEEE double, identical expression
tree both engines) is floor-scaled to BIGINT *before* the per-label mean
(float sums are order-dependent; integer sums are not), and the final mean
is one integer division — Spark ``div`` and DuckDB ``//`` both truncate
toward zero, negatives included (verified empirically).

Overflow bound: dot(sv, centroid_sum) <= dims * SCALE^2 * n_members =
64e12 * n — safe to ~1.4e5 members per label at SCALE=1e6; beyond that,
shard the label or drop SCALE one decade.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.operators.vectors import SCALE
from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.queries.vectors_q import _DUCK_SCALED

_COS_SCALE = 10**9


def _cohesion_oracle() -> str:
    scaled = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}"
        " + 0.5) AS BIGINT))"
    )
    return f"""
WITH emb AS (
  SELECT vec_id, label, {scaled} AS sv FROM embeddings
), ex AS (
  SELECT label, CAST(i AS BIGINT) AS dim, sv[CAST(i AS INT)] AS v
  FROM emb CROSS JOIN range(1, 65) t(i)
), cs AS (
  SELECT label, dim, CAST(SUM(v) AS BIGINT) AS c FROM ex GROUP BY 1, 2
), cent AS (
  SELECT label, list(c ORDER BY dim) AS cs_arr FROM cs GROUP BY label
), cn AS (
  SELECT label, cs_arr,
    CAST(list_sum(list_transform(cs_arr, x -> x * x)) AS BIGINT) AS cnorm2
  FROM cent
), scored AS (
  SELECT e.vec_id, e.label,
    CAST(floor({_COS_SCALE} * (
      CAST(list_sum(list_transform(range(1, 65),
        i -> e.sv[CAST(i AS INT)] * c.cs_arr[CAST(i AS INT)])) AS DOUBLE)
      / (sqrt(CAST(list_sum(list_transform(e.sv, x -> x * x)) AS DOUBLE))
         * sqrt(CAST(c.cnorm2 AS DOUBLE)))
    ) + 0.5) AS BIGINT) AS cos_e9
  FROM emb e JOIN cn c ON c.label = e.label
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(cos_e9) AS BIGINT) // COUNT(*) AS mean_cos_e9,
  MIN(cos_e9) AS min_cos_e9, MAX(cos_e9) AS max_cos_e9
FROM scored GROUP BY label
"""


@query(
    "cluster_cohesion",
    oracle=_cohesion_oracle(),
    tags=("vectors", "quality", "diagnostic"),
)
def cluster_cohesion(spark, sf_dir):
    """Scale shape: centroid sums are a 64x-row explode aggregated down to
    (n_labels x 64) and packed to one array per label — a tiny broadcast
    frame; every full-width row is touched exactly once in the scoring join
    (no pairwise work, no corpus shuffle)."""
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    ex = emb.select("label", F.posexplode("sv").alias("pos", "v"))
    cs = ex.groupBy("label", "pos").agg(F.sum("v").alias("c"))
    cent = (
        cs.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("_s"))
        .select("label", F.expr("transform(_s, s -> s.c)").alias("cs_arr"))
        .withColumn(
            "cnorm2",
            F.expr(
                "aggregate(zip_with(cs_arr, cs_arr, (x, y) -> x * y), 0L,"
                " (a, v) -> a + v)"
            ),
        )
    )
    dot = F.expr(
        "aggregate(zip_with(sv, cs_arr, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("norm2").cast("double"))
        * F.sqrt(F.col("cnorm2").cast("double"))
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.floor(F.lit(_COS_SCALE) * cos + F.lit(0.5))
        .cast("bigint")
        .alias("cos_e9"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.expr("sum(cos_e9) div count(1)").alias("mean_cos_e9"),
        F.min("cos_e9").alias("min_cos_e9"),
        F.max("cos_e9").alias("max_cos_e9"),
    )


# --- hard_negative_candidates: contrastive-training negative mining ----------
# Embedding-model training needs HARD negatives: for each query vector, the
# most-similar vectors that carry a DIFFERENT label (easy negatives are
# random; hard ones share the query's LSH bucket yet belong to another
# class).  Scale shape: the same 6-plane LSH bucket equi-join as the
# similarity-graph seam (never all-pairs; planes scale with log2(n) — see
# PERF.md round-5), label inequality pushed into the join, exact integer
# cosine on candidates only, per-query top-5 via row_number.

_HN_PLANES = 6
_HN_K = 5


def _hard_negative_oracle() -> str:
    from zeta_etl_spark.operators.vectors import (
        duck_hyperplane_bucket_sql,
        hyperplane_params,
    )

    bucket = duck_hyperplane_bucket_sql(hyperplane_params(_HN_PLANES, 64))
    scaled = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}"
        " + 0.5) AS BIGINT))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, label, {scaled} AS sv FROM embeddings
), n AS (
  SELECT vec_id, label, sv,
    list_sum(list_transform(sv, x -> x * x)) AS norm2,
    {bucket} AS bucket
  FROM e
), q AS (
  SELECT vec_id AS query_id, label AS qlabel, sv AS qv, norm2 AS qn, bucket
  FROM n WHERE vec_id < 10
), p AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neg_label,
    CAST(list_sum(list_transform(range(1, 65),
      i -> q.qv[CAST(i AS INT)] * c.sv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM q JOIN n c ON c.bucket = q.bucket
    AND c.label <> q.qlabel AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(neg_label AS BIGINT) AS neg_label,
       cosine, CAST(rn AS BIGINT) AS neg_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM p
) t WHERE rn <= {_HN_K}
"""


@query(
    "hard_negative_candidates",
    oracle=_hard_negative_oracle(),
    tags=("vectors", "contrastive", "lsh"),
)
def hard_negative_candidates(spark, sf_dir):
    from pyspark.sql.window import Window

    from zeta_etl_spark.operators.vectors import (
        hyperplane_params,
        lsh_bucket,
        scaled_vectors,
    )

    planes = hyperplane_params(_HN_PLANES, 64)
    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).withColumn(
        "_bucket", lsh_bucket("sv", planes)
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
        "_bucket",
    )
    dot = F.expr(
        "aggregate(zip_with(qv, sv, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("norm2").cast("double")),
        F.lit(0.0),
    )
    pairs = (
        F.broadcast(q)
        .join(emb, "_bucket")
        .filter(
            (F.col("label") != F.col("qlabel"))
            & (F.col("vec_id") != F.col("query_id"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").cast("bigint").alias("neg_label"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= _HN_K)
    )


# --- embedding_drift_ab: centroid shift between deterministic halves ---------
# Embedding-space drift detection: per label, the squared L2 distance
# between the centroid of the EVEN-id half and the ODD-id half — the
# monitoring statistic for "did the encoder (or the data) move?".  On the
# deterministic split the halves are exchangeable, so shift² ≈ 2·σ²/n per
# dim is pure sampling noise — the baseline a real drift alarm thresholds
# against.  All arithmetic is the registry's scaled-integer vector idiom:
# per-dim sums are exact BIGINTs, each centroid rounds ONCE to the scaled
# grid, and the shift is an integer sum of squared differences.  Scale:
# explode ×64 dims, one (label, dim) partial-agg shuffle, 64·|labels|
# rows thereafter.

_DRIFT_ORACLE = f"""
WITH e AS (
  SELECT vec_id % 2 AS half, label, {_DUCK_SCALED} AS sv FROM embeddings
), per AS (
  SELECT label, CAST(i AS BIGINT) AS dim, half,
    CAST(floor(CAST(SUM(sv[CAST(i AS INT)]) AS DOUBLE)
               / ({SCALE}.0 * COUNT(*)) * {SCALE} + 0.5) AS BIGINT) AS cv,
    COUNT(*) AS n
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i, half
), wide AS (
  SELECT label, dim,
    MAX(CASE WHEN half = 0 THEN cv END) AS cv_even,
    MAX(CASE WHEN half = 1 THEN cv END) AS cv_odd,
    MAX(CASE WHEN half = 0 THEN n END) AS n_even,
    MAX(CASE WHEN half = 1 THEN n END) AS n_odd
  FROM per GROUP BY label, dim
)
SELECT CAST(label AS BIGINT) AS label,
  CAST(MIN(n_even) AS BIGINT) AS n_even,
  CAST(MIN(n_odd) AS BIGINT) AS n_odd,
  CAST(SUM((cv_even - cv_odd) * (cv_even - cv_odd)) AS BIGINT) AS shift2
FROM wide
GROUP BY label
"""


@query("embedding_drift_ab", oracle=_DRIFT_ORACLE, tags=("vectors", "drift"))
def embedding_drift_ab(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select(
        (F.col("vec_id") % 2).alias("half"), "label",
        F.posexplode("sv").alias("dim0", "v"),
    )
    per = emb.groupBy("label", (F.col("dim0") + 1).alias("dim"), "half").agg(
        F.expr(
            f"cast(floor(cast(sum(v) as double)"
            f" / ({SCALE}.0 * count(*)) * {SCALE} + 0.5) as bigint)"
        ).alias("cv"),
        F.count(F.lit(1)).alias("n"),
    )
    wide = per.groupBy("label", "dim").agg(
        F.max(F.when(F.col("half") == 0, F.col("cv"))).alias("cv_even"),
        F.max(F.when(F.col("half") == 1, F.col("cv"))).alias("cv_odd"),
        F.max(F.when(F.col("half") == 0, F.col("n"))).alias("n_even"),
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("n_odd"),
    )
    diff = F.col("cv_even") - F.col("cv_odd")
    return wide.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.min("n_even").cast("bigint").alias("n_even"),
        F.min("n_odd").cast("bigint").alias("n_odd"),
        F.sum(diff * diff).cast("bigint").alias("shift2"),
    )
