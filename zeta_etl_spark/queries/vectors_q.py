"""Similarity-search queries over the `embeddings` table: brute-force cosine
top-k ANN baseline, per-label centroids, IVF-style nearest-centroid
assignment (BASELINE.json north star operators).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.operators.vectors import (
    SCALE,
    cosine_topk,
    label_centroids,
    nearest_centroid,
    scaled_vectors,
)
from zeta_etl_spark.queries.registry import T, query

_DUCK_SCALED = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) "
    "AS BIGINT))"
)

# --- knn_cosine_top5 --------------------------------------------------------

_KNN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_SCALED} AS sv FROM embeddings
), n AS (
  SELECT vec_id, sv,
         list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), q AS (
  SELECT vec_id AS query_id, sv AS qv, norm2 AS qn FROM n WHERE vec_id < 10
), p AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
    CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                 i -> q.qv[i] * n.sv[i])) AS DOUBLE)
      / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(n.norm2 AS DOUBLE)), 0.0)
      AS cosine
  FROM q JOIN n ON n.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM p
) t WHERE rn <= 5
"""


@query("knn_cosine_top5", oracle=_KNN_ORACLE, tags=("vectors", "ann", "knn"))
def knn_cosine_top5(spark, sf_dir):
    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    return cosine_topk(emb, queries, k=5)


# --- embedding_centroids ----------------------------------------------------

_CENTROID_ORACLE = f"""
WITH e AS (
  SELECT label, {_DUCK_SCALED} AS sv FROM embeddings
)
SELECT label, CAST(i AS BIGINT) AS dim,
  CAST(SUM(sv[CAST(i AS INT)]) AS DOUBLE) / ({SCALE}.0 * COUNT(*)) AS centroid,
  COUNT(*) AS n_vectors
FROM e CROSS JOIN range(1, 65) t(i)
GROUP BY label, i
"""


@query("embedding_centroids", oracle=_CENTROID_ORACLE, tags=("vectors", "centroid"))
def embedding_centroids(spark, sf_dir):
    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    return label_centroids(emb)


# --- nearest_centroid_assign: IVF coarse-quantizer assignment ---------------

_ASSIGN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, {_DUCK_SCALED} AS sv FROM embeddings
), cent AS (
  SELECT label AS cand_label, CAST(i AS BIGINT) AS dim,
    CAST(floor(CAST(SUM(sv[CAST(i AS INT)]) AS DOUBLE)
               / ({SCALE}.0 * COUNT(*)) * {SCALE} + 0.5) AS BIGINT) AS cv
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i
), ex AS (
  SELECT vec_id, label AS true_label, CAST(i AS BIGINT) AS dim,
         sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, 65) t(i)
), dists AS (
  SELECT ex.vec_id, ex.true_label, cent.cand_label,
         CAST(SUM((ex.v - cent.cv) * (ex.v - cent.cv)) AS BIGINT) AS dist2
  FROM ex JOIN cent ON ex.dim = cent.dim
  GROUP BY 1, 2, 3
)
SELECT vec_id, true_label, cand_label AS assigned_label, dist2,
  CAST(CASE WHEN true_label = cand_label THEN 1 ELSE 0 END AS BIGINT)
    AS is_correct
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dist2, cand_label) AS rn
  FROM dists
) t WHERE rn = 1
"""


@query("nearest_centroid_assign", oracle=_ASSIGN_ORACLE, tags=("vectors", "ivf"))
def nearest_centroid_assign(spark, sf_dir):
    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb)
    return nearest_centroid(emb, cents)


# --- ann_lsh_top5: LSH-bucketed approximate nearest neighbors ---------------
# The 100 TB scale path for knn_cosine_top5: random-hyperplane buckets turn
# the brute-force cross join into a bucket equi-join.  Integer hyperplanes +
# integer-scaled vectors keep bucket assignment bit-identical in the oracle.

_N_PLANES = 8


def _ann_oracle() -> str:
    from zeta_etl_spark.operators.vectors import (
        duck_hyperplane_bucket_sql,
        hyperplane_params,
    )

    bucket = duck_hyperplane_bucket_sql(hyperplane_params(_N_PLANES, 64))
    return f"""
WITH e AS (
  SELECT vec_id, {_DUCK_SCALED} AS sv FROM embeddings
), n AS (
  SELECT vec_id, sv,
         list_sum(list_transform(sv, x -> x * x)) AS norm2,
         {bucket} AS bucket
  FROM e
), q AS (
  SELECT vec_id AS query_id, sv AS qv, norm2 AS qn, bucket AS qbucket
  FROM n WHERE vec_id < 10
), p AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
    CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                 i -> q.qv[i] * n.sv[i])) AS DOUBLE)
      / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(n.norm2 AS DOUBLE)), 0.0)
      AS cosine
  FROM q JOIN n ON n.bucket = q.qbucket AND n.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM p
) t WHERE rn <= 5
"""


@query("ann_lsh_top5", oracle=_ann_oracle(), tags=("vectors", "ann", "lsh"))
def ann_lsh_top5(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import ann_lsh_topk, hyperplane_params

    planes = hyperplane_params(_N_PLANES, 64)
    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    return ann_lsh_topk(emb, queries, planes, k=5)


# --- ivf_cosine_top3: full IVF search (coarse quantizer + nprobe lists) ------
# Corpus partitioned into centroid lists; each query probes its 2 nearest
# centroids and ranks only those lists by exact cosine.

_NPROBE = 2


def _ivf_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, {_DUCK_SCALED} AS sv FROM embeddings
), n AS (
  SELECT vec_id, sv, list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), cent AS (
  SELECT label AS cent_id, CAST(i AS BIGINT) AS dim,
    CAST(floor(CAST(SUM(sv[CAST(i AS INT)]) AS DOUBLE)
               / ({SCALE}.0 * COUNT(*)) * {SCALE} + 0.5) AS BIGINT) AS cv
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i
), ex AS (
  SELECT vec_id, CAST(i AS BIGINT) AS dim, sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, 65) t(i)
), dists AS (
  SELECT ex.vec_id, cent.cent_id,
         SUM((ex.v - cent.cv) * (ex.v - cent.cv)) AS dist2
  FROM ex JOIN cent ON ex.dim = cent.dim
  GROUP BY 1, 2
), corpus_assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cent_id) AS rn FROM dists
  ) WHERE rn = 1
), probe AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cent_id) AS rn FROM dists
  ) WHERE rn <= {_NPROBE} AND vec_id < 10
), pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
    CAST(list_sum(list_transform(range(1, 65),
         i -> nq.sv[CAST(i AS INT)] * nn.sv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(sqrt(CAST(nq.norm2 AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM probe p
  JOIN corpus_assign c ON c.cent_id = p.cent_id
  JOIN n nq ON nq.vec_id = p.query_id
  JOIN n nn ON nn.vec_id = c.vec_id
  WHERE c.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM pairs
) t WHERE rn <= 3
"""


@query("ivf_cosine_top3", oracle=_ivf_oracle(), tags=("vectors", "ann", "ivf"))
def ivf_cosine_top3(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import ivf_topk

    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    corpus = emb.select("vec_id", "sv", "norm2")
    return ivf_topk(corpus, cents, queries, k=3, nprobe=_NPROBE)


# --- sq8_cosine_top5: int8 scalar-quantized ANN (SQ8) ------------------------
# The compression half of planet-scale vector search: per-dim symmetric int8
# quantization (8× memory; the arithmetic an int8 SIMD kernel does), then
# brute-force cosine over the quantized arrays.  Quantized components are
# exact integers (floor-based symmetric rounding), so ranking is
# deterministic cross-engine.

_SQ8_ORACLE = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_SCALED} AS sv FROM embeddings
), ex AS (
  SELECT CAST(i AS BIGINT) AS dim, abs(sv[CAST(i AS INT)]) AS av
  FROM e CROSS JOIN range(1, 65) t(i)
), scales AS (
  SELECT dim, GREATEST(MAX(av), 1) AS vmax FROM ex GROUP BY dim
), vm AS (
  SELECT list(vmax ORDER BY dim) AS vmaxes FROM scales
), q8 AS (
  SELECT vec_id,
    list_transform(range(1, 65), i -> CAST(floor(
      (sv[CAST(i AS INT)] * 127.0) / vmaxes[CAST(i AS INT)] + 0.5)
      AS BIGINT)) AS qv
  FROM e CROSS JOIN vm
), q AS (
  SELECT vec_id AS query_id, qv AS qqv FROM q8 WHERE vec_id < 10
), p AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
    CAST(list_sum(list_transform(range(1, 65),
         i -> q.qqv[CAST(i AS INT)] * n.qv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(
          sqrt(CAST(list_sum(list_transform(q.qqv, x -> x * x)) AS DOUBLE))
          * sqrt(CAST(list_sum(list_transform(n.qv, x -> x * x)) AS DOUBLE)),
          0.0) AS cosine_q
  FROM q JOIN q8 n ON n.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine_q, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_q DESC, neighbor_id) AS rn
  FROM p
) t WHERE rn <= 5
"""


@query("sq8_cosine_top5", oracle=_SQ8_ORACLE, tags=("vectors", "ann", "sq8"))
def sq8_cosine_top5(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import int8_quantize, sq8_topk

    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    q8 = int8_quantize(emb)
    queries = q8.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    corpus = q8.select("vec_id", "qv")
    return sq8_topk(corpus, queries, k=5)


# --- sq8_rerank_top5: two-stage retrieval (SQ8 recall -> exact rerank) -------
# The production answer to SQ8's lossy recall: the quantized index proposes a
# WIDE candidate set (top-20 by quantized cosine — cheap, 8x-compressed
# scan), then only those candidates are re-scored with exact full-precision
# cosine and cut to top-5.  At 100 TB the exact vectors are touched for
# |Q| x 20 rows instead of the whole corpus.

_RERANK_WIDE = 20
_RERANK_K = 5

_SQ8_RERANK_ORACLE = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_SCALED} AS sv FROM embeddings
), ex AS (
  SELECT CAST(i AS BIGINT) AS dim, abs(sv[CAST(i AS INT)]) AS av
  FROM e CROSS JOIN range(1, 65) t(i)
), scales AS (
  SELECT dim, GREATEST(MAX(av), 1) AS vmax FROM ex GROUP BY dim
), vm AS (
  SELECT list(vmax ORDER BY dim) AS vmaxes FROM scales
), q8 AS (
  SELECT vec_id,
    list_transform(range(1, 65), i -> CAST(floor(
      (sv[CAST(i AS INT)] * 127.0) / vmaxes[CAST(i AS INT)] + 0.5)
      AS BIGINT)) AS qv
  FROM e CROSS JOIN vm
), q AS (
  SELECT vec_id AS query_id, qv AS qqv FROM q8 WHERE vec_id < 10
), cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        CAST(list_sum(list_transform(range(1, 65),
             i -> q.qqv[CAST(i AS INT)] * n.qv[CAST(i AS INT)])) AS DOUBLE)
          / NULLIF(
              sqrt(CAST(list_sum(list_transform(q.qqv, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(n.qv, x -> x * x)) AS DOUBLE)),
              0.0) DESC, n.vec_id) AS rn
    FROM q JOIN q8 n ON n.vec_id != q.query_id
  ) t WHERE rn <= {_RERANK_WIDE}
), n2 AS (
  SELECT vec_id, sv, list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), rer AS (
  SELECT c.query_id, c.neighbor_id,
    CAST(list_sum(list_transform(range(1, 65),
         i -> nq.sv[CAST(i AS INT)] * nn.sv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(sqrt(CAST(nq.norm2 AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM cand c
  JOIN n2 nq ON nq.vec_id = c.query_id
  JOIN n2 nn ON nn.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM rer
) t WHERE rn <= {_RERANK_K}
"""


@query(
    "sq8_rerank_top5",
    oracle=_SQ8_RERANK_ORACLE,
    tags=("vectors", "ann", "sq8", "rerank"),
)
def sq8_rerank_top5(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import int8_quantize, sq8_topk

    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    q8 = int8_quantize(emb)
    queries = q8.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    cand = sq8_topk(q8.select("vec_id", "qv"), queries, k=_RERANK_WIDE).select(
        "query_id", "neighbor_id"
    )
    # exact rerank: full-precision vectors joined ONLY for the candidates
    # (shared tail — operators.vectors.exact_rerank_topk)
    from zeta_etl_spark.operators.vectors import exact_rerank_topk

    return exact_rerank_topk(cand, emb, _RERANK_K)


# --- ivf_sq8_rerank_top5: the COMPOSED production ANN stack ------------------
# VERDICT r2 next-2: IVF nprobe pruning x SQ8 quantized scoring x exact
# rerank in ONE plan — the deployment shape for a 100 TB vector corpus.
# Prune: corpus -> nearest centroid list, queries probe 2 lists (broadcast
# packed centroids, zero shuffle).  Score: quantized cosine within probed
# lists only, wide top-20 cut.  Rerank: exact vectors joined for the
# |Q| x 20 candidate rows only, final top-5.  recall@5 vs the exact
# brute-force baseline is asserted in tests/test_scale_ops.py.

_IVF_SQ8_WIDE = 20
_IVF_SQ8_K = 5
# nprobe=4 of 10 lists: on this SYNTHETIC near-unclusterable corpus IVF
# recall roughly equals the probed fraction (measured recall@5: 0.38/0.52/
# 0.68/0.74 at nprobe 2/3/4/5); real embedding corpora cluster, so the same
# nprobe yields far higher recall.  4 keeps the honest recall >= 0.6 while
# still pruning 60% of the quantized scan.
_IVF_SQ8_NPROBE = 4

_IVF_SQ8_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, {_DUCK_SCALED} AS sv FROM embeddings
), n AS (
  SELECT vec_id, sv, list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), cent AS (
  SELECT label AS cent_id, CAST(i AS BIGINT) AS dim,
    CAST(floor(CAST(SUM(sv[CAST(i AS INT)]) AS DOUBLE)
               / ({SCALE}.0 * COUNT(*)) * {SCALE} + 0.5) AS BIGINT) AS cv
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i
), ex AS (
  SELECT vec_id, CAST(i AS BIGINT) AS dim, sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, 65) t(i)
), dists AS (
  SELECT ex.vec_id, cent.cent_id,
         SUM((ex.v - cent.cv) * (ex.v - cent.cv)) AS dist2
  FROM ex JOIN cent ON ex.dim = cent.dim
  GROUP BY 1, 2
), corpus_assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cent_id) AS rn FROM dists
  ) WHERE rn = 1
), probe AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cent_id) AS rn FROM dists
  ) WHERE rn <= {_IVF_SQ8_NPROBE} AND vec_id < 10
), exq AS (
  SELECT CAST(i AS BIGINT) AS dim, abs(sv[CAST(i AS INT)]) AS av
  FROM e CROSS JOIN range(1, 65) t(i)
), scales AS (
  SELECT dim, GREATEST(MAX(av), 1) AS vmax FROM exq GROUP BY dim
), vm AS (
  SELECT list(vmax ORDER BY dim) AS vmaxes FROM scales
), q8 AS (
  SELECT vec_id,
    list_transform(range(1, 65), i -> CAST(floor(
      (sv[CAST(i AS INT)] * 127.0) / vmaxes[CAST(i AS INT)] + 0.5)
      AS BIGINT)) AS qv
  FROM e CROSS JOIN vm
), q AS (
  SELECT vec_id AS query_id, qv AS qqv FROM q8 WHERE vec_id < 10
), cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, ca.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
        CAST(list_sum(list_transform(range(1, 65),
             i -> qq.qqv[CAST(i AS INT)] * n8.qv[CAST(i AS INT)])) AS DOUBLE)
          / NULLIF(
              sqrt(CAST(list_sum(list_transform(qq.qqv, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(n8.qv, x -> x * x)) AS DOUBLE)),
              0.0) DESC, ca.vec_id) AS rn
    FROM probe p
    JOIN corpus_assign ca ON ca.cent_id = p.cent_id
    JOIN q8 n8 ON n8.vec_id = ca.vec_id
    JOIN q qq ON qq.query_id = p.query_id
    WHERE ca.vec_id != p.query_id
  ) t WHERE rn <= {_IVF_SQ8_WIDE}
), rer AS (
  SELECT c.query_id, c.neighbor_id,
    CAST(list_sum(list_transform(range(1, 65),
         i -> nq.sv[CAST(i AS INT)] * nn.sv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(sqrt(CAST(nq.norm2 AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM cand c
  JOIN n nq ON nq.vec_id = c.query_id
  JOIN n nn ON nn.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM rer
) t WHERE rn <= {_IVF_SQ8_K}
"""


@query(
    "ivf_sq8_rerank_top5",
    oracle=_IVF_SQ8_ORACLE,
    tags=("vectors", "ann", "ivf", "sq8", "rerank"),
)
def ivf_sq8_rerank_top5(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import ivf_sq8_rerank_topk

    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    corpus = emb.select("vec_id", "sv", "norm2")
    return ivf_sq8_rerank_topk(
        corpus, cents, queries,
        k=_IVF_SQ8_K, nprobe=_IVF_SQ8_NPROBE, wide=_IVF_SQ8_WIDE,
    )


# --- rrf_fused_top5: reciprocal-rank fusion of two retrieval systems --------
# Hybrid retrieval: the exact brute-force ranking and the LSH-bucketed
# approximate ranking are fused with Reciprocal Rank Fusion
# (score = sum over systems of 1/(60 + rank), Cormack et al. — public
# method).  The reciprocal is computed as floor(1e6 / (60 + rank)) so the
# score is an exact BIGINT in both engines (float reciprocal sums are
# order-dependent); ties break on neighbor_id.  At scale this is the
# standard last-mile combiner over per-system top-k tables — a small
# (|Q| x k per system) full-outer join, never corpus-sized.

_RRF_K = 60
_RRF_SCALE = 1_000_000


def _rrf_oracle() -> str:
    return f"""
WITH k AS (
  SELECT query_id, neighbor_id, knn_rank FROM ({_KNN_ORACLE}) _k
), l AS (
  SELECT query_id, neighbor_id, knn_rank AS lsh_rank FROM ({_ann_oracle()}) _l
), u AS (
  SELECT COALESCE(k.query_id, l.query_id) AS query_id,
         COALESCE(k.neighbor_id, l.neighbor_id) AS neighbor_id,
         COALESCE({_RRF_SCALE} // ({_RRF_K} + k.knn_rank), 0)
           + COALESCE({_RRF_SCALE} // ({_RRF_K} + l.lsh_rank), 0) AS rrf_score
  FROM k FULL OUTER JOIN l
    ON l.query_id = k.query_id AND l.neighbor_id = k.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rrf_score AS BIGINT) AS rrf_score,
  CAST(rn AS BIGINT) AS fused_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, neighbor_id) AS rn
  FROM u
) t WHERE rn <= 5
"""


@query("rrf_fused_top5", oracle=_rrf_oracle(), tags=("vectors", "ann", "fusion"))
def rrf_fused_top5(spark, sf_dir):
    exact = knn_cosine_top5(spark, sf_dir).select(
        "query_id", "neighbor_id", "knn_rank"
    )
    lsh = ann_lsh_top5(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("knn_rank").alias("lsh_rank")
    )
    u = (
        exact.join(lsh, ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.coalesce(
                    F.expr(f"{_RRF_SCALE} div ({_RRF_K} + knn_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lsh_rank)"), F.lit(0)
                )
            )
            .cast("bigint")
            .alias("rrf_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("neighbor_id")
    )
    return (
        u.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("fused_rank") <= 5)
    )


# --- pq_rerank_top5: product quantization ADC + exact rerank -----------------
# The third quantization family next to SQ8 and IVF: 64 float dims compress
# to 4 codebook nibbles + one norm (256x vs float32) — the memory layout a
# 100 TB vector store actually ships.  Scoring is asymmetric distance
# computation: the query stays full-precision, candidates are scored against
# their codebook RECONSTRUCTION via per-subspace dot products (exact integer
# arithmetic, deterministic cross-engine); top-20 per query then reranks
# through full vectors only (candidate-only exact access, same as the
# SQ8/IVF paths).  Codebook = 16 lowest-vec_id corpus subvectors per
# subspace (deterministic seeding; Lloyd refinement is the separately
# verified kmeans_lloyd_assign operator).

_PQ_SUB = 16  # dims per subspace (64 / 4)


def _pq_oracle() -> str:
    sub_tbl = "(SELECT unnest(range(4)) AS s)"
    return f"""
WITH e AS (
  SELECT vec_id, {_DUCK_SCALED} AS sv FROM embeddings
), seeds AS (
  SELECT vec_id, sv, CAST(rn - 1 AS BIGINT) AS code FROM (
    SELECT vec_id, sv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM e
  ) t WHERE rn <= 16
), cb AS (
  SELECT CAST(t.s AS BIGINT) AS s, code,
         sv[t.s * 16 + 1 : t.s * 16 + 16] AS cv
  FROM seeds CROSS JOIN {sub_tbl} t
), cbn AS (
  SELECT s, code, cv,
    CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS n2
  FROM cb
), subv AS (
  SELECT vec_id, CAST(t.s AS BIGINT) AS s,
         sv[t.s * 16 + 1 : t.s * 16 + 16] AS v
  FROM e CROSS JOIN {sub_tbl} t
), codes AS (
  SELECT vec_id, s, code, n2 FROM (
    SELECT subv.vec_id, subv.s, cbn.code, cbn.n2,
      ROW_NUMBER() OVER (PARTITION BY subv.vec_id, subv.s ORDER BY
        list_sum(list_transform(range(1, 17),
          j -> (subv.v[CAST(j AS INT)] - cbn.cv[CAST(j AS INT)])
             * (subv.v[CAST(j AS INT)] - cbn.cv[CAST(j AS INT)]))),
        cbn.code) AS rn
    FROM subv JOIN cbn ON cbn.s = subv.s
  ) t WHERE rn = 1
), recon AS (
  SELECT vec_id, CAST(SUM(n2) AS BIGINT) AS recon2 FROM codes GROUP BY vec_id
), n2t AS (
  SELECT vec_id, sv,
    CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS norm2
  FROM e
), q AS (
  SELECT vec_id AS query_id, sv AS qv, norm2 AS qnorm
  FROM n2t WHERE vec_id < 10
), qsub AS (
  SELECT query_id, CAST(t.s AS BIGINT) AS s,
         qv[t.s * 16 + 1 : t.s * 16 + 16] AS v
  FROM q CROSS JOIN {sub_tbl} t
), adc AS (
  SELECT qs.query_id, c.vec_id,
    CAST(SUM(list_sum(list_transform(range(1, 17),
      j -> qs.v[CAST(j AS INT)] * cb2.cv[CAST(j AS INT)]))) AS BIGINT)
      AS adc_dot
  FROM qsub qs
  JOIN codes c ON c.s = qs.s AND c.vec_id != qs.query_id
  JOIN cbn cb2 ON cb2.s = c.s AND cb2.code = c.code
  GROUP BY qs.query_id, c.vec_id
), cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.query_id, a.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY a.query_id ORDER BY
        CAST(a.adc_dot AS DOUBLE)
          / NULLIF(sqrt(CAST(qd.qnorm AS DOUBLE))
                   * sqrt(CAST(r.recon2 AS DOUBLE)), 0.0) DESC,
        a.vec_id) AS rn
    FROM adc a
    JOIN recon r ON r.vec_id = a.vec_id
    JOIN q qd ON qd.query_id = a.query_id
  ) t WHERE rn <= 20
), rer AS (
  SELECT c.query_id, c.neighbor_id,
    CAST(list_sum(list_transform(range(1, 65),
      i -> nq.sv[CAST(i AS INT)] * nn.sv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(sqrt(CAST(nq.norm2 AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM cand c
  JOIN n2t nq ON nq.vec_id = c.query_id
  JOIN n2t nn ON nn.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM rer
) t WHERE rn <= 5
"""


@query(
    "pq_rerank_top5",
    oracle=_pq_oracle(),
    tags=("vectors", "ann", "pq", "rerank"),
)
def pq_rerank_top5(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import pq_adc_rerank_topk

    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    return pq_adc_rerank_topk(emb, queries, k=5, wide=20)


# --- ivf_pq_rerank_top5: IVF pruning x PQ-ADC scoring x exact rerank --------
# The corpus-scale composition for PQ (PERF.md round-5: flat ADC is linear
# in corpus by design): the 4-nibble code scan covers only the nprobe probed
# lists, exact vectors are touched for |Q| x wide candidates.  Same staging
# as ivf_sq8_rerank_top5 with PQ codes as the compressed representation.

_IVF_PQ_K = 5
_IVF_PQ_WIDE = 20
_IVF_PQ_NPROBE = 4


def _ivf_pq_oracle() -> str:
    sub_tbl = "(SELECT unnest(range(4)) AS s)"
    return f"""
WITH e AS (
  SELECT vec_id, label, {_DUCK_SCALED} AS sv FROM embeddings
), n AS (
  SELECT vec_id, sv, list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), cent AS (
  SELECT label AS cent_id, CAST(i AS BIGINT) AS dim,
    CAST(floor(CAST(SUM(sv[CAST(i AS INT)]) AS DOUBLE)
               / ({SCALE}.0 * COUNT(*)) * {SCALE} + 0.5) AS BIGINT) AS cv
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i
), ex AS (
  SELECT vec_id, CAST(i AS BIGINT) AS dim, sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, 65) t(i)
), dists AS (
  SELECT ex.vec_id, cent.cent_id,
         SUM((ex.v - cent.cv) * (ex.v - cent.cv)) AS dist2
  FROM ex JOIN cent ON ex.dim = cent.dim
  GROUP BY 1, 2
), corpus_assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cent_id) AS rn FROM dists
  ) WHERE rn = 1
), probe AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cent_id) AS rn FROM dists
  ) WHERE rn <= {_IVF_PQ_NPROBE} AND vec_id < 10
), seeds AS (
  SELECT vec_id, sv, CAST(rn - 1 AS BIGINT) AS code FROM (
    SELECT vec_id, sv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM e
  ) t WHERE rn <= 16
), cb AS (
  SELECT CAST(t.s AS BIGINT) AS s, code,
         sv[t.s * 16 + 1 : t.s * 16 + 16] AS cv
  FROM seeds CROSS JOIN {sub_tbl} t
), cbn AS (
  SELECT s, code, cv,
    CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS n2
  FROM cb
), subv AS (
  SELECT vec_id, CAST(t.s AS BIGINT) AS s,
         sv[t.s * 16 + 1 : t.s * 16 + 16] AS v
  FROM e CROSS JOIN {sub_tbl} t
), codes AS (
  SELECT vec_id, s, code, n2 FROM (
    SELECT subv.vec_id, subv.s, cbn.code, cbn.n2,
      ROW_NUMBER() OVER (PARTITION BY subv.vec_id, subv.s ORDER BY
        list_sum(list_transform(range(1, 17),
          j -> (subv.v[CAST(j AS INT)] - cbn.cv[CAST(j AS INT)])
             * (subv.v[CAST(j AS INT)] - cbn.cv[CAST(j AS INT)]))),
        cbn.code) AS rn
    FROM subv JOIN cbn ON cbn.s = subv.s
  ) t WHERE rn = 1
), recon AS (
  SELECT vec_id, CAST(SUM(n2) AS BIGINT) AS recon2 FROM codes GROUP BY vec_id
), q AS (
  SELECT vec_id AS query_id, sv AS qv, norm2 AS qnorm
  FROM n WHERE vec_id < 10
), qsub AS (
  SELECT query_id, CAST(t.s AS BIGINT) AS s,
         qv[t.s * 16 + 1 : t.s * 16 + 16] AS v
  FROM q CROSS JOIN {sub_tbl} t
), adc AS (
  SELECT qs.query_id, c.vec_id,
    CAST(SUM(list_sum(list_transform(range(1, 17),
      j -> qs.v[CAST(j AS INT)] * cb2.cv[CAST(j AS INT)]))) AS BIGINT)
      AS adc_dot
  FROM qsub qs
  JOIN codes c ON c.s = qs.s AND c.vec_id != qs.query_id
  JOIN cbn cb2 ON cb2.s = c.s AND cb2.code = c.code
  GROUP BY qs.query_id, c.vec_id
), cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.query_id, a.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY a.query_id ORDER BY
        CAST(a.adc_dot AS DOUBLE)
          / NULLIF(sqrt(CAST(qd.qnorm AS DOUBLE))
                   * sqrt(CAST(r.recon2 AS DOUBLE)), 0.0) DESC,
        a.vec_id) AS rn
    FROM adc a
    JOIN recon r ON r.vec_id = a.vec_id
    JOIN q qd ON qd.query_id = a.query_id
    JOIN probe p ON p.query_id = a.query_id
    JOIN corpus_assign ca
      ON ca.vec_id = a.vec_id AND ca.cent_id = p.cent_id
  ) t WHERE rn <= {_IVF_PQ_WIDE}
), rer AS (
  SELECT c.query_id, c.neighbor_id,
    CAST(list_sum(list_transform(range(1, 65),
         i -> nq.sv[CAST(i AS INT)] * nn.sv[CAST(i AS INT)])) AS DOUBLE)
      / NULLIF(sqrt(CAST(nq.norm2 AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM cand c
  JOIN n nq ON nq.vec_id = c.query_id
  JOIN n nn ON nn.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS knn_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM rer
) t WHERE rn <= {_IVF_PQ_K}
"""


@query(
    "ivf_pq_rerank_top5",
    oracle=_ivf_pq_oracle(),
    tags=("vectors", "ann", "ivf", "pq", "rerank"),
)
def ivf_pq_rerank_top5(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import ivf_pq_rerank_topk

    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    cents = label_centroids(emb)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    corpus = emb.select("vec_id", "sv", "norm2")
    return ivf_pq_rerank_topk(
        corpus, cents, queries,
        k=_IVF_PQ_K, nprobe=_IVF_PQ_NPROBE, wide=_IVF_PQ_WIDE,
    )
