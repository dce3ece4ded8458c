"""Frontier batch 6 (round 8, session 3): evaluation / robust-statistics
operators a training-data pipeline runs over its own outputs —

- ``wilson_ci_ranking``: rank suppliers by non-return rate with the Wilson
  score lower bound (the "sort by lower confidence bound, not by raw
  ratio" rule every ranking pipeline needs).  sqrt is the only libm call
  and IEEE-754 REQUIRES correctly-rounded sqrt, so the double expression
  tree is bit-identical across engines as long as both sides share the
  same parenthesization (they do, by construction).
- ``classifier_eval_kappa``: confusion matrix, precision/recall/F1 and
  Cohen's kappa between two label rules over documents — the
  inter-annotator-agreement / weak-supervision-eval step.  Expected
  agreement is computed from ppm-scaled marginals so nothing exceeds
  ~1e12 regardless of corpus size (the naive (tp+fp)(tp+fn) cross term
  overflows BIGINT at ~5M docs).
- ``retrieval_eval_ndcg``: ranking-quality metrics (precision@5, MRR,
  NDCG@5) of exact cosine top-5 retrieval against label-match relevance.
  The log2 discount table is Python-precomputed ppm literals — neither
  engine evaluates a log (libm results are not IEEE-pinned; only
  +,-,*,/,sqrt are allowed on doubles).
- ``geometric_median_step``: one Weiszfeld iteration toward the per-label
  geometric median of the embedding cloud (the robust centroid that
  resists poisoned/outlier vectors).  Per-point contributions are
  integer-scaled BEFORE the sum so the aggregate is an exact BIGINT —
  float accumulation order never matters.

Scale notes: wilson/kappa are single hash-agg passes over the fact table;
retrieval_eval broadcasts 10 query vectors against the corpus scan (the
same shape as knn_cosine_top5); geometric_median is one centroid agg +
one broadcast join + one (label, dim) agg — nothing quadratic anywhere.

Reference surface: ranking/eval analytics of the reference's analytics
tier (SURVEY.md §2.4 aggregations, §2.8 scalar families); the retrieval
metrics grade the ANN operators of operators/vectors.py the way the
reference's own eval harness grades its index (BASELINE.json ann ops).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from zeta_etl_spark.operators.vectors import SCALE, cosine_topk, scaled_vectors
from zeta_etl_spark.queries.registry import T, query

# --- wilson_ci_ranking -------------------------------------------------------
# Per supplier: n = lineitem trials, s = non-returned lines.  Wilson lower
# bound at z=1.96.  phat, and every other double, derives from exact
# BIGINTs through the SAME expression tree in both engines; output is
# ppm-floored so the driver hashes an integer rendering.

_Z = "1.96"
_Z2 = "3.8416"

_WILSON_EXPR_SQL = (
    "((phat + {z2} / (2.0 * n) - {z} * sqrt("
    "(phat * (1.0 - phat) + {z2} / (4.0 * n * n)) / n)) "
    "/ (1.0 + {z2} / n))"
).format(z=_Z, z2=_Z2)

_WILSON_ORACLE = f"""
WITH s AS (
  SELECT l_suppkey,
    CAST(COUNT(*) AS BIGINT) AS n_trials,
    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_ok
  FROM lineitem GROUP BY 1
), p AS (
  SELECT l_suppkey, n_trials, n_ok,
    CAST(n_ok AS DOUBLE) / CAST(n_trials AS DOUBLE) AS phat,
    CAST(n_trials AS DOUBLE) AS n
  FROM s WHERE n_trials >= 20
), w AS (
  SELECT l_suppkey, n_trials, n_ok,
    CAST(floor(phat * 1000000 + 0.5) AS BIGINT) AS phat_ppm,
    CAST(floor({_WILSON_EXPR_SQL} * 1000000 + 0.5) AS BIGINT) AS wilson_ppm
  FROM p
)
SELECT l_suppkey, n_trials, n_ok, phat_ppm, wilson_ppm,
  CAST(ROW_NUMBER() OVER (ORDER BY wilson_ppm DESC, l_suppkey) AS BIGINT)
    AS wilson_rank
FROM w
ORDER BY wilson_rank
LIMIT 25
"""


@query(
    "wilson_ci_ranking",
    oracle=_WILSON_ORACLE,
    tags=("ranking", "statistics", "confidence"),
)
def wilson_ci_ranking(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trials"),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_ok"),
    )
    p = s.filter(F.col("n_trials") >= 20).select(
        "l_suppkey",
        "n_trials",
        "n_ok",
        F.expr("cast(n_ok as double) / cast(n_trials as double)").alias("phat"),
        F.expr("cast(n_trials as double)").alias("n"),
    )
    w = p.select(
        "l_suppkey",
        "n_trials",
        "n_ok",
        F.expr("cast(floor(phat * 1000000 + 0.5) as bigint)").alias("phat_ppm"),
        F.expr(
            f"cast(floor({_WILSON_EXPR_SQL} * 1000000 + 0.5) as bigint)"
        ).alias("wilson_ppm"),
    )
    # top-25 total order: |suppliers| rows after the agg — the global sort
    # runs on a dim-sized frame, never the fact table
    ranked = w.select(
        "*",
        F.expr(
            "cast(row_number() over (order by wilson_ppm desc, l_suppkey) "
            "as bigint)"
        ).alias("wilson_rank"),
    )
    return ranked.orderBy("wilson_rank").limit(25)


# --- classifier_eval_kappa ---------------------------------------------------
# Rule A (prediction): n_chars >= 300.  Rule B (reference): >= 28 distinct
# whitespace tokens.  One scan, one global agg; kappa from ppm marginals.

_KAPPA_ORACLE = """
WITH lab AS (
  SELECT
    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pred,
    CASE WHEN len(list_distinct(string_split(text, ' '))) >= 28
         THEN 1 ELSE 0 END AS ref
  FROM documents
), c AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(pred * ref) AS BIGINT) AS tp,
    CAST(SUM(pred * (1 - ref)) AS BIGINT) AS fp,
    CAST(SUM((1 - pred) * ref) AS BIGINT) AS fn,
    CAST(SUM((1 - pred) * (1 - ref)) AS BIGINT) AS tn
  FROM lab
), m AS (
  SELECT n, tp, fp, fn, tn,
    ((tp + tn) * 1000000) // n AS po_ppm,
    ((tp + fp) * 1000000) // n AS a1_ppm,
    ((tp + fn) * 1000000) // n AS b1_ppm
  FROM c
), k AS (
  SELECT n, tp, fp, fn, tn, po_ppm,
    (a1_ppm * b1_ppm + (1000000 - a1_ppm) * (1000000 - b1_ppm)) // 1000000
      AS pe_ppm
  FROM m
)
SELECT n AS n_docs, tp, fp, fn, tn,
  po_ppm AS accuracy_ppm,
  (tp * 1000000) // (tp + fp) AS precision_ppm,
  (tp * 1000000) // (tp + fn) AS recall_ppm,
  (2 * tp * 1000000) // (2 * tp + fp + fn) AS f1_ppm,
  ((po_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm) AS kappa_ppm
FROM k
"""


@query(
    "classifier_eval_kappa",
    oracle=_KAPPA_ORACLE,
    tags=("evaluation", "agreement", "text"),
)
def classifier_eval_kappa(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    lab = d.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pred"),
        F.when(
            F.expr("size(array_distinct(split(text, ' ')))") >= 28, 1
        )
        .otherwise(0)
        .alias("ref"),
    )
    c = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("pred") * F.col("ref")).cast("bigint").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("ref"))).cast("bigint").alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("ref")).cast("bigint").alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("ref")))
        .cast("bigint")
        .alias("tn"),
    )
    m = c.select(
        "*",
        F.expr("((tp + tn) * 1000000) div n").alias("po_ppm"),
        F.expr("((tp + fp) * 1000000) div n").alias("a1_ppm"),
        F.expr("((tp + fn) * 1000000) div n").alias("b1_ppm"),
    )
    k = m.select(
        "*",
        F.expr(
            "(a1_ppm * b1_ppm + (1000000 - a1_ppm) * (1000000 - b1_ppm)) "
            "div 1000000"
        ).alias("pe_ppm"),
    )
    return k.select(
        F.col("n").alias("n_docs"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.col("po_ppm").alias("accuracy_ppm"),
        F.expr("(tp * 1000000) div (tp + fp)").alias("precision_ppm"),
        F.expr("(tp * 1000000) div (tp + fn)").alias("recall_ppm"),
        F.expr("(2 * tp * 1000000) div (2 * tp + fp + fn)").alias("f1_ppm"),
        F.expr(
            "((po_ppm - pe_ppm) * 1000000) div (1000000 - pe_ppm)"
        ).alias("kappa_ppm"),
    )


# --- retrieval_eval_ndcg -----------------------------------------------------
# Exact cosine top-5 for query vectors vec_id < 10 (the knn_cosine_top5
# shape: broadcast queries x one corpus scan); relevance = neighbor label
# == query label.  DCG discounts 1/log2(rank+1) are ppm literals.

_NDCG_W = [int(math.floor(1_000_000 / math.log2(i + 1) + 0.5)) for i in range(1, 6)]

_DUCK_SCALED = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) "
    "AS BIGINT))"
)


def _ndcg_oracle() -> str:
    w_cases = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)
    )
    idcg_cases = " ".join(
        f"WHEN {i + 1} THEN {sum(_NDCG_W[: i + 1])}" for i in range(5)
    )
    return f"""
WITH e AS (
  SELECT vec_id, label, {_DUCK_SCALED} AS sv FROM embeddings
), n AS (
  SELECT vec_id, label, sv,
         list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), q AS (
  SELECT vec_id AS query_id, label AS qlabel, sv AS qv, norm2 AS qn
  FROM n WHERE vec_id < 10
), p AS (
  SELECT q.query_id, q.qlabel, n.vec_id AS neighbor_id, n.label AS nlabel,
    CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                 i -> q.qv[i] * n.sv[i])) AS DOUBLE)
      / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(n.norm2 AS DOUBLE)), 0.0)
      AS cosine
  FROM q JOIN n ON n.vec_id != q.query_id
), top AS (
  SELECT query_id,
    CAST(CASE WHEN qlabel = nlabel THEN 1 ELSE 0 END AS BIGINT) AS rel,
    CAST(rn AS BIGINT) AS rk
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM p
  ) t WHERE rn <= 5
), m AS (
  SELECT query_id,
    CAST(SUM(rel) AS BIGINT) AS n_rel,
    CAST(SUM(rel * CASE rk {w_cases} END) AS BIGINT) AS dcg,
    CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN rk END), 0) AS BIGINT)
      AS first_rel_rank
  FROM top GROUP BY query_id
)
SELECT query_id, n_rel,
  (n_rel * 1000000) // 5 AS precision5_ppm,
  CASE WHEN first_rel_rank = 0 THEN CAST(0 AS BIGINT)
       ELSE 1000000 // first_rel_rank END AS mrr_ppm,
  CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT)
       ELSE (dcg * 1000000) // (CASE n_rel {idcg_cases} END) END AS ndcg5_ppm
FROM m
"""


@query(
    "retrieval_eval_ndcg",
    oracle=_ndcg_oracle(),
    tags=("vectors", "evaluation", "ndcg"),
)
def retrieval_eval_ndcg(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    sv = scaled_vectors(emb.drop("label"))
    queries = sv.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    top = cosine_topk(sv, queries, k=5)
    # label lookups: both joins broadcast a (vec_id, label) dim projection
    top = (
        top.join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("qlabel"),
                )
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("nlabel"),
                )
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            F.when(F.col("qlabel") == F.col("nlabel"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("rel"),
            F.col("knn_rank").cast("bigint").alias("rk"),
        )
    )
    w_arr = F.array(*[F.lit(w) for w in _NDCG_W])
    idcg_arr = F.array(
        *[F.lit(sum(_NDCG_W[: i + 1])) for i in range(5)]
    )
    m = top.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum(F.col("rel") * F.element_at(w_arr, F.col("rk").cast("int")))
        .cast("bigint")
        .alias("dcg"),
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rk"))), F.lit(0)
        )
        .cast("bigint")
        .alias("first_rel_rank"),
    )
    return m.select(
        "query_id",
        "n_rel",
        F.expr("(n_rel * 1000000) div 5").alias("precision5_ppm"),
        F.when(F.col("first_rel_rank") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("1000000 div first_rel_rank"))
        .alias("mrr_ppm"),
        F.when(F.col("n_rel") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr("dcg * 1000000")
            / F.element_at(idcg_arr, F.col("n_rel").cast("int"))
        )
        .cast("bigint")
        .alias("ndcg5_ppm"),
    )


# --- geometric_median_step ---------------------------------------------------
# One Weiszfeld iteration from the per-label integer mean centroid:
# x' = sum_j(v_j / d_j) / sum_j(1 / d_j), d_j = ||v_j - c||, zero-distance
# points excluded (the standard Weiszfeld guard).  Per-point per-dim
# contributions are ppm-floored BIGINTs BEFORE aggregation, so the sums
# are exact and order-independent; d_j itself is sqrt of an exact BIGINT.

_GEOMED_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, {_DUCK_SCALED} AS sv FROM embeddings
), cm AS (
  SELECT label, CAST(i AS BIGINT) AS dim,
    CAST(SUM(sv[CAST(i AS INT)]) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
      AS cm
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY label, i
), carr AS (
  SELECT label, list(cm ORDER BY dim) AS cv FROM cm GROUP BY label
), d AS (
  SELECT e.vec_id, e.label, e.sv,
    sqrt(CAST(list_sum(list_transform(range(1, 65),
      i -> (e.sv[i] - carr.cv[i]) * (e.sv[i] - carr.cv[i]))) AS DOUBLE))
      AS dist
  FROM e JOIN carr ON e.label = carr.label
), contrib AS (
  SELECT label, CAST(i AS BIGINT) AS dim,
    CAST(floor(CAST(sv[CAST(i AS INT)] AS DOUBLE) * 1000000 / dist + 0.5)
      AS BIGINT) AS wnum,
    CAST(floor(1000000000000.0 / dist + 0.5) AS BIGINT) AS wden
  FROM d CROSS JOIN range(1, 65) t(i)
  WHERE dist > 0
)
SELECT label, dim,
  CAST(SUM(wnum) AS BIGINT) AS num_scaled,
  CAST(SUM(wden) AS BIGINT) AS den_scaled,
  (CAST(SUM(wnum) AS BIGINT) * 1000000) // CAST(SUM(wden) AS BIGINT)
    AS median_ppm,
  CAST(COUNT(*) AS BIGINT) AS n_points
FROM contrib
GROUP BY label, dim
"""


@query(
    "geometric_median_step",
    oracle=_GEOMED_ORACLE,
    tags=("vectors", "robust", "weiszfeld"),
)
def geometric_median_step(spark, sf_dir):
    emb = scaled_vectors(T(spark, sf_dir, "embeddings"))
    # per-label integer mean centroid as a 64-array: one dim-exploded agg,
    # result is |labels| x 64 — broadcastable at any corpus size
    cm = (
        emb.select(
            "label", F.posexplode("sv").alias("dim0", "v")
        )
        .groupBy("label", "dim0")
        .agg(
            F.expr(
                "cast(sum(v) as bigint) div cast(count(*) as bigint)"
            ).alias("cm")
        )
    )
    carr = cm.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim0, cm))), s -> s.cm)"
        ).alias("cv")
    )
    d = emb.join(F.broadcast(carr), "label").select(
        "label",
        "sv",
        F.expr(
            "sqrt(cast(aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), "
            "0L, (acc, x) -> acc + x) as double))"
        ).alias("dist"),
    )
    contrib = (
        d.filter(F.col("dist") > 0)
        .select(
            "label",
            F.posexplode("sv").alias("dim0", "v"),
            "dist",
        )
        .select(
            "label",
            (F.col("dim0") + 1).cast("bigint").alias("dim"),
            F.expr(
                "cast(floor(cast(v as double) * 1000000 / dist + 0.5) as bigint)"
            ).alias("wnum"),
            F.expr(
                "cast(floor(1000000000000.0 / dist + 0.5) as bigint)"
            ).alias("wden"),
        )
    )
    return contrib.groupBy("label", "dim").agg(
        F.sum("wnum").cast("bigint").alias("num_scaled"),
        F.sum("wden").cast("bigint").alias("den_scaled"),
        F.expr(
            "(cast(sum(wnum) as bigint) * 1000000) div cast(sum(wden) as bigint)"
        ).alias("median_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
    )


# --- kcore_peeling -----------------------------------------------------------
# 4-round k-core peel of the part co-purchase graph (edges = part pairs
# co-bought in >= 2 orders; pair generation is a within-order self-join,
# work = sum(|basket|^2), never |parts|^2).  k is the LOWER MEDIAN of the
# initial degree distribution — a data-relative threshold, so the query
# stays non-degenerate at every scale (a fixed k trivially saturates as
# density grows).  The round count is BOUNDED (4), which pins the exact
# semantics "4 peeling rounds", not iterate-to-fixpoint — both engines
# unroll identically; each round is a dim-sized semi-join + degree agg.

_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    rounds = []
    prev = "a0"
    for r in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
, d{r} AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT e.u AS x FROM e
      JOIN {prev} au ON au.v = e.u JOIN {prev} av ON av.v = e.v
    UNION ALL
    SELECT e.v AS x FROM e
      JOIN {prev} au ON au.v = e.u JOIN {prev} av ON av.v = e.v
  ) t GROUP BY x
), a{r} AS MATERIALIZED (
  SELECT d{r}.x AS v FROM d{r} CROSS JOIN kk WHERE d{r}.deg >= kk.k
)""")
        prev = f"a{r}"
    return f"""
WITH i AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
), d0 AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
  ) t GROUP BY x
), kk AS MATERIALIZED (
  SELECT deg AS k FROM (
    SELECT deg, ROW_NUMBER() OVER (ORDER BY deg, x) AS rn,
           COUNT(*) OVER () AS n
    FROM d0
  ) t WHERE rn = (n + 1) // 2
), a0 AS (
  SELECT x AS v FROM d0
){''.join(rounds)}
SELECT d0.x AS part_key, d0.deg AS deg_initial, d{_KCORE_ROUNDS}.deg AS deg_final,
  kk.k AS k_threshold
FROM a{_KCORE_ROUNDS} s
JOIN d0 ON d0.x = s.v
JOIN d{_KCORE_ROUNDS} ON d{_KCORE_ROUNDS}.x = s.v
CROSS JOIN kk
"""


@query(
    "kcore_peeling",
    oracle=_kcore_oracle(),
    tags=("graph", "kcore", "basket"),
)
def kcore_peeling(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    from zeta_etl_spark.operators.graph import cobasket_pairs

    li = T(spark, sf_dir, "lineitem")
    # basket pair generation without the self-join: baskets are bounded
    # (~13 items), so per-order collect_set + array expansion emits the
    # exact same (u < v) pair multiset with ONE exchange instead of three
    e = (
        cobasket_pairs(
            li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("u", "v")
    )
    # the edge table is re-scanned 2x per round: materialize it ONCE so the
    # basket self-join never replays
    e = e.localCheckpoint()

    # Optimization r14 (guide §3.1 broadcast costs, VERDICT r13 #5): the
    # r13 form force-broadcast `alive` UNCONDITIONALLY.  The set is
    # dim-sized at bench scale but O(|part|) — it grows linearly with SF,
    # so at 100 TB the unconditional hint is a multi-GB driver collect per
    # peeling round (and the 8 GB broadcast cap).  The hint is now gated on
    # the alive COUNT, which each round already pays one cheap job for (a
    # scan of the round's just-checkpointed blocks); above the threshold
    # the join falls back to the plain semi-join shuffle.  Env-tunable for
    # cluster memory; 5M bigint keys ≈ 10² MB built relation.
    bcast_max = int(os.environ.get("SPARK_GRAFT_KCORE_BCAST_MAX", "5000000"))

    def degrees(edges, alive=None, alive_small=True):
        if alive is not None:
            # Optimization r13 (guide §3.1): alive comes out of a
            # localCheckpoint whose size statistics are unknown, so the
            # planner would shuffle the edge table for a sort-merge
            # semi-join every round.  Broadcasting it (when small — see
            # the r14 gate above) turns both per-round semi-joins into
            # zero-shuffle hash probes of the edge frame — 2 of the 3
            # per-round exchanges gone; only the degree groupBy still
            # shuffles.
            hint = F.broadcast if alive_small else (lambda df: df)
            edges = edges.join(
                hint(alive.select(F.col("v").alias("u"))),
                "u",
                "left_semi",
            ).join(hint(alive), "v", "left_semi")
        ends = edges.select(F.col("u").alias("x")).unionAll(
            edges.select(F.col("v").alias("x"))
        )
        return ends.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))

    d0 = degrees(e).localCheckpoint()
    kk = (
        d0.select(
            "deg",
            F.expr("row_number() over (order by deg, x)").alias("rn"),
            F.expr("count(*) over ()").alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select(F.col("deg").alias("k"))
    )
    alive = d0.select(F.col("x").alias("v"))
    # d0 is checkpointed: counting it is a cached-block scan, not a recompute
    alive_small = d0.count() <= bcast_max
    dr = d0
    for _ in range(_KCORE_ROUNDS):
        dr = degrees(e, alive, alive_small)
        alive = (
            scalar_frame_crossjoin(dr, kk, bound=1)
            .filter(F.col("deg") >= F.col("k"))
            .select(F.col("x").alias("v"))
        )
        # bounded vertex frame per round; checkpoint keeps the 4-round plan
        # from nesting 8 joins deep.  LAZY (r14, the CC device): the round's
        # RDD materializes inside the next round's broadcast-build job
        # instead of paying a dedicated per-round materialization job — at
        # sf0.1/32 cores the peel was scheduler-bound (driver scaling block
        # showed 32c SLOWER than 8c), so per-round jobs are the cost.
        alive = alive.localCheckpoint(eager=False)
        # the alive set only shrinks round-over-round, so once it counts
        # under the gate it stays broadcastable for the rest of the peel
        # (the count materializes the lazy checkpoint, shuffle fallback
        # path only)
        if not alive_small:
            alive_small = alive.count() <= bcast_max
    surv = alive
    out = (
        surv.join(d0.withColumnRenamed("deg", "deg_initial"), surv.v == d0.x)
        .join(
            dr.withColumnRenamed("deg", "deg_final").withColumnRenamed(
                "x", "xf"
            ),
            surv.v == F.col("xf"),
        )
        .select(
            F.col("v").alias("part_key"),
            "deg_initial",
            "deg_final",
        )
    )
    return scalar_frame_crossjoin(out, kk, bound=1).select(
        "part_key", "deg_initial", "deg_final", F.col("k").alias("k_threshold")
    )


# --- isotonic_pav_fit --------------------------------------------------------
# Nondecreasing L2-isotonic fit of daily order revenue per priority over
# the most recent 48 days, via the minimax closed form
# fitted[t] = max_{j<=t} min_{k>=t} avg(y[j..k]) — no sequential PAV
# loop, so the whole fit is two nested bounded HOFs over a 48-element
# array (O(48^3) scalar ops per key, constant at any fact size).  avg is
# an exact-integer prefix-sum difference over one IEEE-exact division;
# both engines evaluate the identical expression tree.

_ISO_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1, 2
), recent AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY priority ORDER BY day DESC)
      AS rn
    FROM daily
  ) t WHERE rn <= 48
), arr AS (
  SELECT priority,
    list(day ORDER BY day) AS ds,
    list(cents ORDER BY day) AS ys
  FROM recent GROUP BY priority
), fit AS (
  SELECT priority, ds, ys, len(ys) AS n,
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, len(ys) + 1),
        i -> CAST(list_sum(ys[1:i]) AS BIGINT))) AS p
  FROM arr
), ft AS (
  SELECT priority, ds, ys, n,
    list_transform(range(0, n), t ->
      list_max(list_transform(range(0, t + 1), j ->
        list_min(list_transform(range(t, n), k ->
          CAST(p[k + 2] - p[j + 1] AS DOUBLE) / (k - j + 1.0)))))) AS f
  FROM fit
)
SELECT priority, CAST(ds[CAST(i AS INT)] AS DATE) AS day,
  ys[CAST(i AS INT)] AS observed_cents,
  CAST(floor(f[CAST(i AS INT)] + 0.5) AS BIGINT) AS fitted_cents
FROM ft CROSS JOIN range(1, 100) t(i)
WHERE i <= n
"""


@query(
    "isotonic_pav_fit",
    oracle=_ISO_ORACLE,
    tags=("regression", "isotonic", "statistics"),
)
def isotonic_pav_fit(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    recent = daily.select(
        "*",
        F.expr(
            "row_number() over (partition by priority order by day desc)"
        ).alias("rn"),
    ).filter(F.col("rn") <= 48)
    arr = recent.groupBy("priority").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, cents))), s -> s.day)"
        ).alias("ds"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, cents))), s -> s.cents)"
        ).alias("ys"),
    )
    fit = arr.select(
        "priority",
        "ds",
        "ys",
        F.expr("size(ys)").alias("n"),
        F.expr(
            "concat(array(0L), transform(sequence(1, size(ys)), "
            "i -> aggregate(slice(ys, 1, i), 0L, (a, x) -> a + x)))"
        ).alias("p"),
    )
    ft = fit.select(
        "priority",
        "ds",
        "ys",
        "n",
        F.expr(
            "transform(sequence(0, n - 1), t -> "
            "array_max(transform(sequence(0, t), j -> "
            "array_min(transform(sequence(t, n - 1), k -> "
            "cast(element_at(p, k + 2) - element_at(p, j + 1) as double) "
            "/ (k - j + 1.0))))))"
        ).alias("f"),
    )
    return ft.select(
        "priority", F.posexplode(F.expr("arrays_zip(ds, ys, f)")).alias("i0", "z")
    ).select(
        "priority",
        F.col("z.ds").alias("day"),
        F.col("z.ys").alias("observed_cents"),
        F.expr("cast(floor(z.f + 0.5) as bigint)").alias("fitted_cents"),
    )


# --- mmr_diverse_rerank ------------------------------------------------------
# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) re-rank of
# the exact-cosine top-8 candidates per query: 3 unrolled greedy rounds of
# select argmax(rel_ppm - max_sim_to_selected_ppm), lambda = 0.5 (order-
# equivalent to (rel - maxsim)/2).  The diversity-aware sampling step of a
# training-data curation pipeline.  Candidate pools are bounded (8/query),
# so the pairwise-sim frame is |queries| x 64 — never corpus-quadratic;
# each greedy round is one bounded groupBy.  Argmax ties break on the
# lower candidate id via min(struct(-score, cand)).

def _mmr_oracle() -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, {_DUCK_SCALED} AS sv FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, sv,
         list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), q AS (
  SELECT vec_id AS query_id, sv AS qv, norm2 AS qn FROM n WHERE vec_id < 10
), cand AS MATERIALIZED (
  SELECT query_id, neighbor_id,
    CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS rel_ppm,
    CAST(rn AS BIGINT) AS knn_rank
  FROM (
    SELECT q.query_id, nn.vec_id AS neighbor_id,
      CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                   i -> q.qv[i] * nn.sv[i])) AS DOUBLE)
        / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
                 0.0) AS cosine,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                     i -> q.qv[i] * nn.sv[i])) AS DOUBLE)
          / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(nn.norm2 AS DOUBLE)),
                   0.0) DESC, nn.vec_id) AS rn
    FROM q JOIN n nn ON nn.vec_id != q.query_id
  ) t WHERE rn <= 8
), ps AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
    CAST(floor(
      CAST(list_sum(list_transform(range(1, len(na.sv) + 1),
                                   i -> na.sv[i] * nb.sv[i])) AS DOUBLE)
      / NULLIF(sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE)),
               0.0) * 1000000 + 0.5) AS BIGINT) AS sim_ppm
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
  JOIN n na ON na.vec_id = a.neighbor_id
  JOIN n nb ON nb.vec_id = b.neighbor_id
), s1 AS MATERIALIZED (
  SELECT query_id, neighbor_id AS sel, rel_ppm AS score_ppm
  FROM cand WHERE knn_rank = 1
), r2 AS MATERIALIZED (
  SELECT c.query_id,
    MIN(struct_pack(negs := -(c.rel_ppm - ps.sim_ppm),
                    cand := c.neighbor_id)) AS pick
  FROM cand c
  JOIN s1 ON s1.query_id = c.query_id AND c.neighbor_id != s1.sel
  JOIN ps ON ps.query_id = c.query_id AND ps.ca = c.neighbor_id
         AND ps.cb = s1.sel
  GROUP BY c.query_id
), s2 AS MATERIALIZED (
  SELECT query_id, CAST(pick['cand'] AS BIGINT) AS sel,
    CAST(-pick['negs'] AS BIGINT) AS score_ppm
  FROM r2
), r3 AS MATERIALIZED (
  SELECT c.query_id,
    MIN(struct_pack(negs := -(c.rel_ppm - GREATEST(p1.sim_ppm, p2.sim_ppm)),
                    cand := c.neighbor_id)) AS pick
  FROM cand c
  JOIN s1 ON s1.query_id = c.query_id AND c.neighbor_id != s1.sel
  JOIN s2 ON s2.query_id = c.query_id AND c.neighbor_id != s2.sel
  JOIN ps p1 ON p1.query_id = c.query_id AND p1.ca = c.neighbor_id
            AND p1.cb = s1.sel
  JOIN ps p2 ON p2.query_id = c.query_id AND p2.ca = c.neighbor_id
            AND p2.cb = s2.sel
  GROUP BY c.query_id
), s3 AS (
  SELECT query_id, CAST(pick['cand'] AS BIGINT) AS sel,
    CAST(-pick['negs'] AS BIGINT) AS score_ppm
  FROM r3
)
SELECT query_id, CAST(1 AS BIGINT) AS mmr_round, sel AS selected_id,
  score_ppm FROM s1
UNION ALL
SELECT query_id, CAST(2 AS BIGINT), sel, score_ppm FROM s2
UNION ALL
SELECT query_id, CAST(3 AS BIGINT), sel, score_ppm FROM s3
"""


@query(
    "mmr_diverse_rerank",
    oracle=_mmr_oracle(),
    tags=("vectors", "diversity", "curation"),
)
def mmr_diverse_rerank(spark, sf_dir):
    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv"),
        F.col("norm2").alias("qn"),
    )
    cand = cosine_topk(emb, queries, k=8).select(
        "query_id",
        "neighbor_id",
        F.expr("cast(floor(cosine * 1000000 + 0.5) as bigint)").alias(
            "rel_ppm"
        ),
        F.col("knn_rank").cast("bigint").alias("knn_rank"),
    )
    # the candidate frame is |queries| x 8 — bounded; materialize once, every
    # greedy round re-reads it
    cand = cand.localCheckpoint()
    vecs = emb.select("vec_id", "sv", "norm2")
    ca = cand.select("query_id", F.col("neighbor_id").alias("ca"))
    cb = cand.select("query_id", F.col("neighbor_id").alias("cb"))
    ps = (
        ca.join(cb, "query_id")
        .filter(F.col("ca") != F.col("cb"))
        .join(
            vecs.select(
                F.col("vec_id").alias("ca"),
                F.col("sv").alias("sva"),
                F.col("norm2").alias("na"),
            ),
            "ca",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("cb"),
                F.col("sv").alias("svb"),
                F.col("norm2").alias("nb"),
            ),
            "cb",
        )
        .select(
            "query_id",
            "ca",
            "cb",
            F.expr(
                "cast(floor(cast(aggregate(zip_with(sva, svb, (a, b) -> a * b), "
                "0L, (acc, x) -> acc + x) as double) "
                "/ nullif(sqrt(cast(na as double)) * sqrt(cast(nb as double)), "
                "0.0) * 1000000 + 0.5) as bigint)"
            ).alias("sim_ppm"),
        )
    )
    ps = ps.localCheckpoint()
    s1 = cand.filter(F.col("knn_rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("sel"),
        F.col("rel_ppm").alias("score_ppm"),
    )
    def pick(scored):
        g = scored.groupBy("query_id").agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("negs"),
                    F.col("neighbor_id").alias("cand"),
                )
            ).alias("pick")
        )
        return g.select(
            "query_id",
            F.expr("cast(pick.cand as bigint)").alias("sel"),
            F.expr("cast(-pick.negs as bigint)").alias("score_ppm"),
        )

    r2_scored = (
        cand.join(
            s1.select("query_id", F.col("sel").alias("sel1")), "query_id"
        )
        .filter(F.col("neighbor_id") != F.col("sel1"))
        .join(
            ps.select(
                "query_id",
                F.col("ca").alias("neighbor_id"),
                F.col("cb").alias("sel1"),
                "sim_ppm",
            ),
            ["query_id", "neighbor_id", "sel1"],
        )
        .select(
            "query_id",
            "neighbor_id",
            (F.col("rel_ppm") - F.col("sim_ppm")).alias("score"),
        )
    )
    s2 = pick(r2_scored)
    r3_scored = (
        cand.join(
            s1.select("query_id", F.col("sel").alias("sel1")), "query_id"
        )
        .join(
            s2.select("query_id", F.col("sel").alias("sel2")), "query_id"
        )
        .filter(
            (F.col("neighbor_id") != F.col("sel1"))
            & (F.col("neighbor_id") != F.col("sel2"))
        )
        .join(
            ps.select(
                "query_id",
                F.col("ca").alias("neighbor_id"),
                F.col("cb").alias("sel1"),
                F.col("sim_ppm").alias("sim1"),
            ),
            ["query_id", "neighbor_id", "sel1"],
        )
        .join(
            ps.select(
                "query_id",
                F.col("ca").alias("neighbor_id"),
                F.col("cb").alias("sel2"),
                F.col("sim_ppm").alias("sim2"),
            ),
            ["query_id", "neighbor_id", "sel2"],
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("rel_ppm") - F.greatest(F.col("sim1"), F.col("sim2"))
            ).alias("score"),
        )
    )
    s3 = pick(r3_scored)
    out = (
        s1.select(
            "query_id",
            F.lit(1).cast("bigint").alias("mmr_round"),
            F.col("sel").alias("selected_id"),
            "score_ppm",
        )
        .unionAll(
            s2.select(
                "query_id",
                F.lit(2).cast("bigint").alias("mmr_round"),
                F.col("sel").alias("selected_id"),
                "score_ppm",
            )
        )
        .unionAll(
            s3.select(
                "query_id",
                F.lit(3).cast("bigint").alias("mmr_round"),
                F.col("sel").alias("selected_id"),
                "score_ppm",
            )
        )
    )
    return out
