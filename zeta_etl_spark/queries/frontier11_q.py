"""Frontier batch 10 (round 8, session 4): rank statistics, clustering
evaluation, sketch estimation, and graph link prediction —

- ``spearman_value_corr``: exact Spearman rank correlation between doc
  length (chars) and token count.  Average ranks with ties are computed
  on the VALUE GRAIN (group by value -> counts -> running offsets), so no
  task ever ranks the corpus row-by-row; doubled ranks ``2*minrank +
  (cnt-1)`` keep everything integral (Pearson is invariant under the
  linear map).  The five moment sums are exact BIGINTs (bounded by
  4n^3 < 2^63 up to n ~ 1.3e6 docs; document the switch to double sums
  past that); the final rho is one deterministic IEEE scalar expression
  on a single row — identical in both engines.
- ``kendall_tau_daily``: Kendall tau-b between day index and daily event
  count, per event type.  The pair join is on the (type, day) grain —
  bounded by the 30-day window, never the fact row count.  Concordant /
  discordant / tie counts are exact integers; tau-b is a single-row
  scalar per group.
- ``clustering_agreement_ari``: Adjusted Rand Index between two
  clusterings of the embedding corpus — nearest-seed k-means assignment
  (broadcast packed seeds, zero-shuffle zip_with argmin) vs 4-plane
  hyperplane LSH buckets (the shared ``lsh_bucket`` /
  ``duck_hyperplane_bucket_sql`` twin).  Contingency and marginal
  C(n,2) sums are exact BIGINTs; ARI is one scalar row.
- ``ams_f2_sketch``: AMS (Alon-Matias-Szegedy) second-frequency-moment
  sketch of the user event-count vector: 16 md5-sign estimators, median
  (avg of the 8th/9th order stats) vs the exact F2, relative error in
  ppm via staged integer division.  Estimator grain = 16 x |users|, not
  16 x |events|.
- ``link_prediction_suppliers``: common-neighbor + preferential-
  attachment link prediction over the customer-supplier bipartite graph
  from orders x lineitem.  Candidate pairs come from RANK ADJACENCY
  (top-8 customers per supplier by spend) so the pair count is
  <= 28 x |suppliers| — never per-supplier all-pairs.
- ``centroid_silhouette``: simplified (centroid-based) silhouette of the
  k-means assignment: a = distance^2 to own (nearest) seed, b = to the
  second-nearest; per-point score in permille stays integral
  ((b-a)*1000 fits BIGINT where (b-a)*1e6 would not), aggregated
  per cluster.
- ``temperature_mixture_weights``: tau=0.5 temperature-scaled source
  mixture weights (w ~ sqrt(chars), the classic multilingual rebalance)
  next to the tau=1 proportional weights.  sqrt is correctly rounded in
  both engines; each weight is floor-scaled to BIGINT BEFORE the sum so
  the normalization is order-independent.

Reference parity: these extend the analytics surface beyond the
reference's aggregate/window families (zeta-etl dataflows end at
groupBy/window aggregates); they follow the same QuerySpec + DuckDB
oracle contract as every other registry entry.

Scale notes: every shuffle is on a bounded grain (value domain, day
window, 16 estimators, |sources|, rank-capped adjacency) or a plain
hash agg over the fact; no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query

# --- spearman_value_corr -----------------------------------------------------

_SPEAR_ORACLE = """
WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
  FROM documents
), gx AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1
), rx AS (
  SELECT x,
    2 * (1 + CAST(COALESCE(SUM(cnt) OVER (ORDER BY x
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
      + (cnt - 1) AS dr
  FROM gx
), gy AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1
), ry AS (
  SELECT y,
    2 * (1 + CAST(COALESCE(SUM(cnt) OVER (ORDER BY y
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
      + (cnt - 1) AS dr
  FROM gy
), j AS (
  SELECT rx.dr AS dx, ry.dr AS dy
  FROM t JOIN rx ON rx.x = t.x JOIN ry ON ry.y = t.y
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
    CAST(SUM(dx * dy) AS BIGINT) AS sxy,
    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
    CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM j
)
SELECT n,
  CAST(floor(1000000.0
    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0)
    + 0.5) AS BIGINT) AS rho_ppm
FROM s
"""


@query(
    "spearman_value_corr",
    oracle=_SPEAR_ORACLE,
    tags=("statistics", "correlation", "ranks"),
)
def spearman_value_corr(spark, sf_dir):
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("x"),
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("y"),
    )

    def rank_map(col):
        # value-grain average ranks, doubled to stay integral:
        # dr(v) = 2*(1 + #smaller) + (cnt(v) - 1).  The window runs over
        # the bounded VALUE DOMAIN, not the doc count.
        g = t.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        w = (
            Window.orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return g.select(
            col,
            (
                2 * (1 + F.coalesce(F.sum("cnt").over(w), F.lit(0)))
                + (F.col("cnt") - 1)
            )
            .cast("bigint")
            .alias("dr"),
        )

    rx = rank_map("x").withColumnRenamed("dr", "dx")
    ry = rank_map("y").withColumnRenamed("dr", "dy")
    j = t.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    s = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
    )
    return s.select(
        "n",
        F.expr(
            "cast(floor(1000000.0"
            " * (cast(n as double) * cast(sxy as double)"
            "    - cast(sx as double) * cast(sy as double))"
            " / nullif(sqrt(cast(n as double) * cast(sxx as double)"
            "               - cast(sx as double) * cast(sx as double))"
            "          * sqrt(cast(n as double) * cast(syy as double)"
            "                 - cast(sy as double) * cast(sy as double)), 0.0)"
            " + 0.5) as bigint)"
        ).alias("rho_ppm"),
    )


# --- kendall_tau_daily -------------------------------------------------------

_KENDALL_ORACLE = """
WITH dc AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.event_type,
    CAST(SUM(CASE WHEN b.c > a.c THEN 1 ELSE 0 END) AS BIGINT) AS conc,
    CAST(SUM(CASE WHEN b.c < a.c THEN 1 ELSE 0 END) AS BIGINT) AS disc
  FROM dc a JOIN dc b
    ON b.event_type = a.event_type AND a.d < b.d
  GROUP BY 1
), nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM dc GROUP BY 1
), ties AS (
  SELECT event_type,
    CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS n2
  FROM (
    SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS m
    FROM dc GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT nn.event_type, nn.n AS n_days, p.conc AS concordant,
  p.disc AS discordant, ties.n2 AS tie_pairs,
  CAST(floor(1000000.0 * CAST(p.conc - p.disc AS DOUBLE)
    / nullif(sqrt(CAST(nn.n * (nn.n - 1) // 2 AS DOUBLE))
             * sqrt(CAST(nn.n * (nn.n - 1) // 2 - ties.n2 AS DOUBLE)), 0.0)
    + 0.5) AS BIGINT) AS tau_b_ppm
FROM nn
JOIN p ON p.event_type = nn.event_type
JOIN ties ON ties.event_type = nn.event_type
"""


@query(
    "kendall_tau_daily",
    oracle=_KENDALL_ORACLE,
    tags=("statistics", "correlation", "time-series"),
)
def kendall_tau_daily(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    dc = (
        e.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ).localCheckpoint()  # (type, day) grain feeds pairs + sizes + ties
    p = (
        dc.alias("a")
        .join(
            dc.alias("b"),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.when(F.col("b.c") > F.col("a.c"), 1).otherwise(0))
            .cast("bigint")
            .alias("conc"),
            F.sum(F.when(F.col("b.c") < F.col("a.c"), 1).otherwise(0))
            .cast("bigint")
            .alias("disc"),
        )
    )
    nn = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        dc.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("m * (m - 1) div 2")).cast("bigint").alias("n2")
        )
    )
    return (
        nn.join(p, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.col("n2").alias("tie_pairs"),
            F.expr(
                "cast(floor(1000000.0 * cast(conc - disc as double)"
                " / nullif(sqrt(cast(n * (n - 1) div 2 as double))"
                "          * sqrt(cast(n * (n - 1) div 2 - n2 as double)), 0.0)"
                " + 0.5) as bigint)"
            ).alias("tau_b_ppm"),
        )
    )


# --- clustering_agreement_ari ------------------------------------------------

_ARI_K = 8
_ARI_PLANES = 4
_ARI_DIM = 64


def _ari_planes():
    from zeta_etl_spark.operators.vectors import hyperplane_params

    return hyperplane_params(_ARI_PLANES, _ARI_DIM)


def _ari_oracle() -> str:
    from zeta_etl_spark.operators.vectors import duck_hyperplane_bucket_sql

    bucket = duck_hyperplane_bucket_sql(_ari_planes())
    return f"""
WITH e AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cluster_id, sv AS cv FROM e WHERE vec_id < {_ARI_K}
), ex AS (
  SELECT e.vec_id, CAST(i AS BIGINT) AS dim, e.sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, {_ARI_DIM + 1}) t(i)
), cx AS (
  SELECT s.cluster_id, CAST(i AS BIGINT) AS dim, s.cv[CAST(i AS INT)] AS cv
  FROM seeds s CROSS JOIN range(1, {_ARI_DIM + 1}) t(i)
), dists AS (
  SELECT ex.vec_id, cx.cluster_id,
    CAST(SUM((ex.v - cx.cv) * (ex.v - cx.cv)) AS BIGINT) AS dist2
  FROM ex JOIN cx ON ex.dim = cx.dim
  GROUP BY 1, 2
), a AS (
  SELECT vec_id, cluster_id AS ca FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cluster_id) AS rn
    FROM dists
  ) WHERE rn = 1
), b AS (
  SELECT vec_id, CAST({bucket} AS BIGINT) AS cb FROM e
), cont AS (
  SELECT a.ca, b.cb, CAST(COUNT(*) AS BIGINT) AS nij
  FROM a JOIN b ON b.vec_id = a.vec_id
  GROUP BY 1, 2
), comp AS (
  SELECT
    CAST(SUM(nij) AS BIGINT) AS n,
    CAST(COUNT(DISTINCT ca) AS BIGINT) AS n_clusters_a,
    CAST(COUNT(DISTINCT cb) AS BIGINT) AS n_clusters_b,
    CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS s_cells
  FROM cont
), ma AS (
  SELECT CAST(SUM(na * (na - 1) // 2) AS BIGINT) AS s_a
  FROM (SELECT ca, CAST(SUM(nij) AS BIGINT) AS na FROM cont GROUP BY 1)
), mb AS (
  SELECT CAST(SUM(nb * (nb - 1) // 2) AS BIGINT) AS s_b
  FROM (SELECT cb, CAST(SUM(nij) AS BIGINT) AS nb FROM cont GROUP BY 1)
)
SELECT comp.n, comp.n_clusters_a, comp.n_clusters_b,
  comp.s_cells AS sum_comb_cells, ma.s_a AS sum_comb_a, mb.s_b AS sum_comb_b,
  CAST(floor(1000000.0
    * (CAST(comp.s_cells AS DOUBLE)
       - CAST(ma.s_a AS DOUBLE) * CAST(mb.s_b AS DOUBLE)
         / (CAST(comp.n AS DOUBLE) * CAST(comp.n - 1 AS DOUBLE) / 2.0))
    / nullif((CAST(ma.s_a AS DOUBLE) + CAST(mb.s_b AS DOUBLE)) / 2.0
       - CAST(ma.s_a AS DOUBLE) * CAST(mb.s_b AS DOUBLE)
         / (CAST(comp.n AS DOUBLE) * CAST(comp.n - 1 AS DOUBLE) / 2.0), 0.0)
    + 0.5) AS BIGINT) AS ari_ppm
FROM comp CROSS JOIN ma CROSS JOIN mb
"""


@query(
    "clustering_agreement_ari",
    oracle=_ari_oracle(),
    tags=("vectors", "clustering", "evaluation"),
)
def clustering_agreement_ari(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
    from zeta_etl_spark.operators.vectors import lsh_bucket, scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select("vec_id", "sv")
    packed = (
        emb.where(F.col("vec_id") < _ARI_K)
        .select(F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    )
    # one corpus scan produces BOTH labelings: zero-shuffle argmin vs the
    # broadcast packed seeds, and the literal-plane LSH bucket
    both = emb.transform(with_scalar_frame(packed)).select(
        F.expr(
            "array_sort(transform(cents, c -> struct("
            "aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (a, v) -> a + v) AS dist2, c.cid AS cid)))[0].cid"
        ).alias("ca"),
        lsh_bucket("sv", _ari_planes()).cast("bigint").alias("cb"),
    )
    cont = both.groupBy("ca", "cb").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    cont = cont.localCheckpoint()  # contingency grain feeds 3 aggregates
    comp = cont.agg(
        F.sum("nij").cast("bigint").alias("n"),
        F.countDistinct("ca").cast("bigint").alias("n_clusters_a"),
        F.countDistinct("cb").cast("bigint").alias("n_clusters_b"),
        F.sum(F.expr("nij * (nij - 1) div 2")).cast("bigint").alias("s_cells"),
    )
    ma = (
        cont.groupBy("ca")
        .agg(F.sum("nij").cast("bigint").alias("na"))
        .agg(F.sum(F.expr("na * (na - 1) div 2")).cast("bigint").alias("s_a"))
    )
    mb = (
        cont.groupBy("cb")
        .agg(F.sum("nij").cast("bigint").alias("nb"))
        .agg(F.sum(F.expr("nb * (nb - 1) div 2")).cast("bigint").alias("s_b"))
    )
    return (
        comp.transform(with_scalar_frame(ma))
        .transform(with_scalar_frame(mb))
        .select(
            "n",
            "n_clusters_a",
            "n_clusters_b",
            F.col("s_cells").alias("sum_comb_cells"),
            F.col("s_a").alias("sum_comb_a"),
            F.col("s_b").alias("sum_comb_b"),
            F.expr(
                "cast(floor(1000000.0"
                " * (cast(s_cells as double)"
                "    - cast(s_a as double) * cast(s_b as double)"
                "      / (cast(n as double) * cast(n - 1 as double) / 2.0))"
                " / nullif((cast(s_a as double) + cast(s_b as double)) / 2.0"
                "    - cast(s_a as double) * cast(s_b as double)"
                "      / (cast(n as double) * cast(n - 1 as double) / 2.0),"
                " 0.0) + 0.5) as bigint)"
            ).alias("ari_ppm"),
        )
    )


# --- ams_f2_sketch -----------------------------------------------------------

_AMS_R = 16

_AMS_ORACLE = f"""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1
), est AS (
  SELECT k,
    CAST(SUM(CASE WHEN
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
          || CAST(k AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 1
      THEN c ELSE -c END) AS BIGINT) AS x
  FROM c CROSS JOIN range(0, {_AMS_R}) t(k)
  GROUP BY 1
), ranked AS (
  SELECT x * x AS e,
    ROW_NUMBER() OVER (ORDER BY x * x, k) AS rn
  FROM est
), med AS (
  SELECT CAST((MAX(CASE WHEN rn = {_AMS_R // 2} THEN e END)
    + MAX(CASE WHEN rn = {_AMS_R // 2 + 1} THEN e END)) // 2 AS BIGINT)
    AS ams_est
  FROM ranked
), ex AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM c
)
SELECT ex.exact_f2, med.ams_est,
  CAST((abs(med.ams_est - ex.exact_f2) // ex.exact_f2) * 1000000
    + ((abs(med.ams_est - ex.exact_f2) % ex.exact_f2) * 1000000)
      // ex.exact_f2 AS BIGINT) AS rel_err_ppm
FROM ex CROSS JOIN med
"""


@query(
    "ams_f2_sketch",
    oracle=_AMS_ORACLE,
    tags=("sketch", "aggregation", "statistics"),
)
def ams_f2_sketch(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    e = T(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    c = c.localCheckpoint()  # user grain feeds the 16 estimators + exact F2
    est = (
        c.select(
            "user_id", "c", F.explode(F.sequence(F.lit(0), F.lit(_AMS_R - 1))).alias("k")
        )
        .groupBy("k")
        .agg(
            F.sum(
                F.expr(
                    "case when cast(conv(substr(md5(concat("
                    "cast(user_id as string), ':', cast(k as string))), 1, 1),"
                    " 16, 10) as bigint) % 2 = 1 then c else -c end"
                )
            )
            .cast("bigint")
            .alias("x")
        )
    )
    ranked = est.select(
        F.expr("x * x").alias("e"),
        F.expr(
            "row_number() over (order by x * x, k)"
        ).alias("rn"),
    )
    med = ranked.agg(
        F.expr(
            f"cast((max(case when rn = {_AMS_R // 2} then e end)"
            f" + max(case when rn = {_AMS_R // 2 + 1} then e end)) div 2"
            " as bigint)"
        ).alias("ams_est")
    )
    ex = c.agg(F.sum(F.expr("c * c")).cast("bigint").alias("exact_f2"))
    return scalar_frame_crossjoin(ex, med).select(
        "exact_f2",
        "ams_est",
        F.expr(
            "cast((abs(ams_est - exact_f2) div exact_f2) * 1000000"
            " + ((abs(ams_est - exact_f2) % exact_f2) * 1000000)"
            " div exact_f2 as bigint)"
        ).alias("rel_err_ppm"),
    )


# --- link_prediction_suppliers ----------------------------------------------

_LINK_FANOUT = 8
_LINK_TOPN = 20

# Oracle scale note (r9, sf10 sweep): DuckDB re-evaluates a CTE per
# reference — ``e`` (the fact-sized join-agg) feeds deg AND top, and deg
# is joined twice; un-materialized this re-ran the 60M-row aggregate 4x
# and hit the memory cap (r8: ORACLE_RESOURCE).  MATERIALIZED pins one
# evaluation each; values unchanged.
_LINK_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT o.o_custkey AS cust, l.l_suppkey AS supp,
    CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
      AS BIGINT) AS cents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), deg AS MATERIALIZED (
  SELECT cust, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1
), top AS MATERIALIZED (
  SELECT cust, supp FROM (
    SELECT cust, supp,
      ROW_NUMBER() OVER (PARTITION BY supp
                         ORDER BY cents DESC, cust) AS rn
    FROM e
  ) WHERE rn <= {_LINK_FANOUT}
), pairs AS (
  SELECT a.cust AS cust_a, b.cust AS cust_b,
    CAST(COUNT(*) AS BIGINT) AS common_suppliers
  FROM top a JOIN top b ON b.supp = a.supp AND a.cust < b.cust
  GROUP BY 1, 2
)
SELECT p.cust_a, p.cust_b, p.common_suppliers,
  da.deg AS deg_a, db.deg AS deg_b,
  CAST(da.deg * db.deg AS BIGINT) AS pref_attachment
FROM pairs p
JOIN deg da ON da.cust = p.cust_a
JOIN deg db ON db.cust = p.cust_b
ORDER BY p.common_suppliers DESC, pref_attachment DESC, p.cust_a, p.cust_b
LIMIT {_LINK_TOPN}
"""


@query(
    "link_prediction_suppliers",
    oracle=_LINK_ORACLE,
    tags=("graph", "link-prediction", "top-k"),
)
def link_prediction_suppliers(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    e = (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .agg(
            F.sum(
                F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    e = e.localCheckpoint()  # adjacency grain feeds degree + rank cap
    deg = e.groupBy("cust").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    # Optimization r13 (guide §2.4): the per-supp top-8 rank cap and the
    # (cust_a < cust_b) pair self-join collapse into ONE groupBy(supp) —
    # the in-array (cents DESC, cust) sort/slice is the window's exact
    # ROW_NUMBER order, and pairs come from a ≤ 8·7/2 array expansion
    # (re-sorted by cust so u < v matches the join predicate) instead of
    # re-shuffling the capped list twice.
    from zeta_etl_spark.operators.graph import (
        pairs_from_arrays,
        topk_items_by_score,
    )

    top = topk_items_by_score(
        e, "supp", "cust", "cents", _LINK_FANOUT
    ).select(F.array_sort("items").alias("items"))
    pairs = (
        pairs_from_arrays(top, "cust_a", "cust_b")
        .groupBy("cust_a", "cust_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_suppliers"))
    )
    out = (
        pairs.join(
            deg.select(F.col("cust").alias("cust_a"), F.col("deg").alias("deg_a")),
            "cust_a",
        )
        .join(
            deg.select(F.col("cust").alias("cust_b"), F.col("deg").alias("deg_b")),
            "cust_b",
        )
        .select(
            "cust_a",
            "cust_b",
            "common_suppliers",
            "deg_a",
            "deg_b",
            (F.col("deg_a") * F.col("deg_b"))
            .cast("bigint")
            .alias("pref_attachment"),
        )
    )
    return out.orderBy(
        F.col("common_suppliers").desc(),
        F.col("pref_attachment").desc(),
        "cust_a",
        "cust_b",
    ).limit(_LINK_TOPN)


# --- centroid_silhouette -----------------------------------------------------

_SIL_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cluster_id, sv AS cv FROM e WHERE vec_id < {_ARI_K}
), ex AS (
  SELECT e.vec_id, CAST(i AS BIGINT) AS dim, e.sv[CAST(i AS INT)] AS v
  FROM e CROSS JOIN range(1, {_ARI_DIM + 1}) t(i)
), cx AS (
  SELECT s.cluster_id, CAST(i AS BIGINT) AS dim, s.cv[CAST(i AS INT)] AS cv
  FROM seeds s CROSS JOIN range(1, {_ARI_DIM + 1}) t(i)
), dists AS (
  SELECT ex.vec_id, cx.cluster_id,
    CAST(SUM((ex.v - cx.cv) * (ex.v - cx.cv)) AS BIGINT) AS dist2
  FROM ex JOIN cx ON ex.dim = cx.dim
  GROUP BY 1, 2
), two AS (
  SELECT vec_id,
    MAX(CASE WHEN rn = 1 THEN cluster_id END) AS cid,
    MAX(CASE WHEN rn = 1 THEN dist2 END) AS d1,
    MAX(CASE WHEN rn = 2 THEN dist2 END) AS d2
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cluster_id) AS rn
    FROM dists
  ) WHERE rn <= 2
  GROUP BY 1
), sil AS (
  SELECT vec_id, cid,
    CASE WHEN d2 = 0 THEN CAST(0 AS BIGINT)
         ELSE CAST(((d2 - d1) * 1000) // d2 AS BIGINT) END AS s_permille
  FROM two
)
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
  CAST(CAST(SUM(s_permille) AS BIGINT) // COUNT(*) AS BIGINT)
    AS avg_sil_permille,
  CAST(MIN(s_permille) AS BIGINT) AS min_sil_permille,
  CAST(MAX(s_permille) AS BIGINT) AS max_sil_permille
FROM sil GROUP BY 1
"""


@query(
    "centroid_silhouette",
    oracle=_SIL_ORACLE,
    tags=("vectors", "clustering", "evaluation"),
)
def centroid_silhouette(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select("vec_id", "sv")
    packed = (
        emb.where(F.col("vec_id") < _ARI_K)
        .select(F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    )
    # the sorted (dist2, cid) array gives own-centroid distance (argmin)
    # and the second-nearest in ONE zero-shuffle pass
    two = emb.transform(with_scalar_frame(packed)).select(
        F.expr(
            "array_sort(transform(cents, c -> struct("
            "aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (a, v) -> a + v) AS dist2, c.cid AS cid)))"
        ).alias("ds")
    ).select(
        F.expr("ds[0].cid").alias("cid"),
        F.expr("ds[0].dist2").alias("d1"),
        F.expr("ds[1].dist2").alias("d2"),
    )
    sil = two.select(
        "cid",
        F.expr(
            "case when d2 = 0 then 0L"
            " else cast(((d2 - d1) * 1000) div d2 as bigint) end"
        ).alias("s_permille"),
    )
    return sil.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.expr(
            "cast(cast(sum(s_permille) as bigint) div count(1) as bigint)"
        ).alias("avg_sil_permille"),
        F.min("s_permille").cast("bigint").alias("min_sil_permille"),
        F.max("s_permille").cast("bigint").alias("max_sil_permille"),
    )


# --- temperature_mixture_weights --------------------------------------------

_TEMP_ORACLE = """
WITH s AS (
  SELECT source, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
  FROM documents GROUP BY 1
), w AS (
  SELECT source, chars,
    CAST(floor(sqrt(CAST(chars AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w05
  FROM s
), t AS (
  SELECT CAST(SUM(chars) AS BIGINT) AS tot1,
    CAST(SUM(w05) AS BIGINT) AS tot05
  FROM w
)
SELECT w.source, w.chars AS total_chars,
  (w.chars * 1000000) // t.tot1 AS weight_ppm_tau1,
  (w.w05 * 1000000) // t.tot05 AS weight_ppm_tau05
FROM w CROSS JOIN t
"""


@query(
    "temperature_mixture_weights",
    oracle=_TEMP_ORACLE,
    tags=("curation", "mixture", "sampling"),
)
def temperature_mixture_weights(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    d = T(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("chars")
    )
    w = s.select(
        "source",
        "chars",
        F.expr(
            "cast(floor(sqrt(cast(chars as double)) * 1000 + 0.5) as bigint)"
        ).alias("w05"),
    )
    w = w.localCheckpoint()  # source grain feeds the totals + the rows
    t = w.agg(
        F.sum("chars").cast("bigint").alias("tot1"),
        F.sum("w05").cast("bigint").alias("tot05"),
    )
    return scalar_frame_crossjoin(w, t).select(
        "source",
        F.col("chars").alias("total_chars"),
        F.expr("(chars * 1000000) div tot1").alias("weight_ppm_tau1"),
        F.expr("(w05 * 1000000) div tot05").alias("weight_ppm_tau05"),
    )
