"""Frontier batch 13 (round 8, session 4): semi-supervised propagation,
coreset selection, conformal calibration, active-learning acquisition,
and off-policy evaluation —

- ``label_propagation_step``: one semi-supervised label-propagation round
  over the hyperplane-LSH neighborhood graph.  20% of vectors
  (vec_id % 5 = 0) keep their label; every node takes the majority label
  of up to 4 KNOWN anchors in its bucket (anchors = the 4 smallest
  known vec_ids per bucket — a deterministic bounded adjacency, degree
  <= 4, never within-bucket all-pairs).  Output is the per-true-label
  accuracy of the propagated labels on the held-out 80% — the standard
  1-round transductive readout.
- ``kcenter_coreset_step``: greedy k-center (farthest-point) coreset
  selection, 3 unrolled rounds — the classic data-pruning/curation
  selector (Sener & Savarese'18 uses exactly this greedy).  Each round
  is one full scan + argmax against the broadcast selected set; the
  covering radius BEFORE each pick is reported (monotone decreasing).
  Exact integer distances; deterministic argmax tie-break on vec_id.
- ``conformal_interval_width``: split-conformal calibration of the 7-day
  moving-average forecaster — nonconformity = |error| on even epoch
  days, q90 by EXACT rank (ceil(0.9(n+1)) order statistic, no
  interpolation), empirical coverage of +-q90 on the held-out odd days.
  The finite-sample-valid uncertainty interval, engine-exact.
- ``uncertainty_margin_acquisition``: active-learning batch selection —
  the 20 vectors with the smallest margin between nearest and
  second-nearest seed centroid (least-margin uncertainty sampling), one
  zero-shuffle pass over the broadcast packed seeds.
- ``ips_policy_value``: off-policy evaluation by inverse-propensity
  scoring — logged uniform arms (md5, p = 1/2), target policy
  "treat iff user's event count >= the exact median", IPS value =
  2/n * sum(reward where logged arm == policy arm).  The median is an
  exact value-grain rank statistic; everything stays integral to ppm.

Scale notes: adjacency/argmax fanouts are all bounded (4 anchors, 8
seeds, day grain, 20-row acquisitions); each k-center round is one
linear scan; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.operators.scalar_frame import (
    scalar_frame_crossjoin,
    with_scalar_frame,
)
from zeta_etl_spark.queries.registry import T, query

# --- label_propagation_step --------------------------------------------------

_LP_PLANES = 4
_LP_DIM = 64
_LP_DEG = 4


def _lp_planes():
    from zeta_etl_spark.operators.vectors import hyperplane_params

    return hyperplane_params(_LP_PLANES, _LP_DIM)


def _lp_oracle() -> str:
    from zeta_etl_spark.operators.vectors import duck_hyperplane_bucket_sql

    bucket = duck_hyperplane_bucket_sql(_lp_planes())
    return f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), b AS (
  SELECT vec_id, label, CAST({bucket} AS BIGINT) AS bucket FROM e
), anchors AS (
  SELECT bucket, vec_id, label FROM (
    SELECT bucket, vec_id, label,
      ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
    FROM b WHERE vec_id % 5 = 0
  ) WHERE rn <= {_LP_DEG}
), votes AS (
  SELECT n.vec_id, n.label AS true_label, a.label AS vote
  FROM b n JOIN anchors a
    ON a.bucket = n.bucket AND a.vec_id <> n.vec_id
  WHERE n.vec_id % 5 <> 0
), pred AS (
  SELECT vec_id, true_label, vote AS pred_label FROM (
    SELECT vec_id, true_label, vote,
      ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY COUNT(*) DESC, vote) AS rn
    FROM votes GROUP BY vec_id, true_label, vote
  ) WHERE rn = 1
)
SELECT true_label, CAST(COUNT(*) AS BIGINT) AS n_predicted,
  CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct,
  (CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // COUNT(*) AS accuracy_ppm
FROM pred GROUP BY 1
"""


@query(
    "label_propagation_step",
    oracle=_lp_oracle(),
    tags=("vectors", "semi-supervised", "graph"),
)
def label_propagation_step(spark, sf_dir):
    from pyspark.sql import Window

    from zeta_etl_spark.operators.vectors import lsh_bucket, scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("label").cast("bigint").alias("label"), "sv"
    )
    b = emb.select(
        "vec_id",
        "label",
        lsh_bucket("sv", _lp_planes()).cast("bigint").alias("bucket"),
    )
    b = b.localCheckpoint()  # bucket frame feeds anchors + the unlabeled side
    w = Window.partitionBy("bucket").orderBy("vec_id")
    anchors = (
        b.filter(F.expr("vec_id % 5 = 0"))
        .select("bucket", "vec_id", "label", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _LP_DEG)
        .select(
            "bucket",
            F.col("vec_id").alias("a_id"),
            F.col("label").alias("vote"),
        )
    )
    votes = (
        b.filter(F.expr("vec_id % 5 <> 0"))
        .join(anchors, "bucket")
        .filter(F.col("a_id") != F.col("vec_id"))
        .select("vec_id", F.col("label").alias("true_label"), "vote")
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("cnt").desc(), F.col("vote")
    )
    pred = (
        votes.groupBy("vec_id", "true_label", "vote")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "vec_id",
            "true_label",
            "vote",
            F.row_number().over(wv).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("true_label", F.col("vote").alias("pred_label"))
    )
    return pred.groupBy("true_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_predicted"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.expr(
            "cast(sum(case when pred_label = true_label then 1 else 0 end)"
            " * 1000000 div count(1) as bigint)"
        ).alias("accuracy_ppm"),
    )


# --- kcenter_coreset_step ----------------------------------------------------

_KC_ROUNDS = 3


def _kc_oracle() -> str:
    dist = (
        "CAST(list_sum(list_transform(range(1, {d}), "
        "i -> (sv[CAST(i AS INT)] - {c}[CAST(i AS INT)])"
        " * (sv[CAST(i AS INT)] - {c}[CAST(i AS INT)]))) AS BIGINT)"
    )
    d = _LP_DIM + 1
    return f"""
WITH e AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), c0 AS (
  SELECT sv AS cv FROM e WHERE vec_id = 0
), d1 AS (
  SELECT e.vec_id, e.sv, {dist.format(d=d, c="c0.cv")} AS dist
  FROM e CROSS JOIN c0
), p1 AS (
  SELECT vec_id AS c1_id, sv AS cv, dist AS r1 FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY dist DESC, vec_id) AS rn FROM d1
  ) WHERE rn = 1
), d2 AS (
  SELECT d1.vec_id, d1.sv,
    least(d1.dist, {dist.format(d=d, c="p1.cv")}) AS dist
  FROM d1 CROSS JOIN p1
), p2 AS (
  SELECT vec_id AS c2_id, sv AS cv, dist AS r2 FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY dist DESC, vec_id) AS rn FROM d2
  ) WHERE rn = 1
), d3 AS (
  SELECT d2.vec_id, least(d2.dist, {dist.format(d=d, c="p2.cv")}) AS dist
  FROM d2 CROSS JOIN p2
), p3 AS (
  SELECT vec_id AS c3_id, dist AS r3 FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY dist DESC, vec_id) AS rn FROM d3
  ) WHERE rn = 1
)
SELECT CAST(r.round AS BIGINT) AS round,
  CAST(CASE r.round WHEN 1 THEN p1.c1_id WHEN 2 THEN p2.c2_id
       ELSE p3.c3_id END AS BIGINT) AS center_id,
  CAST(CASE r.round WHEN 1 THEN p1.r1 WHEN 2 THEN p2.r2
       ELSE p3.r3 END AS BIGINT) AS covering_radius
FROM range(1, {_KC_ROUNDS + 1}) r(round)
CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3
"""


@query(
    "kcenter_coreset_step",
    oracle=_kc_oracle(),
    tags=("vectors", "coreset", "curation"),
)
def kcenter_coreset_step(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select("vec_id", "sv")
    emb = emb.localCheckpoint()  # scanned once per greedy round
    dist = (
        "cast(aggregate(zip_with(sv, {c}, (x, y) -> (x - y) * (x - y)), "
        "0L, (a, v) -> a + v) as bigint)"
    )
    # global agg (not a bare filter) so the broadcast side is PROVABLY one
    # row — the lint's unbounded-nested-loop rule and the scalar-frame
    # invariant both read it straight off the plan
    c0 = (
        emb.filter(F.col("vec_id") == 0)
        .agg(F.max("sv").alias("cv"))
    )
    d1 = scalar_frame_crossjoin(emb, c0).select(
        "vec_id", "sv", F.expr(dist.format(c="cv")).alias("dist")
    )
    # argmax with (dist desc, vec_id asc) tie-break: max of
    # (dist, -vec_id, sv) — vec_id is unique so sv never orders
    p1 = d1.agg(
        F.max(F.struct(F.col("dist"), (-F.col("vec_id")).alias("nid"), "sv")).alias("m")
    ).select(
        (-F.col("m.nid")).cast("bigint").alias("c1_id"),
        F.col("m.sv").alias("cv"),
        F.col("m.dist").cast("bigint").alias("r1"),
    )
    d2 = scalar_frame_crossjoin(d1, p1).select(
        "vec_id",
        "sv",
        F.expr("least(dist, " + dist.format(c="cv") + ")").alias("dist"),
    )
    p2 = d2.agg(
        F.max(F.struct(F.col("dist"), (-F.col("vec_id")).alias("nid"), "sv")).alias("m")
    ).select(
        (-F.col("m.nid")).cast("bigint").alias("c2_id"),
        F.col("m.sv").alias("cv2"),
        F.col("m.dist").cast("bigint").alias("r2"),
    )
    d3 = scalar_frame_crossjoin(d2, p2).select(
        "vec_id",
        F.expr("least(dist, " + dist.format(c="cv2") + ")").alias("dist"),
    )
    p3 = d3.agg(
        F.max(F.struct(F.col("dist"), (-F.col("vec_id")).alias("nid"))).alias("m")
    ).select(
        (-F.col("m.nid")).cast("bigint").alias("c3_id"),
        F.col("m.dist").cast("bigint").alias("r3"),
    )
    rounds = scalar_frame_crossjoin(
        scalar_frame_crossjoin(
            p1.select("c1_id", "r1"), p2.select("c2_id", "r2")
        ),
        p3,
        bound=1,
    ).select(
        F.explode(
            F.expr(
                "array(struct(1L as round, c1_id as center_id,"
                " r1 as covering_radius),"
                " struct(2L as round, c2_id as center_id,"
                " r2 as covering_radius),"
                " struct(3L as round, c3_id as center_id,"
                " r3 as covering_radius))"
            )
        ).alias("s")
    )
    return rounds.select(
        F.col("s.round").cast("bigint").alias("round"),
        F.col("s.center_id").cast("bigint").alias("center_id"),
        F.col("s.covering_radius").cast("bigint").alias("covering_radius"),
    )


# --- conformal_interval_width ------------------------------------------------

_CONF_ORACLE = """
WITH daily AS (
  SELECT CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
      date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)
    AS epoch_day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), fc AS (
  SELECT epoch_day, cents,
    CAST(SUM(cents) OVER (ORDER BY epoch_day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) // 7 AS fcast,
    COUNT(*) OVER (ORDER BY epoch_day
      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS c7
  FROM daily
), scored AS (
  SELECT epoch_day, abs(cents - fcast) AS score,
    epoch_day % 2 = 0 AS is_cal
  FROM fc WHERE c7 = 7
), cal AS (
  SELECT score, ROW_NUMBER() OVER (ORDER BY score, epoch_day) AS rn,
    COUNT(*) OVER () AS n
  FROM scored WHERE is_cal
), q AS (
  SELECT CAST(MIN(CASE WHEN rn >= least((9 * (n + 1) + 9) // 10, n)
    THEN score END) AS BIGINT) AS q90,
    CAST(MAX(n) AS BIGINT) AS n_cal
  FROM cal
)
SELECT q.n_cal,
  CAST(COUNT(*) AS BIGINT) AS n_eval,
  q.q90 AS q90_width_cents,
  (CAST(SUM(CASE WHEN s.score <= q.q90 THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // COUNT(*) AS coverage_ppm
FROM scored s CROSS JOIN q
WHERE NOT s.is_cal
GROUP BY q.n_cal, q.q90
"""


@query(
    "conformal_interval_width",
    oracle=_CONF_ORACLE,
    tags=("statistics", "conformal", "forecast"),
)
def conformal_interval_width(spark, sf_dir):
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "cast(unix_timestamp(date_trunc('day', ts)) div 86400 as bigint)"
        ).alias("epoch_day")
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("epoch_day").rowsBetween(-7, -1)
    fc = daily.select(
        "epoch_day",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w).alias("c7"),
    )
    scored = fc.filter(F.col("c7") == 7).select(
        "epoch_day",
        F.expr("abs(cents - (s7 div 7))").alias("score"),
        F.expr("epoch_day % 2 = 0").alias("is_cal"),
    )
    scored = scored.localCheckpoint()  # day grain feeds cal quantile + eval
    wr = Window.orderBy("score", "epoch_day")
    cal = scored.filter("is_cal").select(
        "score",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    q = cal.agg(
        F.expr(
            "cast(min(case when rn >= least((9 * (n + 1) + 9) div 10, n)"
            " then score end) as bigint)"
        ).alias("q90"),
        F.max("n").cast("bigint").alias("n_cal"),
    )
    return (
        scalar_frame_crossjoin(scored.filter(~F.col("is_cal")), q)
        .groupBy("n_cal", "q90")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.expr(
                "cast(sum(case when score <= q90 then 1 else 0 end)"
                " * 1000000 div count(1) as bigint)"
            ).alias("coverage_ppm"),
        )
        .select(
            "n_cal",
            "n_eval",
            F.col("q90").alias("q90_width_cents"),
            "coverage_ppm",
        )
    )


# --- uncertainty_margin_acquisition ------------------------------------------

_UM_K = 8
_UM_TOPN = 20


def _um_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cluster_id, sv AS cv FROM e WHERE vec_id < {_UM_K}
), dists AS (
  SELECT e.vec_id, s.cluster_id,
    CAST(list_sum(list_transform(range(1, {_LP_DIM + 1}),
      i -> (e.sv[CAST(i AS INT)] - s.cv[CAST(i AS INT)])
         * (e.sv[CAST(i AS INT)] - s.cv[CAST(i AS INT)])))
      AS BIGINT) AS dist2
  FROM e CROSS JOIN seeds s
), two AS (
  SELECT vec_id,
    MAX(CASE WHEN rn = 1 THEN cluster_id END) AS cid,
    MAX(CASE WHEN rn = 1 THEN dist2 END) AS d1,
    MAX(CASE WHEN rn = 2 THEN dist2 END) AS d2
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cluster_id) AS rn
    FROM dists
  ) WHERE rn <= 2 GROUP BY 1
)
SELECT vec_id, CAST(cid AS BIGINT) AS assigned_cluster,
  CAST(d2 - d1 AS BIGINT) AS margin
FROM two
ORDER BY margin, vec_id
LIMIT {_UM_TOPN}
"""


@query(
    "uncertainty_margin_acquisition",
    oracle=_um_oracle(),
    tags=("vectors", "active-learning", "top-k"),
)
def uncertainty_margin_acquisition(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select("vec_id", "sv")
    packed = (
        emb.where(F.col("vec_id") < _UM_K)
        .select(F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    )
    two = emb.transform(with_scalar_frame(packed)).select(
        "vec_id",
        F.expr(
            "array_sort(transform(cents, c -> struct("
            "aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (a, v) -> a + v) AS dist2, c.cid AS cid)))"
        ).alias("ds"),
    ).select(
        "vec_id",
        F.expr("cast(ds[0].cid as bigint)").alias("assigned_cluster"),
        F.expr("cast(ds[1].dist2 - ds[0].dist2 as bigint)").alias("margin"),
    )
    return two.orderBy("margin", "vec_id").limit(_UM_TOPN)


# --- ips_policy_value --------------------------------------------------------

_IPS_ARM = "concat('ab1:', CAST(user_id AS VARCHAR))"
_IPS_ARM_S = "concat('ab1:', cast(user_id as string))"


def _ips_oracle() -> str:
    arm = duck_hex2long(_IPS_ARM, digits=8)
    return f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS r,
    CAST({arm} % 2 AS BIGINT) AS a
  FROM events GROUP BY 1
), vg AS (
  SELECT n_ev, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY 1
), med AS (
  SELECT CAST(MIN(CASE WHEN cum * 2 >= tot THEN n_ev END) AS BIGINT) AS med
  FROM (
    SELECT n_ev, CAST(SUM(cnt) OVER (ORDER BY n_ev
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      CAST(SUM(cnt) OVER () AS BIGINT) AS tot
    FROM vg
  )
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN u.a = (CASE WHEN u.n_ev >= med.med THEN 1 ELSE 0 END)
    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
  (2 * 1000000 * CAST(SUM(CASE
      WHEN u.a = (CASE WHEN u.n_ev >= med.med THEN 1 ELSE 0 END)
      THEN u.r ELSE 0 END) AS BIGINT)) // COUNT(*) AS ips_value_ppm
FROM u CROSS JOIN med
GROUP BY med.med
"""


@query(
    "ips_policy_value",
    oracle=_ips_oracle(),
    tags=("experiment", "off-policy", "statistics"),
)
def ips_policy_value(spark, sf_dir):
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    arm = spark_hex2long(_IPS_ARM_S, digits=8)
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
    ).select(
        "n_ev", "r", F.expr(f"cast(({arm}) % 2 as bigint)").alias("a")
    )
    u = u.localCheckpoint()  # user grain feeds the median + the estimator
    vg = u.groupBy("n_ev").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    run = Window.orderBy("n_ev").rowsBetween(Window.unboundedPreceding, 0)
    med = vg.select(
        "n_ev",
        F.sum("cnt").over(run).cast("bigint").alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("bigint").alias("tot"),
    ).agg(
        F.expr(
            "cast(min(case when cum * 2 >= tot then n_ev end) as bigint)"
        ).alias("med")
    )
    return (
        scalar_frame_crossjoin(u, med)
        .groupBy("med")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(
                F.expr(
                    "case when a = (case when n_ev >= med then 1 else 0 end)"
                    " then 1 else 0 end"
                )
            )
            .cast("bigint")
            .alias("n_matched"),
            F.expr(
                "cast(2 * 1000000 * sum(case when a = (case when n_ev >= med"
                " then 1 else 0 end) then r else 0 end) div count(1)"
                " as bigint)"
            ).alias("ips_value_ppm"),
        )
        .drop("med")
    )
