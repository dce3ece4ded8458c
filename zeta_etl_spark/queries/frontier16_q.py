"""Frontier batch 15 (round 8, session 5): graph clustering structure,
a recsys training step, exact wavelet decomposition, a privacy audit,
and robust estimation —

- ``brand_clustering_coefficient``: local clustering coefficient per
  brand over the co-purchase graph.  Edges = the top-40 within-order
  brand pairs by support (deterministic tie-break — a fixed-size edge
  list is the scale-stable alternative to a min-support threshold, the
  brand_triple lesson); cc(b) = closed neighbor pairs / C(deg,2) in ppm.
  The expensive step is ONE basket-pair aggregate; the graph algebra
  runs on a 40-row frame.
- ``als_user_factor_step``: one alternating-least-squares step for
  k=2 latent factors — item (brand) factors are deterministic md5 ±1
  signs, and each customer's factor vector is the CLOSED-FORM ridge
  solve u = (XᵀX + I)⁻¹ Xᵀr (2x2 inverse is rational: every entry an
  integer product over an integer determinant, emitted in exact ppm).
  The per-user normal equations are one groupBy — the "solve" never
  iterates and never leaves BIGINT.
- ``haar_wavelet_daily``: unnormalized Haar wavelet decomposition
  (levels 1-3) of the daily order-revenue series — approx = block sum,
  detail = signed block difference, computed as ONE weighted aggregate
  per level over the bounded day grain (weight = 1-2·bit, position =
  day offset div 2^level; all BIGINT cents, no float filter banks).
- ``k_anonymity_audit``: k-anonymity of the (nation, mktsegment,
  balance-band) quasi-identifier — for k in {2,5,10}: groups and rows
  below k and the at-risk fraction in ppm.  The re-identification
  audit a privacy pipeline runs before release; complements the local-
  DP randomized_response_counts.
- ``median_of_means_value``: median-of-means robust estimator of mean
  event value — 16 md5-assigned buckets, exact integer bucket means,
  lower median by exact rank (the heavy-tail-robust estimator with
  exponential concentration; Devroye et al.'16).  Reported next to the
  plain mean with the deviation.

Scale notes: the brand graph and Haar day grid are bounded alphabets;
the ALS solve and k-anonymity ride one aggregate each; bucket count for
median-of-means is fixed at 16 (estimator variance is set by bucket
count, not data volume).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
from zeta_etl_spark.queries.registry import T, query

# --- brand_clustering_coefficient ---------------------------------------------

_BCC_EDGES = 40

from zeta_etl_spark.functions.basket import (  # noqa: E402
    duck_brand_edges_cte,
    spark_brand_edges,
)

_BCC_ORACLE = f"""
WITH {duck_brand_edges_cte(_BCC_EDGES)}, nbr AS MATERIALIZED (
  SELECT ba AS b, bb AS n FROM edges UNION ALL SELECT bb, ba FROM edges
), deg AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS deg FROM nbr GROUP BY 1
), tri AS (
  SELECT x.b, CAST(COUNT(*) AS BIGINT) AS closed
  FROM nbr x JOIN nbr y ON x.b = y.b AND x.n < y.n
  JOIN edges e ON e.ba = x.n AND e.bb = y.n
  GROUP BY 1
)
SELECT d.b AS brand, d.deg,
  CAST(coalesce(t.closed, 0) AS BIGINT) AS closed_pairs,
  CAST(CASE WHEN d.deg < 2 THEN 0
    ELSE coalesce(t.closed, 0) * 2000000 // (d.deg * (d.deg - 1)) END
    AS BIGINT) AS clustering_ppm
FROM deg d LEFT JOIN tri t ON t.b = d.b
"""


@query(
    "brand_clustering_coefficient",
    oracle=_BCC_ORACLE,
    tags=("graph", "basket", "structure"),
)
def brand_clustering_coefficient(spark, sf_dir):
    edges = spark_brand_edges(spark, sf_dir, _BCC_EDGES)
    nbr = edges.select(
        F.col("ba").alias("b"), F.col("bb").alias("n")
    ).union(edges.select(F.col("bb").alias("b"), F.col("ba").alias("n")))
    deg = nbr.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    x, y = nbr.alias("x"), nbr.alias("y")
    wedge = x.join(
        y,
        (F.col("x.b") == F.col("y.b")) & (F.col("x.n") < F.col("y.n")),
    ).select(F.col("x.b").alias("b"), F.col("x.n").alias("u"), F.col("y.n").alias("v"))
    tri = (
        wedge.join(
            edges,
            (wedge.u == edges.ba) & (wedge.v == edges.bb),
            "left_semi",
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("closed"))
    )
    return (
        deg.join(tri, "b", "left")
        .select(
            F.col("b").alias("brand"),
            "deg",
            F.coalesce(F.col("closed"), F.lit(0))
            .cast("bigint")
            .alias("closed_pairs"),
            F.expr(
                "cast(case when deg < 2 then 0 else "
                "coalesce(closed, 0) * 2000000 div (deg * (deg - 1)) end "
                "as bigint)"
            ).alias("clustering_ppm"),
        )
    )


# --- als_user_factor_step -----------------------------------------------------

_ALS_X1_D = f"(1 - 2 * ({duck_hex2long(chr(39) + 'alsx1:' + chr(39) + ' || p_brand')} % 2))"
_ALS_X2_D = f"(1 - 2 * ({duck_hex2long(chr(39) + 'alsx2:' + chr(39) + ' || p_brand')} % 2))"

_ALS_ORACLE = f"""
WITH r AS (
  SELECT o.o_custkey AS custkey, p.p_brand,
    CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents,
    CAST({_ALS_X1_D} AS BIGINT) AS x1, CAST({_ALS_X2_D} AS BIGINT) AS x2
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), ne AS (
  SELECT custkey,
    CAST(COUNT(*) + 1 AS BIGINT) AS a11,     -- sum x1^2 + ridge(1)
    CAST(SUM(x1 * x2) AS BIGINT) AS a12,
    CAST(COUNT(*) + 1 AS BIGINT) AS a22,
    CAST(SUM(x1 * cents) AS BIGINT) AS b1,
    CAST(SUM(x2 * cents) AS BIGINT) AS b2,
    CAST(COUNT(*) AS BIGINT) AS n_items
  FROM r GROUP BY 1
)
SELECT custkey, n_items,
  CAST((a22 * b1 - a12 * b2) * 1000000 // (a11 * a22 - a12 * a12) AS BIGINT)
    AS u1_ppm,
  CAST((a11 * b2 - a12 * b1) * 1000000 // (a11 * a22 - a12 * a12) AS BIGINT)
    AS u2_ppm
FROM ne
"""


@query(
    "als_user_factor_step",
    oracle=_ALS_ORACLE,
    tags=("recsys", "ml", "factorization"),
)
def als_user_factor_step(spark, sf_dir):
    x1 = f"(1 - 2 * ({spark_hex2long(chr(39) + 'alsx1:' + chr(39) + ' || p_brand')} % 2))"
    x2 = f"(1 - 2 * ({spark_hex2long(chr(39) + 'alsx2:' + chr(39) + ' || p_brand')} % 2))"
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pt = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("o_custkey").alias("custkey"), "p_brand")
        .agg(
            F.sum(F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
            .cast("bigint")
            .alias("cents")
        )
        .withColumn("x1", F.expr(f"cast({x1} as bigint)"))
        .withColumn("x2", F.expr(f"cast({x2} as bigint)"))
    )
    ne = r.groupBy("custkey").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("a11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("a12"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("a22"),
        F.sum(F.col("x1") * F.col("cents")).cast("bigint").alias("b1"),
        F.sum(F.col("x2") * F.col("cents")).cast("bigint").alias("b2"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
    return ne.select(
        "custkey",
        "n_items",
        F.expr(
            "cast((a22 * b1 - a12 * b2) * 1000000"
            " div (a11 * a22 - a12 * a12) as bigint)"
        ).alias("u1_ppm"),
        F.expr(
            "cast((a11 * b2 - a12 * b1) * 1000000"
            " div (a11 * a22 - a12 * a12) as bigint)"
        ).alias("u2_ppm"),
    )


# --- haar_wavelet_daily -------------------------------------------------------

_HAAR_DAY_D = (
    "CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', "
    "date_trunc('day', CAST(o_orderdate AS TIMESTAMP))) // 86400 AS BIGINT)"
)
_HAAR_DAY_S = (
    "cast(unix_timestamp(date_trunc('day', o_orderdate)) div 86400 as bigint)"
)

_HAAR_ORACLE = f"""
WITH d AS MATERIALIZED (
  SELECT {_HAAR_DAY_D} AS day,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1
), d0 AS (
  SELECT MIN(day) AS d0 FROM d
), lv AS (
  -- 2^l as a BIGINT shift: DuckDB's ** returns DOUBLE and // with a
  -- DOUBLE operand is float division, not floor (and a bare 1 << l is
  -- 32-bit INTEGER — the round-6 lesson)
  SELECT l, (d.day - d0.d0) // (CAST(1 AS BIGINT) << l) AS pos,
    CAST(SUM(cents) AS BIGINT) AS approx,
    CAST(SUM(cents * (1 - 2 * (((d.day - d0.d0)
      // (CAST(1 AS BIGINT) << (l - 1))) % 2))) AS BIGINT) AS detail
  FROM d CROSS JOIN d0 CROSS JOIN UNNEST([1, 2, 3]) AS t(l)
  GROUP BY 1, 2
)
SELECT CAST(l AS BIGINT) AS level, CAST(pos AS BIGINT) AS pos, approx, detail
FROM lv
"""


@query(
    "haar_wavelet_daily",
    oracle=_HAAR_ORACLE,
    tags=("timeseries", "signal", "wavelet"),
)
def haar_wavelet_daily(spark, sf_dir):
    d = (
        T(spark, sf_dir, "orders")
        .groupBy(F.expr(_HAAR_DAY_S).alias("day"))
        .agg(
            F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    d = d.localCheckpoint()  # bounded day grain feeds d0 + 3 levels
    d0 = d.agg(F.min("day").alias("d0"))
    lev = (
        d.transform(with_scalar_frame(d0))
        .withColumn("l", F.explode(F.expr("array(1, 2, 3)")))
        .groupBy(
            F.col("l").cast("bigint").alias("level"),
            F.expr("(day - d0) div cast(pow(2, l) as bigint)")
            .cast("bigint")
            .alias("pos"),
        )
        .agg(
            F.sum("cents").cast("bigint").alias("approx"),
            F.sum(
                F.expr(
                    "cents * (1 - 2 * (((day - d0)"
                    " div cast(pow(2, l - 1) as bigint)) % 2))"
                )
            )
            .cast("bigint")
            .alias("detail"),
        )
    )
    return lev.select("level", "pos", "approx", "detail")


# --- k_anonymity_audit --------------------------------------------------------

_KA_ORACLE = """
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS bal_band,
    CAST(COUNT(*) AS BIGINT) AS grp_rows
  FROM customer GROUP BY 1, 2, 3
), tot AS (
  SELECT CAST(SUM(grp_rows) AS BIGINT) AS n_rows FROM q
), ks AS (
  SELECT k FROM UNNEST([2, 5, 10]) AS t(k)
)
SELECT CAST(ks.k AS BIGINT) AS k,
  CAST(SUM(CASE WHEN grp_rows < ks.k THEN 1 ELSE 0 END) AS BIGINT)
    AS groups_below_k,
  CAST(SUM(CASE WHEN grp_rows < ks.k THEN grp_rows ELSE 0 END) AS BIGINT)
    AS rows_below_k,
  CAST(SUM(CASE WHEN grp_rows < ks.k THEN grp_rows ELSE 0 END) * 1000000
    // tot.n_rows AS BIGINT) AS at_risk_ppm
FROM q CROSS JOIN ks CROSS JOIN tot
GROUP BY 1, tot.n_rows
"""


@query(
    "k_anonymity_audit",
    oracle=_KA_ORACLE,
    tags=("privacy", "audit", "governance"),
)
def k_anonymity_audit(spark, sf_dir):
    q = (
        T(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "cast(floor(c_acctbal * 100 + 0.5) as bigint) div 100000"
            ).alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("grp_rows"))
    )
    q = q.localCheckpoint()  # QI grain feeds the total + 3 thresholds
    tot = q.agg(F.sum("grp_rows").cast("bigint").alias("n_rows"))
    return (
        q.transform(with_scalar_frame(tot))
        .withColumn("k", F.explode(F.expr("array(2, 5, 10)")))
        .groupBy(F.col("k").cast("bigint").alias("k"), "n_rows")
        .agg(
            F.sum(F.when(F.col("grp_rows") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("groups_below_k"),
            F.sum(
                F.when(F.col("grp_rows") < F.col("k"), F.col("grp_rows"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("rows_below_k"),
        )
        .select(
            "k",
            "groups_below_k",
            "rows_below_k",
            F.expr("cast(rows_below_k * 1000000 div n_rows as bigint)")
            .alias("at_risk_ppm"),
        )
    )


# --- median_of_means_value ----------------------------------------------------

_MOM_B = 16
_MOM_KEY_D = "concat('mom:', CAST(event_id AS VARCHAR))"
_MOM_KEY_S = "concat('mom:', cast(event_id as string))"


def _mom_oracle() -> str:
    h = duck_hex2long(_MOM_KEY_D, digits=15)
    return f"""
WITH b AS (
  SELECT {h} % {_MOM_B} AS bucket,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), m AS (
  SELECT bucket, s // n AS mean_cents,
    ROW_NUMBER() OVER (ORDER BY s // n, bucket) AS rnk
  FROM b
), tot AS (
  SELECT CAST(SUM(s) // SUM(n) AS BIGINT) AS mean_cents,
    CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM b
)
SELECT tot.n_buckets,
  CAST(m.mean_cents AS BIGINT) AS mom_cents,
  tot.mean_cents AS plain_mean_cents,
  CAST(m.mean_cents - tot.mean_cents AS BIGINT) AS deviation_cents
FROM m CROSS JOIN tot
WHERE m.rnk = (tot.n_buckets + 1) // 2
"""


@query(
    "median_of_means_value",
    oracle=_mom_oracle(),
    tags=("statistics", "robust", "estimation"),
)
def median_of_means_value(spark, sf_dir):
    b = (
        T(spark, sf_dir, "events")
        .groupBy(
            (F.expr(spark_hex2long(_MOM_KEY_S)) % _MOM_B).alias(
                "bucket"
            )
        )
        .agg(
            F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
            .cast("bigint")
            .alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    b = b.localCheckpoint()  # 16-row frame feeds ranks + the global mean
    m = b.select(
        "bucket", F.expr("s div n").alias("mean_cents")
    ).withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("mean_cents", "bucket")),
    )
    tot = b.agg(
        F.expr("cast(sum(s) div sum(n) as bigint)").alias("plain_mean_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    return (
        m.transform(with_scalar_frame(tot))
        .filter(F.expr("rnk = (n_buckets + 1) div 2"))
        .select(
            "n_buckets",
            F.col("mean_cents").cast("bigint").alias("mom_cents"),
            "plain_mean_cents",
            (F.col("mean_cents") - F.col("plain_mean_cents"))
            .cast("bigint")
            .alias("deviation_cents"),
        )
    )


# --- l_diversity_audit ---------------------------------------------------------
# The complement of k_anonymity_audit (Machanavajjhala et al.):
# k-anonymity alone leaks when every row of a released group shares the
# SENSITIVE value — a group is l-diverse only if its sensitive attribute
# takes at least l distinct values.  Release = events projected to the
# quasi-identifiers (event type, hour-of-day, value band); sensitive
# attribute = user_id; k = 5 (groups below k are suppressed by the
# k-anonymity pass and excluded here).  For l in {2, 3, 5}: how many
# RELEASABLE groups are not l-diverse and how many rows they leak.
# Hour-of-day via pure epoch-integer arithmetic (both engines bucket
# identically); one groupBy on the QI grain feeds all three thresholds
# through the explode pattern shared with k_anonymity_audit.

_LDIV_ORACLE = """
WITH rel AS (
  SELECT event_type,
    (date_diff('second', TIMESTAMP '1970-01-01', CAST(ts AS TIMESTAMP))
     // 3600) % 24 AS hod,
    CAST(floor(value / 50) AS BIGINT) AS vband,
    user_id
  FROM events
), q AS (
  SELECT event_type, hod, vband,
    CAST(COUNT(*) AS BIGINT) AS grp_rows,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_sensitive
  FROM rel GROUP BY 1, 2, 3
), released AS (
  SELECT * FROM q WHERE grp_rows >= 5
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
    CAST(COALESCE(SUM(grp_rows), 0) AS BIGINT) AS n_rows
  FROM released
), ls AS (
  SELECT l FROM UNNEST([2, 3, 5]) AS t(l)
)
SELECT CAST(ls.l AS BIGINT) AS l,
  tot.n_groups AS released_groups,
  CAST(SUM(CASE WHEN n_sensitive < ls.l THEN 1 ELSE 0 END) AS BIGINT)
    AS weak_groups,
  CAST(SUM(CASE WHEN n_sensitive < ls.l THEN grp_rows ELSE 0 END)
    AS BIGINT) AS leaky_rows,
  CAST(SUM(CASE WHEN n_sensitive < ls.l THEN grp_rows ELSE 0 END)
    * 1000000 // tot.n_rows AS BIGINT) AS leaky_ppm
FROM released CROSS JOIN ls CROSS JOIN tot
GROUP BY 1, tot.n_groups, tot.n_rows
"""


@query(
    "l_diversity_audit",
    oracle=_LDIV_ORACLE,
    tags=("privacy", "audit", "governance", "l-diversity"),
)
def l_diversity_audit(spark, sf_dir):
    rel = T(spark, sf_dir, "events").select(
        "event_type",
        (
            (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                .cast("bigint")
                / F.lit(3600)
            ).cast("bigint")
            % 24
        ).alias("hod"),
        F.floor(F.col("value") / 50).cast("bigint").alias("vband"),
        "user_id",
    )
    q = rel.groupBy("event_type", "hod", "vband").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_sensitive"),
    )
    released = q.filter(F.col("grp_rows") >= 5)
    released = released.localCheckpoint()  # feeds totals + 3 thresholds
    tot = released.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.sum("grp_rows"), F.lit(0))
        .cast("bigint")
        .alias("n_rows"),
    )
    weak = F.col("n_sensitive") < F.col("l")
    return (
        released.transform(with_scalar_frame(tot))
        .withColumn("l", F.explode(F.expr("array(2, 3, 5)")))
        .groupBy(
            F.col("l").cast("bigint").alias("l"), "n_groups", "n_rows"
        )
        .agg(
            F.sum(F.when(weak, 1).otherwise(0))
            .cast("bigint")
            .alias("weak_groups"),
            F.sum(F.when(weak, F.col("grp_rows")).otherwise(0))
            .cast("bigint")
            .alias("leaky_rows"),
        )
        .select(
            "l",
            F.col("n_groups").alias("released_groups"),
            "weak_groups",
            "leaky_rows",
            F.expr("cast(leaky_rows * 1000000 div n_rows as bigint)")
            .alias("leaky_ppm"),
        )
    )
