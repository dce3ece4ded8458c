"""Frontier batch 12 (round 8, session 4): frequent itemsets beyond pairs,
causal/sequential experiment readouts, item-item CF, and shrinkage —

- ``brand_triple_support``: 3-itemset support mining over order baskets
  on the bounded BRAND alphabet (25 values — part-level triples dilute
  to support 0 as the part universe grows with data; the brand rollup is
  the alphabet a merchandiser actually mines).  Work is the within-order
  3-way self-join = sum(|brand basket|^3) with |basket| <= ~7, never
  |alphabet|^3 and never |orders|^2; output is the top-30 by support
  with relative support_ppm.  No fixed min-support: any absolute (or
  single-scale relative) threshold empties or floods the result as SF
  changes — measured on this corpus: max triple support is 1.4% of
  orders at sf0.001 but 0.4% at sf0.1.
- ``difference_in_differences``: the 2x2 DiD readout — md5 arms x
  pre/post periods (split at data-min day + 15), per-user-average spend
  per cell from exact integer sums, DiD = (T_post - T_pre) -
  (C_post - C_pre) as one deterministic scalar row.
- ``group_sequential_monitor``: sequential experiment monitoring — the
  daily cumulative two-proportion z statistic per arm against a Pocock
  critical value (2.413, 5-look alpha=0.05, a Python literal — no engine
  evaluates the boundary math), flagging each day whether the trial
  could stop.  Day grain is bounded by the window; converter counts are
  first-conversion-day cumulative sums, one pass.
- ``item_item_cf_topk``: item-item collaborative filtering neighbors —
  cosine similarity over co-purchase vectors, candidate pairs bounded by
  RANK ADJACENCY (top-12 parts per customer by spend), top-3 neighbors
  per item via a per-item window.  The ranked-adjacency cap is the same
  scale device as link prediction: pairs <= 66 x |customers|.
- ``eb_shrunken_rates``: empirical-Bayes shrinkage of per-part return
  rates toward the global rate — the "smoothed CTR" ranking primitive.
  The between-group variance sums per-group contributions ppm-floored to
  BIGINT BEFORE aggregation (order-independent, the geometric-median
  rule); prior strength is moment-matched then clamped, and the final
  shrunk rate is a per-row deterministic scalar.

Scale notes: every pair/triple space is bounded by basket size or rank
caps; day/arm grains are bounded; no float accumulates across rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.operators.scalar_frame import (
    scalar_frame_crossjoin,
    with_scalar_frame,
)
from zeta_etl_spark.queries.registry import T, query

# --- brand_triple_support ----------------------------------------------------

_TRI_TOPN = 30

# Scale device (r9, after the sf10 sweep caught both earlier forms):
# the naive 3-way self-join exhausted DuckDB's memory cap and the
# per-ORDER lateral-unnest enumeration ground past the 900 s oracle
# watchdog (15M baskets × |basket|³ pre-filter rows).  Collapse baskets
# to the COMPOSITION grain first: identical sorted brand-sets group to
# one row with a count, so the triple enumeration runs over the
# distinct-composition space (bounded by Σ C(25,k) — the 25-brand
# alphabet — NOT by order count), and support(a,b,c) = Σ cnt over
# compositions containing the triple.  Value-identical by distributivity
# of the sum; both engines get the same reduction.
_TRI_ORACLE = f"""
WITH i AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM i
), bk AS (
  SELECT l_orderkey, list_sort(list(p_brand)) AS bs FROM i GROUP BY 1
), comp AS (
  SELECT bs, CAST(COUNT(*) AS BIGINT) AS cnt FROM bk GROUP BY bs
), t AS (
  SELECT t1.a AS brand_a, t2.bb AS brand_b, t3.c AS brand_c,
    CAST(SUM(cnt) AS BIGINT) AS support
  FROM comp
  CROSS JOIN UNNEST(bs) AS t1(a)
  CROSS JOIN UNNEST(bs) AS t2(bb)
  CROSS JOIN UNNEST(bs) AS t3(c)
  WHERE t1.a < t2.bb AND t2.bb < t3.c
  GROUP BY 1, 2, 3
)
SELECT brand_a, brand_b, brand_c, support,
  CAST(support * 1000000 // n.n_orders AS BIGINT) AS support_ppm
FROM t CROSS JOIN n
ORDER BY support DESC, brand_a, brand_b, brand_c
LIMIT {_TRI_TOPN}
"""


@query(
    "brand_triple_support",
    oracle=_TRI_ORACLE,
    tags=("mining", "association-rules", "itemsets"),
)
def brand_triple_support(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    items = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select("l_orderkey", "p_brand")
    # composition grain: ONE shuffle to distinct-brand baskets (collect_set
    # dedups inline — optimization r13, guide §2.4: the former distinct
    # pre-pass re-shuffled the fact rows a second time), one to distinct
    # compositions (≤ Σ C(25,k) rows); the |basket|³ triple enumeration
    # then explodes a FRAME BOUNDED BY THE BRAND ALPHABET, never by
    # order count — the fact table is touched exactly once.
    bk = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("p_brand")).alias("bs")
    )
    comp = bk.groupBy("bs").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    comp = comp.localCheckpoint()  # feeds n_orders + the enumeration
    n = comp.agg(F.sum("cnt").cast("bigint").alias("n_orders"))
    # bs is sorted + element-distinct, so position order IS value order
    x = comp.select(
        "bs", "cnt", F.posexplode("bs").alias("i", "brand_a")
    )
    y = x.select(
        "bs", "cnt", "i", "brand_a",
        F.posexplode("bs").alias("j", "brand_b"),
    ).where(F.col("j") > F.col("i"))
    z = y.select(
        "cnt", "j", "brand_a", "brand_b",
        F.posexplode("bs").alias("k", "brand_c"),
    ).where(F.col("k") > F.col("j"))
    t = z.groupBy("brand_a", "brand_b", "brand_c").agg(
        F.sum("cnt").cast("bigint").alias("support")
    )
    return (
        scalar_frame_crossjoin(t, n)
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "support",
            F.expr("cast(support * 1000000 div n_orders as bigint)").alias(
                "support_ppm"
            ),
        )
        .orderBy(F.col("support").desc(), "brand_a", "brand_b", "brand_c")
        .limit(_TRI_TOPN)
    )


# --- difference_in_differences ----------------------------------------------

_ARM = "concat('ab1:', CAST(user_id AS VARCHAR))"
_ARM_S = "concat('ab1:', cast(user_id as string))"
_DAY_DUCK = (
    "CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', "
    "date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)"
)
_DAY_SPARK = "cast(unix_timestamp(date_trunc('day', ts)) div 86400 as bigint)"


def _did_oracle() -> str:
    arm = duck_hex2long(_ARM, digits=8)
    return f"""
WITH d0 AS (
  SELECT MIN({_DAY_DUCK}) AS d0 FROM events
), u AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN {_DAY_DUCK} < d0.d0 + 15
      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS pre_cents,
    CAST(SUM(CASE WHEN {_DAY_DUCK} >= d0.d0 + 15
      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS post_cents
  FROM events CROSS JOIN d0 GROUP BY user_id, d0.d0
), g AS (
  SELECT
    CAST(SUM(CASE WHEN {arm} % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
    CAST(SUM(CASE WHEN {arm} % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
    CAST(SUM(CASE WHEN {arm} % 2 = 1 THEN pre_cents ELSE 0 END)
      AS BIGINT) AS t_pre,
    CAST(SUM(CASE WHEN {arm} % 2 = 1 THEN post_cents ELSE 0 END)
      AS BIGINT) AS t_post,
    CAST(SUM(CASE WHEN {arm} % 2 = 0 THEN pre_cents ELSE 0 END)
      AS BIGINT) AS c_pre,
    CAST(SUM(CASE WHEN {arm} % 2 = 0 THEN post_cents ELSE 0 END)
      AS BIGINT) AS c_post
  FROM u
)
SELECT n_t, n_c,
  CAST(floor(10.0 * t_pre / n_t + 0.5) AS BIGINT) AS t_pre_milli,
  CAST(floor(10.0 * t_post / n_t + 0.5) AS BIGINT) AS t_post_milli,
  CAST(floor(10.0 * c_pre / n_c + 0.5) AS BIGINT) AS c_pre_milli,
  CAST(floor(10.0 * c_post / n_c + 0.5) AS BIGINT) AS c_post_milli,
  CAST(floor(10.0 * (CAST(t_post AS DOUBLE) / n_t
      - CAST(t_pre AS DOUBLE) / n_t
      - (CAST(c_post AS DOUBLE) / n_c - CAST(c_pre AS DOUBLE) / n_c))
    + 0.5) AS BIGINT) AS did_milli
FROM g
"""


@query(
    "difference_in_differences",
    oracle=_did_oracle(),
    tags=("experiment", "causal", "statistics"),
)
def difference_in_differences(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    d0 = e.agg(F.min(F.expr(_DAY_SPARK)).alias("d0"))
    u = (
        scalar_frame_crossjoin(e, d0)
        .groupBy("user_id")
        .agg(
            F.expr(
                f"cast(sum(case when ({_DAY_SPARK}) < d0 + 15 then"
                " cast(floor(value * 100 + 0.5) as bigint) else 0 end)"
                " as bigint)"
            ).alias("pre_cents"),
            F.expr(
                f"cast(sum(case when ({_DAY_SPARK}) >= d0 + 15 then"
                " cast(floor(value * 100 + 0.5) as bigint) else 0 end)"
                " as bigint)"
            ).alias("post_cents"),
        )
    )
    arm = spark_hex2long(_ARM_S, digits=8)
    g = u.agg(
        F.sum(F.expr(f"case when ({arm}) % 2 = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_t"),
        F.sum(F.expr(f"case when ({arm}) % 2 = 0 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_c"),
        F.sum(F.expr(f"case when ({arm}) % 2 = 1 then pre_cents else 0 end"))
        .cast("bigint")
        .alias("t_pre"),
        F.sum(
            F.expr(f"case when ({arm}) % 2 = 1 then post_cents else 0 end")
        )
        .cast("bigint")
        .alias("t_post"),
        F.sum(F.expr(f"case when ({arm}) % 2 = 0 then pre_cents else 0 end"))
        .cast("bigint")
        .alias("c_pre"),
        F.sum(
            F.expr(f"case when ({arm}) % 2 = 0 then post_cents else 0 end")
        )
        .cast("bigint")
        .alias("c_post"),
    )
    return g.select(
        "n_t",
        "n_c",
        F.expr("cast(floor(10.0 * t_pre / n_t + 0.5) as bigint)").alias(
            "t_pre_milli"
        ),
        F.expr("cast(floor(10.0 * t_post / n_t + 0.5) as bigint)").alias(
            "t_post_milli"
        ),
        F.expr("cast(floor(10.0 * c_pre / n_c + 0.5) as bigint)").alias(
            "c_pre_milli"
        ),
        F.expr("cast(floor(10.0 * c_post / n_c + 0.5) as bigint)").alias(
            "c_post_milli"
        ),
        F.expr(
            "cast(floor(10.0 * (cast(t_post as double) / n_t"
            " - cast(t_pre as double) / n_t"
            " - (cast(c_post as double) / n_c"
            "    - cast(c_pre as double) / n_c)) + 0.5) as bigint)"
        ).alias("did_milli"),
    )


# --- group_sequential_monitor ------------------------------------------------

_POCOCK_5LOOK = 2.413  # Pocock critical value, K=5 looks, alpha=0.05


def _gsm_oracle() -> str:
    arm = duck_hex2long(_ARM, digits=8)
    return f"""
WITH fc AS (
  SELECT user_id, CAST({arm} % 2 AS BIGINT) AS t,
    MIN(CASE WHEN event_type = 'purchase' THEN {_DAY_DUCK} END) AS conv_day
  FROM events GROUP BY 1
), arms AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n1,
    CAST(SUM(1 - t) AS BIGINT) AS n0
  FROM fc
), cd AS (
  SELECT t, conv_day AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM fc WHERE conv_day IS NOT NULL GROUP BY 1, 2
), spine AS (
  SELECT d, t FROM (SELECT DISTINCT {_DAY_DUCK} AS d FROM events)
  CROSS JOIN (SELECT unnest([0, 1]) AS t)
), run AS (
  SELECT spine.d, spine.t,
    CAST(SUM(COALESCE(cd.c, 0)) OVER (PARTITION BY spine.t
      ORDER BY spine.d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS x
  FROM spine LEFT JOIN cd ON cd.t = spine.t AND cd.d = spine.d
), cum AS (
  SELECT d,
    MAX(CASE WHEN t = 1 THEN x END) AS x1,
    MAX(CASE WHEN t = 0 THEN x END) AS x0
  FROM run GROUP BY 1
), z AS (
  SELECT d, x1, x0,
    (CAST(x1 AS DOUBLE) / a.n1 - CAST(x0 AS DOUBLE) / a.n0)
      / nullif(sqrt((CAST(x1 + x0 AS DOUBLE) / (a.n1 + a.n0))
        * (1.0 - CAST(x1 + x0 AS DOUBLE) / (a.n1 + a.n0))
        * (1.0 / a.n1 + 1.0 / a.n0)), 0.0) AS zv
  FROM cum CROSS JOIN arms a
)
SELECT d AS epoch_day, x1 AS converted_treatment, x0 AS converted_control,
  CAST(floor(zv * 1000 + 0.5) AS BIGINT) AS z_milli,
  CAST(CASE WHEN abs(zv) > {_POCOCK_5LOOK!r} THEN 1 ELSE 0 END AS BIGINT)
    AS boundary_crossed
FROM z
"""


@query(
    "group_sequential_monitor",
    oracle=_gsm_oracle(),
    tags=("experiment", "sequential", "statistics"),
)
def group_sequential_monitor(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    arm = spark_hex2long(_ARM_S, digits=8)
    fc = e.groupBy("user_id").agg(
        F.min(
            F.expr(
                f"case when event_type = 'purchase' then ({_DAY_SPARK}) end"
            )
        ).alias("conv_day"),
    ).select(
        F.expr(f"cast(({arm}) % 2 as bigint)").alias("t"), "conv_day"
    )
    fc = fc.localCheckpoint()  # user grain feeds arm sizes + conv-day counts
    arms = fc.agg(
        F.sum("t").cast("bigint").alias("n1"),
        F.sum(F.expr("1 - t")).cast("bigint").alias("n0"),
    )
    # cumulative converters ride the bounded (arm, day) grain: per-day
    # first-conversion counts + one running frame — never a day x user
    # multiply
    cd = (
        fc.filter(F.col("conv_day").isNotNull())
        .groupBy("t", F.col("conv_day").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    spine = (
        e.select(F.expr(_DAY_SPARK).alias("d"))
        .distinct()
        .select("d", F.explode(F.array(F.lit(0), F.lit(1))).alias("t"))
        .select("d", F.col("t").cast("bigint").alias("t"))
    )
    run_w = (
        Window.partitionBy("t")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = (
        spine.join(cd, ["t", "d"], "left")
        .select(
            "d",
            "t",
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(run_w)
            .cast("bigint")
            .alias("x"),
        )
    )
    cum = run.groupBy("d").agg(
        F.max(F.when(F.col("t") == 1, F.col("x"))).alias("x1"),
        F.max(F.when(F.col("t") == 0, F.col("x"))).alias("x0"),
    )
    z = cum.transform(with_scalar_frame(arms)).select(
        "d",
        "x1",
        "x0",
        F.expr(
            "(cast(x1 as double) / n1 - cast(x0 as double) / n0)"
            " / nullif(sqrt((cast(x1 + x0 as double) / (n1 + n0))"
            "   * (1.0 - cast(x1 + x0 as double) / (n1 + n0))"
            "   * (1.0 / n1 + 1.0 / n0)), 0.0)"
        ).alias("zv"),
    )
    return z.select(
        F.col("d").alias("epoch_day"),
        F.col("x1").alias("converted_treatment"),
        F.col("x0").alias("converted_control"),
        F.expr("cast(floor(zv * 1000 + 0.5) as bigint)").alias("z_milli"),
        F.expr(
            f"cast(case when abs(zv) > {_POCOCK_5LOOK!r} then 1 else 0 end"
            " as bigint)"
        ).alias("boundary_crossed"),
    )


# --- item_item_cf_topk -------------------------------------------------------

_CF_CAP = 12
_CF_K = 3

_CF_ORACLE = f"""
WITH e AS (
  SELECT o.o_custkey AS cust, l.l_partkey AS part,
    CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
      AS BIGINT) AS cents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), deg AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1
), top AS (
  SELECT cust, part FROM (
    SELECT cust, part,
      ROW_NUMBER() OVER (PARTITION BY cust
                         ORDER BY cents DESC, part) AS rn
    FROM e
  ) WHERE rn <= {_CF_CAP}
), co AS (
  SELECT a.part AS part_a, b.part AS part_b,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM top a JOIN top b ON b.cust = a.cust AND a.part <> b.part
  GROUP BY 1, 2
), scored AS (
  SELECT co.part_a, co.part_b, co.c,
    CAST(floor(1000000.0 * co.c
      / sqrt(CAST(da.deg AS DOUBLE) * CAST(db.deg AS DOUBLE)) + 0.5)
      AS BIGINT) AS cosine_ppm
  FROM co
  JOIN deg da ON da.part = co.part_a
  JOIN deg db ON db.part = co.part_b
)
SELECT part_a, part_b, c AS co_count, cosine_ppm FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY part_a
      ORDER BY cosine_ppm DESC, part_b) AS rn
  FROM scored
) WHERE rn <= {_CF_K}
"""


@query(
    "item_item_cf_topk",
    oracle=_CF_ORACLE,
    tags=("recsys", "similarity", "top-k"),
)
def item_item_cf_topk(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    e = (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .agg(
            F.sum(
                F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    e = e.localCheckpoint()  # adjacency feeds degrees + the rank cap
    deg = e.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    # Optimization r13 (guide §2.4): the rank cap and the directed pair
    # generation collapse into ONE groupBy(cust) — the per-cust top-12 by
    # (cents DESC, part) is an in-array sort/slice (exactly the window's
    # ROW_NUMBER total order), and the a<>b self-join (2 more exchanges
    # of the capped list) becomes a bounded 12·11 array expansion.
    from zeta_etl_spark.operators.graph import (
        ordered_pairs_from_arrays,
        topk_items_by_score,
    )

    top = topk_items_by_score(e, "cust", "part", "cents", _CF_CAP)
    co = (
        ordered_pairs_from_arrays(top, "part_a", "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    scored = (
        co.join(
            deg.select(F.col("part").alias("part_a"), F.col("deg").alias("da")),
            "part_a",
        )
        .join(
            deg.select(F.col("part").alias("part_b"), F.col("deg").alias("db")),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "c",
            F.expr(
                "cast(floor(1000000.0 * c"
                " / sqrt(cast(da as double) * cast(db as double)) + 0.5)"
                " as bigint)"
            ).alias("cosine_ppm"),
        )
    )
    wk = Window.partitionBy("part_a").orderBy(
        F.col("cosine_ppm").desc(), "part_b"
    )
    return (
        scored.select(
            "part_a",
            "part_b",
            F.col("c").alias("co_count"),
            "cosine_ppm",
            F.row_number().over(wk).alias("rn"),
        )
        .filter(F.col("rn") <= _CF_K)
        .drop("rn")
    )


# --- eb_shrunken_rates -------------------------------------------------------

_EB_ORACLE = """
WITH s AS (
  SELECT l_partkey AS part, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
), g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(x) AS BIGINT) AS xx FROM s
), vb AS (
  SELECT CAST(SUM(CAST(floor(1000000.0 * s.n
      * (CAST(s.x AS DOUBLE) / s.n - CAST(g.xx AS DOUBLE) / g.nn)
      * (CAST(s.x AS DOUBLE) / s.n - CAST(g.xx AS DOUBLE) / g.nn))
      AS BIGINT)) AS BIGINT) AS t
  FROM s CROSS JOIN g
), m AS (
  SELECT least(greatest(
      (CAST(g.xx AS DOUBLE) / g.nn) * (1.0 - CAST(g.xx AS DOUBLE) / g.nn)
      / greatest(CAST(vb.t AS DOUBLE) / (1000000.0 * CAST(g.nn AS DOUBLE)),
                 1e-12), 1.0), 10000.0) AS m,
    CAST(g.xx AS DOUBLE) / g.nn AS p0
  FROM g CROSS JOIN vb
)
SELECT s.part, s.n, s.x,
  CAST((s.x * 1000000) // s.n AS BIGINT) AS raw_ppm,
  CAST(floor(1000000.0 * (CAST(s.x AS DOUBLE) + m.m * m.p0)
    / (CAST(s.n AS DOUBLE) + m.m) + 0.5) AS BIGINT) AS shrunk_ppm
FROM s CROSS JOIN m
"""


@query(
    "eb_shrunken_rates",
    oracle=_EB_ORACLE,
    tags=("statistics", "shrinkage", "ranking"),
)
def eb_shrunken_rates(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    s = s.localCheckpoint()  # part grain feeds globals + the output rows
    g = s.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("x").cast("bigint").alias("xx"),
    )
    # per-group variance contribution ppm-floored to BIGINT BEFORE the sum:
    # order-independent exact aggregation of a float-valued term
    vb = (
        s.transform(with_scalar_frame(g))
        .select(
            F.expr(
                "cast(floor(1000000.0 * n"
                " * (cast(x as double) / n - cast(xx as double) / nn)"
                " * (cast(x as double) / n - cast(xx as double) / nn))"
                " as bigint)"
            ).alias("term")
        )
        .agg(F.sum("term").cast("bigint").alias("t"))
    )
    m = (
        scalar_frame_crossjoin(g, vb)
        .select(
            F.expr(
                "least(greatest("
                "(cast(xx as double) / nn) * (1.0 - cast(xx as double) / nn)"
                " / greatest(cast(t as double) / (1000000.0"
                " * cast(nn as double)), 1e-12), 1.0), 10000.0)"
            ).alias("m"),
            F.expr("cast(xx as double) / nn").alias("p0"),
        )
    )
    # m = one global-agg row crossed with another → exactly 1 row; the
    # bound pins the invariant the plan walker can't see through the join
    return scalar_frame_crossjoin(s, m, bound=1).select(
        "part",
        "n",
        "x",
        F.expr("cast((x * 1000000) div n as bigint)").alias("raw_ppm"),
        F.expr(
            "cast(floor(1000000.0 * (cast(x as double) + m * p0)"
            " / (cast(n as double) + m) + 0.5) as bigint)"
        ).alias("shrunk_ppm"),
    )
