"""Final relational/time-series batch: TPC-H classic shapes (Q3 shipping
priority, Q6 forecast revenue) for relational breadth, and linear-interpolation
gap filling — the hypertable-style time-series operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- shipping_priority (TPC-H Q3 shape): 3-way join + agg + deterministic
# top-10 ----------------------------------------------------------------------

_Q3_ORACLE = """
WITH base AS (
  SELECT l.l_orderkey,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
      AS DOUBLE) AS revenue,
    o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT l_orderkey, revenue, o_orderdate, o_orderpriority,
       CAST(rn AS BIGINT) AS revenue_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rn
  FROM base
) t WHERE rn <= 10
"""


@query("shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk", "tpch"))
def shipping_priority(spark, sf_dir):
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return (
        base.withColumn("revenue_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("revenue_rank") <= 10)
        .select(
            "l_orderkey", "revenue", "o_orderdate", "o_orderpriority",
            "revenue_rank",
        )
    )


# --- forecast_revenue (TPC-H Q6 shape): pure pushdown-filter aggregate -------

_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(32,6))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("forecast_revenue", oracle=_Q6_ORACLE, tags=("agg", "filter", "tpch"))
def forecast_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- gap_fill_interpolate: hypertable-style densify + linear interpolation ---
# Hourly per-type means densified over the full spine; missing hours filled by
# linear interpolation between the previous and next observed values.  The
# interpolation weight is an exact integer hour ratio, so the arithmetic is
# engine-deterministic (single double expression per row).

_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
    CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) / COUNT(value) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(hour_ts) AS lo, max(hour_ts) AS hi FROM hourly
), spine AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds), (SELECT hi FROM bounds),
                                INTERVAL 1 HOUR)) AS hour_ts
), grid AS (
  SELECT s.hour_ts, t.event_type, h.avg_value
  FROM spine s
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN hourly h ON h.hour_ts = s.hour_ts AND h.event_type = t.event_type
), ctx AS (
  SELECT *,
    last_value(avg_value IGNORE NULLS) OVER w_prev AS prev_val,
    last_value(CASE WHEN avg_value IS NOT NULL THEN hour_ts END IGNORE NULLS)
      OVER w_prev AS prev_ts,
    first_value(avg_value IGNORE NULLS) OVER w_next AS next_val,
    first_value(CASE WHEN avg_value IS NOT NULL THEN hour_ts END IGNORE NULLS)
      OVER w_next AS next_ts
  FROM grid
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT hour_ts, event_type,
  CAST(avg_value IS NOT NULL AS BIGINT) AS is_observed,
  CASE
    WHEN avg_value IS NOT NULL THEN avg_value
    WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
      prev_val + (next_val - prev_val)
        * (CAST(date_diff('hour', prev_ts, hour_ts) AS DOUBLE)
           / date_diff('hour', prev_ts, next_ts))
    ELSE COALESCE(prev_val, next_val)
  END AS filled_value
FROM ctx
"""


@query("gap_fill_interpolate", oracle=_GAPFILL_ORACLE, tags=("timeseries", "gapfill"))
def gap_fill_interpolate(spark, sf_dir):
    from zeta_etl_spark.functions import dec_avg

    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("event_type")
    ).agg(dec_avg("value", "avg_value"))
    bounds = hourly.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("hour_ts")
    )
    # bound: event_type is a closed enum in this schema (5 values)
    types = ev.select("event_type").distinct()
    grid = spine.transform(with_scalar_frame(types, bound=16)).join(
        hourly, ["hour_ts", "event_type"], "left"
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("avg_value").isNotNull(), F.col("hour_ts"))
    ctx = grid.select(
        "hour_ts",
        "event_type",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(obs_ts, ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.first("avg_value", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(obs_ts, ignorenulls=True).over(w_next).alias("next_ts"),
    )
    hours = lambda a, b: (  # noqa: E731 — whole-hour timestamps: exact ints
        F.unix_timestamp(F.col(b).cast("timestamp"))
        - F.unix_timestamp(F.col(a).cast("timestamp"))
    ) / 3600
    interp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        hours("prev_ts", "hour_ts").cast("double")
        / hours("prev_ts", "next_ts")
    )
    filled = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(), interp
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
    )
    return ctx.select(
        "hour_ts",
        "event_type",
        F.col("avg_value").isNotNull().cast("bigint").alias("is_observed"),
        filled.alias("filled_value"),
    )


# --- event_type_pivot: native PIVOT (wide reshaping, U4's inverse) ----------
# Spark's .pivot() with EXPLICIT values (deterministic column order + no
# extra distinct-values job — the implicit form scans once to discover
# columns, which at 100 TB is a full extra pass).

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT user_id,
  {", ".join(
    "CAST(SUM(CAST(CASE WHEN event_type = '" + t + "' THEN value ELSE 0 END "
    "AS DECIMAL(32,6))) AS DOUBLE) AS " + t for t in _PIVOT_TYPES)}
FROM events GROUP BY user_id
"""


@query("event_type_pivot", oracle=_PIVOT_ORACLE, tags=("reshape", "pivot", "U4"))
def event_type_pivot(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.sum(F.col("value").cast("DECIMAL(32,6)")).cast("double"))
        .fillna(0.0, subset=_PIVOT_TYPES)
    )


# --- daily_type_cube: CUBE + GROUPING_ID (A10 depth beyond rollup) ----------

_CUBE_ORACLE = """
SELECT
  COALESCE(event_type, '<all>') AS event_type,
  COALESCE(strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d'),
           '<all>') AS day_str,
  CAST(GROUPING(event_type) * 2 + GROUPING(date_trunc('day',
       CAST(ts AS TIMESTAMP))) AS BIGINT) AS gid,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, date_trunc('day', CAST(ts AS TIMESTAMP)))
"""


@query("daily_type_cube", oracle=_CUBE_ORACLE, tags=("agg", "cube", "A10"))
def daily_type_cube(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    cube = ev.cube(F.col("event_type"), day.alias("_day")).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "sum_value"),
    )
    return cube.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        F.coalesce(
            F.date_format("_day", "yyyy-MM-dd"), F.lit("<all>")
        ).alias("day_str"),
        "gid",
        "n_events",
        "sum_value",
    )


# --- promo_revenue_share: TPC-H Q14 shape (conditional agg over a join) -----

_Q14_ORACLE = """
SELECT
  100.00 * CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
      AS DECIMAL(32,6))) AS DOUBLE)
    / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
      AS DECIMAL(32,6))) AS DOUBLE) AS promo_revenue_pct,
  COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1995-09-01'
  AND l.l_shipdate < DATE '1995-10-01'
"""


@query("promo_revenue_share", oracle=_Q14_ORACLE, tags=("agg", "tpch", "A3"))
def promo_revenue_share(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast("DECIMAL(32,6)")).cast("double")
            / F.sum(rev.cast("DECIMAL(32,6)")).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- large_orders: TPC-H Q18 shape (HAVING + semi join back to detail) ------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(32,6))) > 150
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(32,6))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
"""


@query("large_orders", oracle=_Q18_ORACLE, tags=("join", "agg", "tpch", "having"), decimal_faithful=False)
def large_orders(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("DECIMAL(32,6)")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    return (
        o.join(big, o["o_orderkey"] == big["_bigkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l.alias("_d"), o["o_orderkey"] == F.col("_d.l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("_d.l_quantity").cast("DECIMAL(32,6)"))
            .cast("double")
            .alias("total_qty")
        )
    )


# --- dormant_customers: TPC-H Q22 shape (scalar subquery + anti join) -------

_Q22_CUTOFF = "1997-06-01"

_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(32,6))) AS DOUBLE) AS total_bal
FROM customer c CROSS JOIN avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '{_Q22_CUTOFF}')
GROUP BY c.c_nationkey
"""


@query("dormant_customers", oracle=_Q22_ORACLE, tags=("join", "anti", "tpch", "J3"))
def dormant_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    # AVG over positive balances: exact decimal sum / count (dec_avg), then
    # the single-row threshold broadcasts into the filter
    avg_bal = c.filter("c_acctbal > 0").agg(
        (
            F.sum(F.col("c_acctbal").cast("DECIMAL(32,6)")).cast("double")
            / F.count("c_acctbal")
        ).alias("ab")
    )
    rich = c.transform(with_scalar_frame(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    recent = o.filter(F.col("o_orderdate") >= _Q22_CUTOFF)
    dormant = rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("DECIMAL(32,6)"))
        .cast("double")
        .alias("total_bal"),
    )


# --- returned_items: TPC-H Q10 shape (returned-revenue top-k) ---------------
# Customers ranked by revenue lost to returns in a quarter: fact⋈fact joins
# shuffle, nation broadcasts, top-20 via deterministic (revenue DESC,
# custkey) ordering computed as a row_number so the cut is total-order
# stable in both engines.

_Q10_ORACLE = """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
      AS DOUBLE) AS revenue,
    COUNT(*) AS n_returned_items
  FROM customer c
  JOIN orders o   ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, nation_name, revenue, n_returned_items,
  CAST(rn AS BIGINT) AS revenue_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rn
  FROM rev
) t WHERE rn <= 20
"""


@query("returned_items", oracle=_Q10_ORACLE, tags=("join", "agg", "tpch", "topk"))
def returned_items(spark, sf_dir):
    from pyspark.sql.window import Window as W

    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
    )
    # scale shape: orderBy+limit plans TakeOrderedAndProject (per-partition
    # top-20 + merge — no global shuffle); the rank window then runs over
    # just those 20 rows, so the single-partition WindowExec is harmless
    top = rev.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)
    w = W.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return top.withColumn(
        "revenue_rank", F.row_number().over(w).cast("bigint")
    )


# --- top_revenue_supplier: TPC-H Q15 shape (scalar-max subquery) ------------
# Suppliers achieving the quarter's MAXIMUM revenue: the revenue table is
# aggregated once, its max is a one-row broadcast, and the equality join
# back is the classic view+scalar-subquery pattern the reference would
# express as a Databricks temp view.

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(32,6)))
      AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
), mx AS (SELECT MAX(total_revenue) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
CROSS JOIN mx WHERE r.total_revenue = mx.m
"""


@query("top_revenue_supplier", oracle=_Q15_ORACLE, tags=("join", "agg", "tpch", "scalar"))
def top_revenue_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = T(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.transform(with_scalar_frame(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- nation_trade_volume: TPC-H Q7 shape (bilateral trade matrix) ------------
# Revenue shipped between (supplier nation, customer nation) pairs per year:
# two broadcast nation lookups on one fact join chain.

_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE) AS volume,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_nationkey < 8 AND nc.n_nationkey < 8
  AND ns.n_nationkey <> nc.n_nationkey
GROUP BY 1, 2, 3
"""


@query("nation_trade_volume", oracle=_Q7_ORACLE, tags=("join", "agg", "tpch"))
def nation_trade_volume(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 8)
    ns = n.select(
        F.col("n_nationkey").alias("_ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("_nc_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("_ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("_nc_key"))
        .filter(F.col("_ns_key") != F.col("_nc_key"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
    ).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"),
        F.count(F.lit(1)).alias("n_items"),
    )
