"""TPC-H closing batch: the remaining classic decision-support shapes the
synthetic tables can express (the testdata has no ``partsupp`` and no
commit/receipt dates, so Q2/Q9/Q11/Q16/Q20/Q21-verbatim are out of reach;
Q21's EXISTS/NOT-EXISTS shape is re-expressed on shipdate lag instead).

Reference parity: the reference's SQL surface is Databricks SQL over DLT
tables (e.g. zetadex-transactions-helius-pipeline.py's gold-view CTEs); these
queries exercise the same join/agg/correlated-subquery shapes Spark-first —
correlated subqueries become window functions or one-row broadcasts instead
of per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.queries.registry import T, query

# --- customer_order_distribution (TPC-H Q13): left join + double agg ---------
# Distribution of customers by order count, with a join-side filter on the
# orders table (priority substitutes for Q13's comment LIKE).  The left join
# keeps 0-order customers; COUNT(col) counts matches only.  Scale shape: one
# shuffle per groupBy; the second groupBy input is one row per customer.

_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust
GROUP BY n_orders
"""


@query(
    "customer_order_distribution",
    oracle=_Q13_ORACLE,
    tags=("join", "agg", "tpch", "outer"),
)
def customer_order_distribution(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --- small_qty_revenue (TPC-H Q17): correlated AVG subquery → window ---------
# Q17's per-part correlated AVG becomes a window over the fact's own join
# key: one shuffle on l_partkey computes the mean AND filters against it in
# a single pass — no second scan, no self-join (the classic Spark rewrite).
# Determinism: quantities are integral doubles, so the mean is an exact
# BIGINT sum divided once; revenue is a DECIMAL sum divided by 7 once.

_Q17_ORACLE = """
WITH pq AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem
  GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(32,6))) AS DOUBLE) / 7.0
    AS avg_yearly,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.2 * pq.avg_qty
"""


@query("small_qty_revenue", oracle=_Q17_ORACLE, tags=("join", "agg", "tpch", "window"))
def small_qty_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    with_avg = li.withColumn(
        "avg_qty",
        F.sum(F.col("l_quantity").cast("bigint")).over(w).cast("double")
        / F.count(F.lit(1)).over(w),
    )
    small = with_avg.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    return small.agg(
        (dec_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- brand_size_revenue (TPC-H Q19): disjunctive join predicate --------------
# OR-of-ANDs across both join sides.  The equi key (partkey) still drives the
# join — the disjunction is a post-join filter, so Catalyst keeps a hash join
# rather than degrading to a nested-loop; part is broadcast.

_Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
     (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
      AND l.l_quantity BETWEEN 1 AND 11)
  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
      AND l.l_quantity BETWEEN 10 AND 20)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
      AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("brand_size_revenue", oracle=_Q19_ORACLE, tags=("join", "agg", "tpch"))
def brand_size_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    # pre-prune the broadcast side to the union of branch predicates
    p = T(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & (F.col("p_size") >= 1)
    )
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(branch)
    return joined.agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- market_share_by_year (TPC-H Q8 shape): conditional-share ratio ----------
# Among revenue from ASIA-region customers, NATION_7 suppliers' share per
# order year.  Numerator and denominator are exact DECIMAL sums; the share is
# ONE double division at the end (cross-engine-safe; never DECIMAL÷DECIMAL).

_Q8_ORACLE = """
WITH base AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
    ns.n_name AS supp_nation,
    CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)) AS vol
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = nc.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT order_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
                ELSE CAST(0 AS DECIMAL(32,6)) END) AS DOUBLE)
    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
  CAST(SUM(vol) AS DOUBLE) AS total_volume
FROM base
GROUP BY order_year
"""


@query("market_share_by_year", oracle=_Q8_ORACLE, tags=("join", "agg", "tpch"))
def market_share_by_year(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # customer-side nation pruned to ASIA via broadcast nation⋈region
    nc = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("_nc_key")
    )
    ns = n.select(
        F.col("n_nationkey").alias("_ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("_nc_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("_ns_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.col("supp_nation"),
            vol.cast("DECIMAL(32,6)").alias("vol"),
        )
    )
    dec0 = F.lit(0).cast("DECIMAL(32,6)")
    return base.groupBy("order_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", F.col("vol")).otherwise(
                    dec0
                )
            ).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share"),
        F.sum("vol").cast("double").alias("total_volume"),
    )


# --- late_sole_suppliers (TPC-H Q21 shape): EXISTS / NOT-EXISTS --------------
# Suppliers who were the ONLY late shipper on a multi-supplier order.  Q21's
# correlated EXISTS (another supplier on the order) and NOT EXISTS (another
# LATE supplier) collapse into one window over l_orderkey: n_supp >= 2 AND
# n_late = 1 AND this supplier late.  "Late" is shipdate > orderdate + 60
# days (the testdata has no commit/receipt dates).  Top-10 is orderBy+limit
# (TakeOrderedAndProject) before the rank window runs over just 10 rows.

_Q21_ORACLE = """
WITH ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
    MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), flagged AS (
  SELECT l_suppkey,
    COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
    SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late,
    is_late
  FROM ls
), waits AS (
  SELECT s.s_name, COUNT(*) AS numwait
  FROM flagged f
  JOIN supplier s ON s.s_suppkey = f.l_suppkey
  WHERE f.n_supp >= 2 AND f.n_late = 1 AND f.is_late = 1
  GROUP BY s.s_name
)
SELECT s_name, numwait, CAST(rn AS BIGINT) AS wait_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY numwait DESC, s_name) AS rn
  FROM waits
) t WHERE rn <= 10
"""


@query(
    "late_sole_suppliers",
    oracle=_Q21_ORACLE,
    tags=("join", "agg", "tpch", "window", "topk"),
)
def late_sole_suppliers(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    s = T(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    ls = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = ls.select(
        "l_suppkey",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
        "is_late",
    ).filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1) & (F.col("is_late") == 1)
    )
    waits = (
        flagged.join(F.broadcast(s), flagged.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    top = waits.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(10)
    wr = Window.orderBy(F.col("numwait").desc(), F.col("s_name"))
    return top.withColumn("wait_rank", F.row_number().over(wr).cast("bigint"))
