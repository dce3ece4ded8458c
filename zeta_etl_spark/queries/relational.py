"""Core relational queries: scans, filters, projections, joins, hash aggs.

Each query re-expresses an operator family from SURVEY.md §2 (row IDs cited
per query) on the driver's star schema.  Numeric aggregates run through exact
DECIMAL sums (functions.deterministic) so the DuckDB oracle hash-matches
bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions import dec_avg, dec_sum
from zeta_etl_spark.queries.registry import T, query

# --- pricing_summary: filter (P6) + hash agg with derived exprs (A2/A3) -----
# TPC-H Q1 shape; reference parity: hourly gold aggs
# (zetadex-transactions-helius-pipeline.py:777-793 compute count/sum per group
# the same way).  Scan → partial agg → final agg; predicate pushes to parquet.

_PRICING_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(32,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(32,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(32,6))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
    AS DECIMAL(32,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(32,6))) AS DOUBLE) / COUNT(l_quantity)
    AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(32,6))) AS DOUBLE) / COUNT(l_discount)
    AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_ORACLE, tags=("agg", "filter", "P6", "A2"))
def pricing_summary(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- part_brand_revenue: broadcast dim join (J1) + agg ----------------------
# Reference parity: stream-static enrichment joins
# (zetadex-transactions-helius-pipeline.py:380-387).  `part` is a dimension —
# explicitly broadcast so the fact side never shuffles for the join.

_BRAND_ORACLE = """
SELECT
  p.p_brand,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(32,6))) AS DOUBLE) AS total_qty
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@query("part_brand_revenue", oracle=_BRAND_ORACLE, tags=("join", "J1", "broadcast"))
def part_brand_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    # `part` scales with SF: no static broadcast hint — AQE runtime-broadcasts
    # it while it is small and falls back to a shuffle join at scale
    return (
        li.join(part, li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_quantity", "total_qty"),
        )
    )


# --- regional_revenue: multi-way key join (J12) through the full snowflake --
# customer⋈orders⋈lineitem⋈supplier⋈nation⋈region with a date-window predicate
# (P9).  Dims broadcast; the orders⋈lineitem join shuffles on orderkey only.

_REGIONAL_ORACLE = """
SELECT
  r.r_name AS region_name,
  n.n_name AS nation_name,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
"""


@query("regional_revenue", oracle=_REGIONAL_ORACLE, tags=("join", "J12", "P9"))
def regional_revenue(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    # customer/orders/lineitem scale with SF → shuffle (AQE may runtime-
    # broadcast at small SF); nation/region/supplier are bounded dims → hint.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# --- customers_without_orders: left anti join (J3) --------------------------
# Reference parity: MM exclusion anti-join
# (zetadex-transactions-helius-pipeline.py:1556-1560).

_ANTI_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(32,6))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
"""


@query("customers_without_orders", oracle=_ANTI_ORACLE, tags=("join", "J3", "anti"))
def customers_without_orders(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal", "total_acctbal"),
        )
    )


# --- order_priority_check: left semi join (TPC-H Q4 shape) ------------------

_SEMI_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
"""


@query("order_priority_check", oracle=_SEMI_ORACLE, tags=("join", "semi"))
def order_priority_check(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = T(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- set ops: intersect / except (SURVEY §2.7 — unused in reference, provided
# for completeness).  Customers seen in both halves of the order history vs
# only the first half.

_SETOPS_ORACLE = """
WITH early AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
), late AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
SELECT 'both' AS cohort, COUNT(*) AS n_customers
FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late) t
UNION ALL
SELECT 'early_only' AS cohort, COUNT(*) AS n_customers
FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late) t
"""


@query("customer_cohorts_setops", oracle=_SETOPS_ORACLE, tags=("setop", "U3"))
def customer_cohorts_setops(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    early = o.filter(F.col("o_orderdate") < cutoff).select("o_custkey").distinct()
    late = o.filter(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()
    both = (
        early.intersect(late)
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("both").alias("cohort"), "n_customers")
    )
    early_only = (
        early.exceptAll(late).distinct()
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("early_only").alias("cohort"), "n_customers")
    )
    return both.unionByName(early_only)


# --- distinct count (A6) + global agg (A12) ---------------------------------

_DISTINCT_ORACLE = """
SELECT
  o.o_orderstatus,
  COUNT(DISTINCT o.o_custkey) AS n_customers,
  COUNT(DISTINCT o.o_orderpriority) AS n_priorities,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(32,6))) AS DOUBLE) AS total_price
FROM orders o
GROUP BY o.o_orderstatus
"""


@query("order_status_distincts", oracle=_DISTINCT_ORACLE, tags=("agg", "A6"))
def order_status_distincts(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "total_price"),
    )


# --- conditional agg (A3) + null handling (P11) -----------------------------
# Reference parity: maker/taker conditional sums
# (zetadex-transactions-helius-pipeline.py:1716-1717).

_CONDAGG_ORACLE = """
SELECT
  n.n_name AS nation_name,
  CAST(SUM(CAST(CASE WHEN c.c_mktsegment = 'BUILDING' THEN c.c_acctbal
    ELSE 0 END AS DECIMAL(32,6))) AS DOUBLE) AS building_balance,
  CAST(SUM(CAST(CASE WHEN c.c_acctbal < 0 THEN c.c_acctbal ELSE 0 END
    AS DECIMAL(32,6))) AS DOUBLE) AS negative_balance,
  COUNT(CASE WHEN c.c_acctbal > 5000 THEN 1 END) AS n_rich,
  COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("nation_balance_breakdown", oracle=_CONDAGG_ORACLE, tags=("agg", "A3"))
def nation_balance_breakdown(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dec_sum(
                F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal"))
                .otherwise(F.lit(0.0)),
                "building_balance",
            ),
            dec_sum(
                F.when(F.col("c_acctbal") < 0, F.col("c_acctbal")).otherwise(
                    F.lit(0.0)
                ),
                "negative_balance",
            ),
            F.count(F.when(F.col("c_acctbal") > 5000, F.lit(1))).alias("n_rich"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
