"""TPC-H completion batch: the two join shapes still missing from the
relational suite — Q5's *local supplier* constraint (a join predicate that
ties two dimension foreign keys of different fact-side rows together) and
Q9's product-profit rollup (fact⋈fact⋈dim with a LIKE-pruned dim and a
two-measure margin).

The driver's TPC-H-ish schema has no ``partsupp`` table, so Q2/Q11/Q16/Q20
cannot be expressed and Q9 is adapted: supply cost is proxied by
``p_retailprice * l_quantity`` (retailprice has 1 decimal, quantity is
integral → the product is 1-decimal exact, decimal-cast safe).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.deterministic import dec_sum
from zeta_etl_spark.queries.registry import T, query

# --- local_supplier_volume: TPC-H Q5 ----------------------------------------
# The defining predicate is c_nationkey = s_nationkey: revenue only counts
# when the CUSTOMER's nation supplied the line.  Distinct from
# regional_revenue (J12), which groups by the customer nation without the
# locality constraint.  Scale shape: lineitem⋈orders shuffles on orderkey;
# orders⋈customer on custkey; supplier/nation/region broadcast.  The
# locality filter is applied as an equi-join predicate (s_nationkey =
# c_nationkey), so Catalyst keeps it inside the broadcast hash join — no
# post-join filter pass over the fact rows.

_Q5_ORACLE = """
SELECT
  n.n_name AS nation_name,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@query("local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "tpch-q5", "J12"))
def local_supplier_volume(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# --- part_type_profit: TPC-H Q9 (adapted) -----------------------------------
# Profit per supplier-nation per order-year for parts matching a name
# pattern.  Cost proxy = p_retailprice * l_quantity (no partsupp table).
# DECIMAL determinism: revenue and cost are each exact-decimal summed
# SEPARATELY, converted to double, and subtracted ONCE — sum(a-b) as
# sum(a)-sum(b) avoids decimal-casting a mixed-scale difference while both
# engines perform the identical single IEEE subtraction.  Scale shape:
# the p_name LIKE filter prunes part BEFORE the broadcast, so the
# lineitem⋈part broadcast join doubles as a semi-filter on the fact table;
# the only all-to-all shuffle is lineitem⋈orders on orderkey.

_Q9_ORACLE = """
SELECT
  n.n_name AS nation_name,
  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE) AS revenue,
  CAST(SUM(CAST(p.p_retailprice * l.l_quantity AS DECIMAL(32,6)))
    AS DOUBLE) AS retail_cost,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)))
    AS DOUBLE)
    - CAST(SUM(CAST(p.p_retailprice * l.l_quantity AS DECIMAL(32,6)))
    AS DOUBLE) AS margin,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


@query("part_type_profit", oracle=_Q9_ORACLE, tags=("join", "tpch-q9", "agg"))
def part_type_profit(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    revenue = dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    cost = dec_sum(F.col("p_retailprice") * F.col("l_quantity"))
    return joined.groupBy(
        F.col("n_name").alias("nation_name"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(
        revenue.alias("revenue"),
        cost.alias("retail_cost"),
        (revenue - cost).alias("margin"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# --- market_concentration_hhi: Herfindahl-Hirschman index --------------------
# Supplier-revenue concentration per part type: HHI = Σ (share_ppm/100)²
# scaled — the antitrust/market-structure statistic.  Shares are exact
# integer basis points (floor), squared and summed as BIGINTs, so the
# index is integer-exact end-to-end (10000² × suppliers fits easily).
# Two aggregations: (type, supplier) revenue cents on one shuffle, then
# the type rollup with a window total over the aggregated frame.

_HHI_ORACLE = """
WITH rev AS (
  SELECT p.p_type, l.l_suppkey,
    SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
        AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), shares AS (
  SELECT p_type, l_suppkey,
    cents * 10000 // SUM(cents) OVER (PARTITION BY p_type) AS share_bp
  FROM rev
)
SELECT p_type,
  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
  CAST(MAX(share_bp) AS BIGINT) AS top_share_bp
FROM shares
GROUP BY p_type
"""


@query(
    "market_concentration_hhi", oracle=_HHI_ORACLE, tags=("agg", "hhi", "tpch")
)
def market_concentration_hhi(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.expr(
                "sum(cast(floor(l_extendedprice * (1 - l_discount) * 100"
                " + 0.5) as bigint))"
            ).alias("cents")
        )
    )
    shares = rev.select(
        "p_type",
        F.expr(
            "cents * 10000 div (sum(cents) over (partition by p_type))"
        ).alias("share_bp"),
    )
    return shares.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.col("share_bp") * F.col("share_bp"))
        .cast("bigint")
        .alias("hhi_bp2"),
        F.max("share_bp").cast("bigint").alias("top_share_bp"),
    )


# --- price_volume_mix: revenue-bridge decomposition --------------------------
# The BI "revenue bridge": ΔRevenue per part type between 1996 and 1997,
# split into the volume effect (quantity change at year-1 realized price)
# and the price/mix effect (the remainder) — volume + price ≡ ΔRevenue
# bit-exactly by construction (the remainder is literally Δ − volume).  Determinism: period revenues are
# exact decimal sums and quantities exact integers; the realized price is
# ONE double division, and both effects are built from the same
# expression tree in both engines.  Scale: the lineitem⋈orders shuffle on
# orderkey (date filter pushed to the orders side), part broadcast, then
# a |p_type|-sized frame.

_PVM_ORACLE = """
WITH li AS (
  SELECT p.p_type, year(o.o_orderdate) AS yr,
    CAST(l.l_quantity AS BIGINT) AS qty,
    CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(32,6)) AS rev
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p   ON p.p_partkey = l.l_partkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
), per AS (
  SELECT p_type,
    CAST(SUM(CASE WHEN yr = 1996 THEN qty ELSE 0 END) AS BIGINT) AS qty1,
    CAST(SUM(CASE WHEN yr = 1997 THEN qty ELSE 0 END) AS BIGINT) AS qty2,
    CAST(SUM(CASE WHEN yr = 1996 THEN rev END) AS DOUBLE) AS rev1,
    CAST(SUM(CASE WHEN yr = 1997 THEN rev END) AS DOUBLE) AS rev2
  FROM li GROUP BY p_type
)
SELECT p_type, qty1, qty2, rev1, rev2,
  rev2 - rev1 AS delta_revenue,
  (qty2 - qty1) * (rev1 / qty1) AS volume_effect,
  (rev2 - rev1) - (qty2 - qty1) * (rev1 / qty1) AS price_mix_effect
FROM per
WHERE qty1 > 0
"""


@query("price_volume_mix", oracle=_PVM_ORACLE, tags=("agg", "bi", "bridge"))
def price_volume_mix(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = T(spark, sf_dir, "part")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_type",
            F.year("o_orderdate").alias("yr"),
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.expr(
                "cast(l_extendedprice * (1 - l_discount) as decimal(32,6))"
            ).alias("rev"),
        )
    )
    per = base.groupBy("p_type").agg(
        F.sum(F.when(F.col("yr") == 1996, F.col("qty")).otherwise(0))
        .cast("bigint")
        .alias("qty1"),
        F.sum(F.when(F.col("yr") == 1997, F.col("qty")).otherwise(0))
        .cast("bigint")
        .alias("qty2"),
        F.sum(F.when(F.col("yr") == 1996, F.col("rev")))
        .cast("double")
        .alias("rev1"),
        F.sum(F.when(F.col("yr") == 1997, F.col("rev")))
        .cast("double")
        .alias("rev2"),
    )
    price1 = F.col("rev1") / F.col("qty1")
    vol = (F.col("qty2") - F.col("qty1")) * price1
    return per.filter(F.col("qty1") > 0).select(
        "p_type",
        "qty1",
        "qty2",
        "rev1",
        "rev2",
        (F.col("rev2") - F.col("rev1")).alias("delta_revenue"),
        vol.alias("volume_effect"),
        ((F.col("rev2") - F.col("rev1")) - vol).alias("price_mix_effect"),
    )


# --- bloom_join_reduction: Bloom semi-join reduction before the fact join ----
# The third join-reduction strategy (operators/scale.bloom_prefilter_join):
# the dim side's join keys become a broadcast Bloom bitmap that prunes the
# fact scan BEFORE the join shuffle.  The oracle is the PLAIN join — bloom
# has no false negatives and the exact join removes false positives, so the
# result must be bit-identical to an unprefiltered join.

_BLOOMJOIN_ORACLE = """
SELECT o.o_orderpriority AS priority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1
"""


@query(
    "bloom_join_reduction",
    oracle=_BLOOMJOIN_ORACLE,
    tags=("join", "bloom", "scale"),
)
def bloom_join_reduction(spark, sf_dir):
    from zeta_etl_spark.operators.scale import bloom_prefilter_join

    o = T(spark, sf_dir, "orders")
    c = (
        T(spark, sf_dir, "customer")
        .where("c_mktsegment = 'BUILDING'")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    joined = bloom_prefilter_join(o, c, ["o_custkey"], how="left_semi")
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))")
        .cast("bigint")
        .alias("total_cents"),
    )
