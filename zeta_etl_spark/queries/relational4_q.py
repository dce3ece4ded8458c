"""SQL-surface batch: GROUPING SETS, correlated LATERAL joins, and
IGNORE NULLS window gap-filling.

Three ANSI surfaces the registry had not yet exercised directly (CUBE and
ROLLUP are covered; explicit GROUPING SETS picks an arbitrary subset of
grouping combinations; LATERAL is Spark 4's correlated-subquery join; the
IGNORE NULLS frame is the standard forward-fill for sparse series).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

# --- grouping_sets_report: explicit grouping-set selection -------------------
# Unlike CUBE (all 2^n combinations) or ROLLUP (the prefix chain), GROUPING
# SETS names exactly the aggregation grains a report needs — here
# (source, lang), (source), and the grand total, skipping the
# lang-only grain a CUBE would also pay for.  GROUPING_ID disambiguates
# rows whose grouping columns are genuinely NULL from subtotal rows.
# Scale: one Expand of 3 (not 4) grouping-set rows per input row feeding a
# single partial-aggregated shuffle — the Expand factor is the chosen set
# count, the exact reason to prefer GROUPING SETS over CUBE at 100 TB.

_GS_ORACLE = """
SELECT source, lang,
  CAST(GROUPING(source, lang) AS BIGINT) AS gid,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), ())
"""


@query(
    "grouping_sets_report",
    oracle=_GS_ORACLE,
    tags=("agg", "grouping-sets", "A10"),
)
def grouping_sets_report(spark, sf_dir):
    T(spark, sf_dir, "documents").createOrReplaceTempView("_gs_documents")
    return spark.sql("""
      SELECT source, lang,
        CAST(GROUPING_ID(source, lang) AS BIGINT) AS gid,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM _gs_documents
      GROUP BY GROUPING SETS ((source, lang), (source), ())
    """)


# --- lateral_top_orders: correlated LATERAL top-n per key --------------------
# Spark 4's LATERAL correlated subquery — the SQL-standard spelling of
# "top-n per group" that many warehouse migrations carry.  Catalyst plans
# the correlated ORDER BY/LIMIT as a per-key WindowGroupLimit (same
# physical shape as the row_number form, NOT a per-row re-execution), so
# the surface is sugar, not a nested-loop trap — asserted in the plan
# test.  Restricted to BUILDING-segment customers with a pushed filter.

_LATERAL_ORACLE = """
SELECT cu.c_custkey, cu.c_mktsegment, l.o_orderkey, l.o_totalprice
FROM customer cu,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = cu.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
WHERE cu.c_mktsegment = 'BUILDING'
"""


@query(
    "lateral_top_orders",
    oracle=_LATERAL_ORACLE,
    tags=("join", "lateral", "topk"),
)
def lateral_top_orders(spark, sf_dir):
    T(spark, sf_dir, "customer").createOrReplaceTempView("_lt_customer")
    T(spark, sf_dir, "orders").createOrReplaceTempView("_lt_orders")
    return spark.sql("""
      SELECT cu.c_custkey, cu.c_mktsegment, l.o_orderkey, l.o_totalprice
      FROM _lt_customer cu,
      LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM _lt_orders o
        WHERE o.o_custkey = cu.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
      ) l
      WHERE cu.c_mktsegment = 'BUILDING'
    """)


# --- forward_fill_values: IGNORE NULLS gap-fill over a sparse series ---------
# Purchases carry a value; every other event sees the user's most recent
# purchase value (classic forward-fill / last-observation-carried-forward).
# last_value(... IGNORE NULLS) over an unbounded-preceding frame — one
# user_id shuffle, sort shared with the ordering.  Integer cents so the
# filled column is BIGINT-exact.

_FF_ORACLE = """
SELECT event_id, user_id, event_type,
  last_value(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END
             IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS last_purchase_cents
FROM events
"""


@query(
    "forward_fill_values",
    oracle=_FF_ORACLE,
    tags=("window", "gap-fill", "W8"),
)
def forward_fill_values(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_cents = F.when(
        F.col("event_type") == "purchase",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)"),
    )
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(purchase_cents, ignorenulls=True)
        .over(w)
        .alias("last_purchase_cents"),
    )
