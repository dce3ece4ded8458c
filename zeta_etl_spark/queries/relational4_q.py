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


# --- recursive_dup_reachability: native recursive CTE over the dup graph -----
# Spark 4 ships WITH RECURSIVE (UNION ALL form); the engine's star-CC
# operator remains the scale path for full components (O(log n) rounds,
# checkpointed), but bounded-depth graph walks — "what is within k hops of
# this doc" — are exactly what the recursive form expresses naturally.
# Depth is bounded EXPLICITLY (depth < 3) because Spark's recursion is
# UNION ALL only (no UNION-distinct cycle termination yet) and the dup
# graph has cycles; min-hop dedup happens in the final GROUP BY.  Seeds:
# every pair endpoint divisible by 10.

_REACH_SPARK = """
WITH RECURSIVE reach(seed, doc, depth) AS (
  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM _rd_edges
                           WHERE src % 10 = 0)
  UNION ALL
  SELECT r.seed, e.dst, r.depth + 1
  FROM reach r JOIN _rd_edges e ON e.src = r.doc
  WHERE r.depth < 3
)
SELECT seed, doc, CAST(MIN(depth) AS BIGINT) AS min_hops
FROM reach GROUP BY seed, doc
"""


def _reach_oracle() -> str:
    from zeta_etl_spark.queries.dedup_q import _NGRAM_ORACLE

    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({_NGRAM_ORACLE}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(seed, doc, depth) AS (
  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM edges
                           WHERE src % 10 = 0)
  UNION ALL
  SELECT r.seed, e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.doc
  WHERE r.depth < 3
)
SELECT seed, doc, CAST(MIN(depth) AS BIGINT) AS min_hops
FROM reach GROUP BY seed, doc
"""


@query(
    "recursive_dup_reachability",
    oracle=_reach_oracle(),
    tags=("graph", "recursive-cte", "iterative"),
)
def recursive_dup_reachability(spark, sf_dir):
    from zeta_etl_spark.queries.dedup_q import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # cache: the recursive CTE re-evaluates the anchor view's plan on
    # EVERY recursion step — uncached, each of the 3 hops re-executes the
    # full inverted-index shingle join (measured 3.7 s vs 1.2 s at sf0.1).
    # The edge list is the bounded near-dup pair set, safe to pin.
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    ).cache()
    edges.createOrReplaceTempView("_rd_edges")
    return spark.sql(_REACH_SPARK)


# --- variant_payload_access: semi-structured VARIANT column access -----------
# Spark 4's VARIANT type: parse the JSON payload once into a binary
# variant and read typed paths with variant_get — the engine's answer to
# the reference's stringly-typed map payloads (§1.2) when the payload
# schema is open-ended.  At scale, parse_json runs once per row in codegen
# and variant_get is a binary path read, vs re-parsing the JSON string per
# accessed field.  The oracle reads the same paths with DuckDB's JSON
# extraction.

_VARIANT_ORACLE = """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
  CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_value
FROM events
WHERE event_type = 'purchase'
"""


@query(
    "variant_payload_access",
    oracle=_VARIANT_ORACLE,
    tags=("scalar", "variant", "json"),
)
def variant_payload_access(spark, sf_dir):
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias(
            "k_value"
        ),
        F.expr(
            "variant_get(parse_json(props), '$.missing', 'bigint')"
        ).alias("missing_value"),
    )
