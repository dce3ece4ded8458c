"""Shared brand co-purchase graph construction.

The top-N within-order brand-pair edge list (fixed-size by support with a
deterministic tie-break — the scale-stable alternative to a min-support
threshold) is the graph under both ``brand_clustering_coefficient`` and
``brand_harmonic_centrality``.  ONE definition for both engines, same
rationale as ``duck_hyperplane_bucket_sql``: a drifted copy would
silently de-correlate the two queries' graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def duck_brand_edges_cte(limit: int) -> str:
    """DuckDB CTE fragment defining ``edges(ba, bb)`` — splice after WITH."""
    return f"""i AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), pairs AS MATERIALIZED (
  SELECT a.p_brand AS ba, b.p_brand AS bb, CAST(COUNT(*) AS BIGINT) AS support
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
), edges AS MATERIALIZED (
  SELECT ba, bb FROM pairs ORDER BY support DESC, ba, bb LIMIT {limit}
)"""


def spark_brand_edges(spark, sf_dir: str, limit: int) -> DataFrame:
    """Spark twin: the ``(ba, bb)`` edge frame, localCheckpointed (≤ limit
    rows — the downstream graph algebra reuses it across joins)."""
    from zeta_etl_spark.queries.registry import T

    from zeta_etl_spark.operators.graph import cobasket_pairs

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    i = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    # Optimization r13 (guide §2.4): pair generation by per-order
    # collect_set + array expansion — collect_set dedups inline, so the
    # former distinct pre-pass AND the self-join (3 data-sized exchanges)
    # collapse into ONE map-side-combined exchange; the (ba, bb) multiset
    # is pair-for-pair identical (brand alphabet ≤ 25, baskets bounded).
    pairs = (
        cobasket_pairs(i, "l_orderkey", "p_brand", "ba", "bb")
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    edges = (
        pairs.orderBy(F.col("support").desc(), "ba", "bb")
        .limit(limit)
        .select("ba", "bb")
    )
    return edges.localCheckpoint()
