"""Graph analytics over the embedding-similarity graph: integer-exact
PageRank by unrolled power iteration.

Corpus-graph centrality is a standard curation signal (which documents sit
at the center of a near-duplicate / similarity neighborhood); the reference
has no graph operator, so this is beyond-reference breadth on the same
bounded-lineage iteration machinery as ``connected_components``
(operators/dedup.py) — per-round ``localCheckpoint`` keeps Catalyst
re-analysis O(1) regardless of iteration count.

Cross-engine determinism: every quantity is BIGINT.  Ranks are scaled by
1e12; each contribution is ``pr div deg`` (Spark ``div`` == DuckDB ``//``,
exact floor division past 2^53); the damping update is
``base + (85 * sum) div 100`` with the base term precomputed in Python so
both engines see the same literal.  Float PageRank would be order-dependent
across partitionings — integer sums are not.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import query
from zeta_etl_spark.queries.text2_q import (
    _SIM_THRESHOLD,
    _cosine_bucket_pairs,
    _near_dup_oracle,
)

_PR_SCALE = 10**12
_PR_ITERS = 3
_PR_BASE = 15 * _PR_SCALE // 100  # (1 - d) * scale with d = 0.85


def _pagerank_oracle() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT e.dst AS vec_id,
    CAST({_PR_BASE} + (85 * CAST(SUM(r.pr // d.deg) AS BIGINT)) // 100
         AS BIGINT) AS pr
  FROM edges e
  JOIN {prev} r ON r.vec_id = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)"""
        )
        prev = f"r{i}"
    chain = ", ".join(iters)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT vec_a, vec_b FROM ({_near_dup_oracle(_SIM_THRESHOLD)}) _e
), edges AS MATERIALIZED (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
), deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), r0 AS (
  SELECT src AS vec_id, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg
), {chain}
SELECT d.src AS vec_id, d.deg, r.pr AS pagerank_scaled
FROM deg d JOIN {prev} r ON r.vec_id = d.src
"""


@query(
    "pagerank_sim_graph",
    oracle=_pagerank_oracle(),
    tags=("graph", "vectors", "iterative"),
)
def pagerank_sim_graph(spark, sf_dir):
    """Damped PageRank (3 unrolled rounds, d=0.85) over the
    symmetric cosine>=0.35 similarity graph.  Scale shape: the graph is
    built by ONE LSH-bucket equi-join (never all-pairs); each round is one
    shuffle on dst; ranks are localCheckpoint-ed per round so plan depth
    does not grow with iteration count."""
    # cache: deg and edges each checkpoint a plan containing the bucketed
    # cosine edge build, and sym's union doubles it again — without the
    # pin the expensive join executes ~4x before the checkpoints exist
    pairs = _cosine_bucket_pairs(spark, sf_dir, _SIM_THRESHOLD).select(
        "vec_a", "vec_b"
    ).cache()
    sym = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # deg is checkpointed so the final join reuses it instead of recomputing
    # the bucket join after `edges` is released
    deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint()
    )
    # one materialized frame carries (src, dst, deg) for every round
    edges = sym.join(deg, "src").localCheckpoint()
    pairs.unpersist()  # deg and edges are checkpointed; the edge build is done
    ranks = deg.select(
        F.col("src").alias("vec_id"),
        F.lit(_PR_SCALE).cast("bigint").alias("pr"),
    ).localCheckpoint()
    # Optimization r14 (guide §3.1, the kcore device): ranks is a
    # vertex-sized (vec_id, pr) frame out of a localCheckpoint — unknown
    # stats, so the planner re-shuffled the checkpointed EDGE table on src
    # every round for a sort-merge join.  Broadcasting ranks makes each
    # round one map-side hash probe + the groupBy(dst) exchange.  Gated on
    # the vertex count (deg is checkpointed; counting it is a cached-block
    # scan) because |vertices| grows with SF — above the gate the join
    # falls back to shuffle.
    ranks_small = deg.count() <= int(
        os.environ.get("SPARK_GRAFT_PR_BCAST_MAX", "5000000")
    )
    hint = F.broadcast if ranks_small else (lambda df: df)
    for _ in range(_PR_ITERS):
        contribs = (
            edges.join(hint(ranks), edges["src"] == ranks["vec_id"])
            .select("dst", F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = contribs.select(
            F.col("dst").alias("vec_id"),
            (F.lit(_PR_BASE) + F.expr("(85 * s) div 100"))
            .cast("bigint")
            .alias("pr"),
        ).localCheckpoint(eager=False)  # r14: lazy — cut lineage now,
        # materialize inside the next round's broadcast-build job instead
        # of a dedicated per-round job (the CC/kcore device)
        ranks.unpersist()
        ranks = new_ranks
    out = deg.join(hint(ranks), deg["src"] == ranks["vec_id"]).select(
        F.col("src").alias("vec_id"), "deg", F.col("pr").alias("pagerank_scaled")
    )
    edges.unpersist()
    return out
