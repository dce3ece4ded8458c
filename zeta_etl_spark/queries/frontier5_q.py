"""Frontier batch 4 (round 8): ML-training-infrastructure operators —

- ``point_in_time_features``: the feature-store PIT (point-in-time
  correct) join — assemble, for every training label, feature values AS
  OF strictly before the label timestamp, with no leakage.  All
  backward-looking features ride ONE union-merge window pass (one sort
  shuffle), the same scale shape as ``asof_prior_click``.
- ``negative_sampling_recs``: deterministic hash-based negative
  sampling for recommender training — per positive (customer, part),
  k candidate negatives from md5 draws, existence-checked against the
  part dimension and leakage-checked against the user's positives by
  anti-join; first 3 survivors per positive are kept (fixed order).

Determinism: md5-derived BIGINT draws (the repo-wide hashing rule),
min/struct ranks, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.queries.registry import T, query

# --- point_in_time_features --------------------------------------------------
# Labels: purchase events.  Features, all strictly-before the label ts:
#   clicks_before   — running count of the user's clicks
#   errors_before   — running count of the user's errors
#   last_view_cents — value of the user's most recent view (NULL if none)
# One tagged union, one (user, ts, tie) sort, three running-frame
# expressions with a 1-row EXCLUSION (rowsBetween(unboundedPreceding,
# -1)) so a feature row at the exact label timestamp is visible but the
# label row itself never leaks.  Ordering tie-break: (ts, event_id) —
# feature events with the same ts as the label sort BEFORE it iff their
# event_id is smaller; both engines use the identical total order.

_PIT_ORACLE = """
WITH tagged AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('purchase', 'click', 'error', 'view')
), w AS (
  SELECT *,
    COUNT(*) FILTER (event_type = 'click') OVER wb AS clicks_before,
    COUNT(*) FILTER (event_type = 'error') OVER wb AS errors_before,
    LAST_VALUE(CASE WHEN event_type = 'view' THEN cents END IGNORE NULLS)
      OVER wb AS last_view_cents
  FROM tagged
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS label_event_id, user_id, cents AS label_cents,
  CAST(COALESCE(clicks_before, 0) AS BIGINT) AS clicks_before,
  CAST(COALESCE(errors_before, 0) AS BIGINT) AS errors_before,
  last_view_cents
FROM w WHERE event_type = 'purchase'
"""


@query(
    "point_in_time_features",
    oracle=_PIT_ORACLE,
    tags=("ml-infra", "feature-store", "asof"),
)
def point_in_time_features(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    tagged = ev.where(
        F.col("event_type").isin("purchase", "click", "error", "view")
    ).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        "cents",
        F.count(F.when(F.col("event_type") == "click", 1))
        .over(wb)
        .alias("clicks_before"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .over(wb)
        .alias("errors_before"),
        F.last(
            F.when(F.col("event_type") == "view", F.col("cents")),
            ignorenulls=True,
        )
        .over(wb)
        .alias("last_view_cents"),
    )
    return w.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_event_id"),
        "user_id",
        F.col("cents").alias("label_cents"),
        F.coalesce(F.col("clicks_before"), F.lit(0))
        .cast("bigint")
        .alias("clicks_before"),
        F.coalesce(F.col("errors_before"), F.lit(0))
        .cast("bigint")
        .alias("errors_before"),
        "last_view_cents",
    )


# --- negative_sampling_recs --------------------------------------------------
# Positives: distinct (customer, part) purchase pairs (orders x
# lineitem).  For each positive, _NEG_DRAWS md5 draws propose candidate
# part keys in [1, max_partkey]; draws keep only keys that EXIST in the
# part dimension (semi join — key spaces need not be dense) and are NOT
# among the customer's positives (anti join — no false negatives);
# the first _NEG_K survivors per positive (by draw index) are the
# emitted negatives.  Everything is equi-join + window: work per
# positive is O(draws), never |parts|.

_NEG_DRAWS = 6
_NEG_K = 3


def _neg_oracle() -> str:
    h = duck_hex2long(
        "concat('neg:', CAST(p.c AS VARCHAR), ':', CAST(p.p AS VARCHAR), "
        "':', CAST(d.i AS VARCHAR))",
        digits=12,
    )
    return f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey % 10 = 0
), mx AS (
  SELECT CAST(MAX(p_partkey) AS BIGINT) AS m FROM part
), draws AS (
  SELECT p.c, p.p, d.i,
    ({h} % (SELECT m FROM mx)) + 1 AS cand
  FROM pos p
  JOIN (SELECT unnest(range(1, {_NEG_DRAWS + 1})) AS i) d ON true
), valid AS (
  SELECT d.* FROM draws d
  JOIN part pt ON pt.p_partkey = d.cand
  ANTI JOIN pos x ON x.c = d.c AND x.p = d.cand
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c, p ORDER BY i) AS rk
  FROM valid
)
SELECT c AS custkey, p AS pos_partkey, CAST(i AS BIGINT) AS draw_idx,
  cand AS neg_partkey
FROM ranked WHERE rk <= {_NEG_K}
"""


@query(
    "negative_sampling_recs",
    oracle=_neg_oracle(),
    tags=("ml-infra", "sampling", "join"),
)
def negative_sampling_recs(spark, sf_dir):
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    # deterministic 10% customer slice bounds the emitted training rows
    # (the heavy-pairs output convention, ROUND_NOTES r7); the operator
    # shape is identical at any slice
    pos = (
        o.where(F.col("o_custkey") % 10 == 0)
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()  # reused as draw base AND anti-join side
    )
    mx = pt.agg(F.max("p_partkey").cast("bigint").alias("m"))
    h = spark_hex2long(
        "concat('neg:', cast(c as string), ':', cast(p as string), "
        "':', cast(i as string))",
        digits=12,
    )
    draws = (
        scalar_frame_crossjoin(pos, mx)
        .select(
            "c",
            "p",
            "m",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, _NEG_DRAWS + 1)])
            ).alias("i"),
        )
        .select("c", "p", "i", F.expr(f"({h} % m) + 1").alias("cand"))
    )
    # Optimization r14 (guide §2.3/§2.4): the no-false-negatives check was
    # a LEFT ANTI join on (c, cand) — a full extra shuffle of the draws
    # frame on a key nothing downstream uses.  The per-customer positive
    # set is bounded (a customer's distinct purchased parts), so it
    # collapses to one collect_set per customer and an array_contains
    # filter on the existing join-by-c row; the window below then REUSES
    # the hash-partitioning by c (ClusteredDistribution on (c, p) is
    # satisfied by partitioning on c) — draws now cross one exchange
    # instead of three.  Same survivor multiset: cand ∈ pos(c) ⟺ the anti
    # join dropped it.
    cpos = pos.groupBy("c").agg(F.collect_set("p").alias("_ps"))
    valid = (
        draws.join(pt.select(F.col("p_partkey").alias("cand")), "cand")
        .join(cpos, "c")
        .filter(~F.array_contains(F.col("_ps"), F.col("cand")))
        .drop("_ps")
    )
    rk = Window.partitionBy("c", "p").orderBy("i")
    return (
        valid.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= _NEG_K)
        .select(
            F.col("c").alias("custkey"),
            F.col("p").alias("pos_partkey"),
            F.col("i").cast("bigint").alias("draw_idx"),
            F.col("cand").alias("neg_partkey"),
        )
    )
