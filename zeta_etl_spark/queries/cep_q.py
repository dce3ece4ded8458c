"""Complex-event-processing (CEP) batch twin: ordered-sequence detection
(view → click → purchase, each gap ≤ 1 h) without MATCH_RECOGNIZE, which
open-source Spark lacks.

The greedy-existence recurrence — "a length-k prefix chain exists ending
now iff the latest length-(k-1) completion is within the gap bound" — is
recursion-free when expressed as CHAINED running maxima: p1 = running max
of view times over strictly-earlier rows; p2 = running max of click times
whose own p1 was in range; a purchase matches iff its p2 is in range.
Keeping the LATEST completion per prefix is optimal (it can only extend
the future window), so greedy existence equals full existence.  All three
stages ride ONE user_id exchange; the streaming form with identical
semantics is ``streaming/cep.detect_sequence_stream`` (tested equal).

Granularity contract: gaps and ordering use WHOLE-SECOND epochs
(``unix_timestamp`` floors); the streaming detector floors its event times
to the same granularity, so batch and streaming agree at the gap boundary
on sub-second data too (ADVICE r6; regression-tested with 3600.4s-apart
events in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

_GAP_S = 3600

_CEP_ORACLE = f"""
WITH base AS (
  SELECT user_id, event_id, event_type,
    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
              CAST(ts AS TIMESTAMP)) AS ep
  FROM events
), s1 AS (
  SELECT *, MAX(CASE WHEN event_type = 'view' THEN ep END) OVER (
      PARTITION BY user_id ORDER BY ep, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p1
  FROM base
), s2 AS (
  SELECT *, MAX(CASE WHEN event_type = 'click'
                      AND p1 IS NOT NULL AND ep - p1 <= {_GAP_S}
                 THEN ep END) OVER (
      PARTITION BY user_id ORDER BY ep, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p2
  FROM s1
)
SELECT user_id,
  CAST(COUNT(*) FILTER (
    WHERE event_type = 'purchase'
      AND p2 IS NOT NULL AND ep - p2 <= {_GAP_S}) AS BIGINT) AS n_matches,
  CAST(MIN(CASE WHEN event_type = 'purchase'
                 AND p2 IS NOT NULL AND ep - p2 <= {_GAP_S}
            THEN ep END) AS BIGINT) AS first_match_ep
FROM s2
GROUP BY user_id
"""


@query("ordered_pattern_matches", oracle=_CEP_ORACLE, tags=("cep", "sequence"))
def ordered_pattern_matches(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("ep"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s1 = base.withColumn(
        "p1",
        F.max(F.when(F.col("event_type") == "view", F.col("ep"))).over(w),
    )
    s2 = s1.withColumn(
        "p2",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("p1").isNotNull()
                & (F.col("ep") - F.col("p1") <= _GAP_S),
                F.col("ep"),
            )
        ).over(w),
    )
    hit = (
        (F.col("event_type") == "purchase")
        & F.col("p2").isNotNull()
        & (F.col("ep") - F.col("p2") <= _GAP_S)
    )
    return s2.groupBy("user_id").agg(
        F.count(F.when(hit, 1)).cast("bigint").alias("n_matches"),
        F.min(F.when(hit, F.col("ep"))).cast("bigint").alias("first_match_ep"),
    )
