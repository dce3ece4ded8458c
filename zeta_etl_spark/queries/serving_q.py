"""Serving-layer reshaping queries: rollup with grand-total row, unpivot
(wide→long), camelCase + epoch-seconds export shape (SURVEY.md §2.4 A10-A12,
§2.7 U4, §3.3; reference: dfs-serving/zetadex-serving*.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions import dec_sum
from zeta_etl_spark.operators.reshape import (
    camel_case_columns,
    rollup_with_total,
    timestamps_to_unix,
    unpivot_metrics,
)
from zeta_etl_spark.queries.registry import T, query

# --- event_type_rollup: A10 rollup + ALL total row --------------------------
# rollup("asset") + coalesce(asset,'ALL_ASSETS')
# (dfs-serving/zetadex-serving.py:483-490).

_ROLLUP_ORACLE = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP(event_type)
"""


@query("event_type_rollup", oracle=_ROLLUP_ORACLE, tags=("agg", "A10"))
def event_type_rollup(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return rollup_with_total(
        ev,
        "event_type",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
        ],
        total_label="ALL",
    )


# --- metrics_unpivot: U4 wide→long melt -------------------------------------
# Replaces the 11-frame loop-union (zetadex-serving-v2.py:510-554) with the
# native unpivot — single generate, one scan.

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT event_type,
    CAST(COUNT(*) AS DOUBLE) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS total_value,
    CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) / COUNT(value) AS avg_value
  FROM events GROUP BY event_type
)
SELECT event_type, 'n_events' AS metric, n_events AS metric_value FROM wide
UNION ALL
SELECT event_type, 'total_value' AS metric, total_value FROM wide
UNION ALL
SELECT event_type, 'avg_value' AS metric, avg_value FROM wide
"""


@query("metrics_unpivot", oracle=_UNPIVOT_ORACLE, tags=("reshape", "U4"))
def metrics_unpivot(spark, sf_dir):
    from zeta_etl_spark.functions import dec_avg

    ev = T(spark, sf_dir, "events")
    wide = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        dec_sum("value", "total_value"),
        dec_avg("value", "avg_value"),
    )
    return unpivot_metrics(
        wide,
        ids=["event_type"],
        metrics=["n_events", "total_value", "avg_value"],
        var_name="metric",
        value_name="metric_value",
    )


# --- serving_export: S9/S10 export shape — camelCase names, epoch seconds,
# TTL column (zetadex-serving.py:212-221,457; zetadex-serving-v2.py:557-558).

_EXPORT_ORACLE = """
SELECT
  date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
            date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hourTs,
  event_type AS eventType,
  COUNT(*) AS nEvents,
  CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sumValue,
  date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
            date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 14 DAY)
    AS expiryTs
FROM events
GROUP BY 1, 2, 5
"""


@query("serving_export", oracle=_EXPORT_ORACLE, tags=("reshape", "S9", "S10"))
def serving_export(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "sum_value"))
    shaped = hourly.withColumn(
        "expiry_ts", F.col("hour_ts") + F.expr("interval 2 weeks")
    )
    return camel_case_columns(timestamps_to_unix(shaped))


# --- latest_hour_snapshot: O3 snapshot filter with the injectable clock -----
# The reference serves `filter("timestamp == date_trunc('hour',
# current_timestamp - interval 1 hour)")` (dfs-serving/zetadex-serving.py:
# 348-351).  The engine replaces current_timestamp with the injected/
# data-derived clock (zeta_etl_spark.clock) so results are deterministic.

_SNAPSHOT_ORACLE = """
WITH clock AS (
  SELECT date_trunc('hour', max(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR)
    AS snap_hour
  FROM events
), hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT h.hour_ts, h.event_type, h.n_events, h.sum_value
FROM hourly h JOIN clock c ON h.hour_ts = c.snap_hour
"""


@query("latest_hour_snapshot", oracle=_SNAPSHOT_ORACLE, tags=("serving", "O3"))
def latest_hour_snapshot(spark, sf_dir):
    from zeta_etl_spark.clock import as_of, data_as_of, latest_complete_hour

    ev = T(spark, sf_dir, "events")
    clock = as_of() if as_of() is not None else data_as_of(ev, "ts")
    snap_hour = latest_complete_hour(clock)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "sum_value"))
    return hourly.filter(F.col("hour_ts") == snap_hour)
