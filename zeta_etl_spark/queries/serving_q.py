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


# --- MV-rewrite on the graded surface ----------------------------------------
# The aggregate navigator (plans/navigator.py) answers rollups from IVM-schema
# materialized views; until r9 its algebra was proven only in pytest.  These
# two queries put the full rewrite path — view build (ivm.full_agg), view
# SELECTION (AggNavigator.answer with a rejecting coarser candidate), and the
# (sum, n)-pair re-aggregation with SQL NULL semantics — on the DuckDB-oracle
# surface: the oracle is the direct GROUP BY over the base, so the compare
# proves view-then-rollup ≡ base recompute cross-engine at every SF.

_MV_DAY_DUCK = (
    "CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', "
    "date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)"
)
_MV_DAY_SPARK = "cast(unix_timestamp(date_trunc('day', ts)) div 86400 as bigint)"
_MV_CENTS = "cast(floor(value * 100 + 0.5) as bigint)"
_MV_CENTS_DUCK = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

_MV_DAILY_ORACLE = f"""
SELECT {_MV_DAY_DUCK} AS day,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM({_MV_CENTS_DUCK}) AS BIGINT) AS sum_cents,
  CAST(COUNT({_MV_CENTS_DUCK}) AS BIGINT) AS n_cents,
  CAST(SUM({_MV_CENTS_DUCK}) AS DOUBLE)
    / CAST(COUNT({_MV_CENTS_DUCK}) AS DOUBLE) AS avg_cents,
  CAST(MIN({_MV_CENTS_DUCK}) AS BIGINT) AS min_cents,
  CAST(MAX({_MV_CENTS_DUCK}) AS BIGINT) AS max_cents
FROM events GROUP BY 1
"""


def _mv_fine_view(spark, sf_dir):
    from zeta_etl_spark.plans.ivm import full_agg

    base = T(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.expr(_MV_DAY_SPARK).alias("day"),
        F.expr(_MV_CENTS).alias("cents"),
    )
    return full_agg(
        base, ["event_type", "day"], ["cents"], minmax=["cents"]
    )


@query(
    "mv_rewrite_daily_rollup",
    oracle=_MV_DAILY_ORACLE,
    tags=("serving", "mv-rewrite", "navigator"),
)
def mv_rewrite_daily_rollup(spark, sf_dir):
    from zeta_etl_spark.plans.navigator import AggNavigator, ViewDef

    view = _mv_fine_view(spark, sf_dir)
    nav = AggNavigator(
        {"mv_type_day": view}.__getitem__,
        [
            ViewDef(
                "mv_type_day",
                ("event_type", "day"),
                ("cents",),
                minmax_measures=("cents",),
            )
        ],
    )
    out, prov = nav.answer(
        ["day"],
        {
            "n_rows": ("count_rows", None),
            "sum_cents": ("sum", "cents"),
            "n_cents": ("count", "cents"),
            "avg_cents": ("avg", "cents"),
            "min_cents": ("min", "cents"),
            "max_cents": ("max", "cents"),
        },
    )
    assert prov == "view:mv_type_day"
    return out.withColumn("n_rows", F.col("n_rows").cast("bigint")).select(
        "day", "n_rows", "sum_cents", "n_cents", "avg_cents",
        "min_cents", "max_cents",
    )


_MV_FILTERED_ORACLE = f"""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM({_MV_CENTS_DUCK}) AS BIGINT) AS sum_cents
FROM events
WHERE ({_MV_DAY_DUCK}) % 2 = 0
GROUP BY 1
"""


@query(
    "mv_rewrite_filtered_type",
    oracle=_MV_FILTERED_ORACLE,
    tags=("serving", "mv-rewrite", "navigator"),
)
def mv_rewrite_filtered_type(spark, sf_dir):
    from zeta_etl_spark.plans.ivm import full_agg
    from zeta_etl_spark.plans.navigator import AggNavigator, ViewDef

    fine = _mv_fine_view(spark, sf_dir)
    base_type = T(spark, sf_dir, "events").select(
        F.col("event_type"), F.expr(_MV_CENTS).alias("cents")
    )
    coarse = full_agg(base_type, ["event_type"], ["cents"])
    nav = AggNavigator(
        {"mv_type_day": fine, "mv_type": coarse}.__getitem__,
        [
            ViewDef("mv_type_day", ("event_type", "day"), ("cents",)),
            ViewDef("mv_type", ("event_type",), ("cents",)),
        ],
    )
    # the day filter forces the FINER view: the coarser candidate lacks
    # the filter column and must be rejected by the matcher — the
    # selection rule itself is on the graded surface here
    out, prov = nav.answer(
        ["event_type"],
        {"n_rows": ("count_rows", None), "sum_cents": ("sum", "cents")},
        filter=F.col("day") % 2 == 0,
        filter_cols=["day"],
    )
    assert prov == "view:mv_type_day"
    return out.withColumn("n_rows", F.col("n_rows").cast("bigint"))
