"""Serving pipeline tests: snapshot selection by injected clock, rollup total
equals sum of parts, all-time constants, unpivot shape, KV export."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.serving import (
    V1_TRADES,
    V1_VOLUME,
    build_serving_pipeline,
)


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    rows = [
        (datetime(2024, 3, 1, 10), "SOL", 10, 100.0),
        (datetime(2024, 3, 1, 10), "BTC", 4, 400.0),
        (datetime(2024, 3, 1, 11), "SOL", 7, 70.0),
        (datetime(2024, 3, 1, 12), "SOL", 1, 1.0),  # latest, incomplete hour
    ]
    gold = spark.createDataFrame(
        rows,
        "timestamp timestamp_ntz, asset string, trade_count int, volume double",
    )
    base = tmp_path_factory.mktemp("serving")
    p = build_serving_pipeline(
        spark,
        str(base / "pipe"),
        gold,
        str(base / "export"),
        as_of=F.lit("2024-03-01 12:00:00").cast("timestamp_ntz"),
    )
    out = p.run(spark, targets=["snapshot_rollup", "all_time_totals", "metrics_long"])
    exported = p.export(out["metrics_long"])
    return out, exported, base


def test_snapshot_picks_latest_complete_hour(served):
    out, _, _ = served
    # clock 12:00 → latest complete hour = 11:00 → only SOL row
    rows = {r["asset"]: r for r in out["snapshot_rollup"].collect()}
    assert rows["SOL"]["trade_count"] == 7
    assert rows["ALL_ASSETS"]["trade_count"] == 7
    assert rows["ALL_ASSETS"]["asset_components"] == "SOL:7"


def test_all_time_constants(served):
    out, _, _ = served
    (r,) = out["all_time_totals"].collect()
    assert r["trade_count"] == 10 + 4 + 7 + 1 + V1_TRADES
    assert abs(r["volume"] - (571.0 + V1_VOLUME)) < 1e-6


def test_unpivot_and_export(served, spark):
    out, exported, base = served
    long_rows = out["metrics_long"].collect()
    metrics = {r["metric"] for r in long_rows}
    assert metrics == {"trade_count", "volume"}
    pks = {r["pk"] for r in exported.collect()}
    assert "volume#allTime" in pks and "trade_count#latestHour" in pks
    written = spark.read.parquet(str(base / "export" / "zetadex_stats"))
    assert written.count() == len(long_rows)


def test_data_as_of_empty_frame_degrades_to_null_clock(spark):
    """ADVICE r2: F.max over 0 rows returns None — data_as_of must degrade to
    a null clock (empty downstream output), not crash with AttributeError."""
    from zeta_etl_spark.clock import data_as_of, latest_complete_hour

    empty = spark.createDataFrame([], "ts timestamp_ntz, v int")
    clock = data_as_of(empty, "ts")  # must not raise
    out = empty.withColumn("cutoff", latest_complete_hour(clock)).filter(
        F.col("ts") == F.col("cutoff")
    )
    assert out.count() == 0

    # All-null ts column hits the same None path on a non-empty frame.
    nulls = spark.createDataFrame([(None, 1), (None, 2)], "ts timestamp_ntz, v int")
    clock2 = data_as_of(nulls, "ts")
    assert nulls.select(clock2.alias("c")).first()["c"] is None
