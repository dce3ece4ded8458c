"""Market-data pipeline tests: intra-hour dedup determinism, asset-name
normalization, union share-of-total, partition-string reassembly."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.market_data import (
    COMPETITOR_SCHEMA,
    LIQUIDITY_SCHEMA,
    PRICES_SCHEMA,
    build_market_data_pipeline,
    normalize_asset,
)


@pytest.fixture(scope="module")
def md(spark, tmp_path_factory):
    prices = spark.createDataFrame(
        [
            ("SOL", datetime(2024, 3, 1, 10, 5), 99.0),
            ("SOL", datetime(2024, 3, 1, 10, 55), 101.0),  # latest in hour
            ("SOL", datetime(2024, 3, 1, 11, 30), 102.0),
            ("BTC", datetime(2024, 3, 1, 10, 40), 50_000.0),
        ],
        PRICES_SCHEMA,
    )
    zeta = spark.createDataFrame(
        [("SOL", 1000.0, datetime(2024, 3, 1, 10))],
        "asset string, volume double, timestamp timestamp_ntz",
    )
    comp = spark.createDataFrame(
        [
            ("dydx", "SOL-PERP", 3000.0, datetime(2024, 3, 1, 11)),
            ("hyper", "1MBONK-PERP", 500.0, datetime(2024, 3, 1, 11)),
        ],
        COMPETITOR_SCHEMA,
    )
    liq = spark.createDataFrame(
        [
            ("SOL-USD", 100.0, 5.0, 1, "bid", 3, "2024", "03", "01", "10",
             "dydx", "SOL"),
            ("SOL-USD", 100.2, 2.0, 1, "ask", 4, "2024", "03", "01", "10",
             "dydx", "SOL"),
        ],
        LIQUIDITY_SCHEMA,
    )
    base = str(tmp_path_factory.mktemp("md"))
    p = build_market_data_pipeline(spark, base, prices, zeta, comp, liq)
    return p.run(
        spark,
        targets=[
            "hourly_prices",
            "latest_prices",
            "exchange_market_share",
            "liquidity_depth",
        ],
    )


def test_intra_hour_dedup_latest_wins(md):
    hp = {(r["underlying"], r["hour_ts"].hour): r["price_usd"]
          for r in md["hourly_prices"].collect()}
    assert hp[("SOL", 10)] == 101.0  # 10:55 row wins over 10:05
    assert len(hp) == 3


def test_latest_price_snapshot(md):
    lp = {r["underlying"]: r["price_usd"] for r in md["latest_prices"].collect()}
    assert lp == {"SOL": 102.0, "BTC": 50_000.0}


def test_asset_normalization_and_share(md, spark):
    share = md["exchange_market_share"].collect()
    assets = {r["asset"] for r in share}
    assert "SOL" in assets and "BONK" in assets
    assert "SOL-PERP" not in assets
    sol = {r["exchange"]: r["market_share"] for r in share if r["asset"] == "SOL"}
    # zeta (day 10h) and dydx (day 11h) share the same day partition
    assert abs(sol["zeta"] - 0.25) < 1e-9
    assert abs(sol["dydx"] - 0.75) < 1e-9


def test_partition_string_reassembly(md):
    depth = md["liquidity_depth"].collect()
    assert all(
        r["snapshot_ts"] == datetime(2024, 3, 1, 10, 0) for r in depth
    )
    sides = {r["side"]: r["notional"] for r in depth}
    assert abs(sides["bid"] - 500.0) < 1e-6
    assert abs(sides["ask"] - 200.4) < 1e-6


def test_normalize_asset_unit(spark):
    df = spark.createDataFrame(
        [("SOL-PERP",), ("1MBONK-PERP",), ("ETH",)], "a string"
    ).select(normalize_asset(F.col("a")).alias("n"))
    assert [r["n"] for r in df.collect()] == ["SOL", "BONK", "ETH"]
