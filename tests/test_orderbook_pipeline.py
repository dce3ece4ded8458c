"""Pipeline-shape test for the orderbook pipeline (FIXTURES.md F3/F5):
explode/union of bids+asks, whitelist join effect, spread bucketing, VWAP,
best-bid/ask and weighted quality score."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.orderbook import (
    ORDERBOOK_SCHEMA,
    PUBKEY_LABEL_SCHEMA,
    build_orderbook_pipeline,
    market_params_df,
)

BASE_TS = datetime(2024, 3, 1, 0, 0, 0)
ASSETS = ["SOL", "BTC", "ETH"]
MMS = [f"mm_{i}" for i in range(4)]
RETAIL = [f"anon_{i}" for i in range(6)]


def _levels(rng, mid, side, n=4):
    out = []
    for _ in range(n):
        bps = rng.choice([1, 3, 7, 20, 40, 80])
        off = mid * bps / 10_000
        price = mid - off if side == "bid" else mid + off
        out.append(
            {
                "price": round(price, 4),
                "size": rng.randrange(1, 20) * 1.0,
                "open_order_address": "ooa",
                "authority": rng.choice(MMS + RETAIL),
            }
        )
    return out


def _gen_snapshots(n=120, seed=42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ts = BASE_TS + timedelta(seconds=60 * i)
        asset = ASSETS[i % len(ASSETS)]
        mid = {"SOL": 100.0, "BTC": 50_000.0, "ETH": 3_000.0}[asset]
        rows.append(
            {
                "asset": asset,
                "local_timestamp": ts,
                "exchange_timestamp": ts,
                "midpoint": mid,
                "mark_price": mid * 1.0001,
                "bids": _levels(rng, mid, "bid"),
                "asks": _levels(rng, mid, "ask"),
            }
        )
    return rows


@pytest.fixture(scope="module")
def ob_result(spark, tmp_path_factory):
    snaps = spark.createDataFrame(_gen_snapshots(), ORDERBOOK_SCHEMA)
    labels = spark.createDataFrame(
        [(m, f"label_{m}", "org") for m in MMS], PUBKEY_LABEL_SCHEMA
    )
    base = str(tmp_path_factory.mktemp("obpipe"))
    p = build_orderbook_pipeline(spark, base, snaps, labels)
    out = p.run(
        spark, targets=["labeled_levels", "depth_by_spread_bucket", "mm_quality"]
    )
    return snaps, out


def test_whitelist_join_filters_retail(spark, ob_result):
    snaps, out = ob_result
    authorities = {
        r["authority"]
        for r in out["labeled_levels"].select("authority").distinct().collect()
    }
    assert authorities <= set(MMS)
    assert len(authorities) > 0


def test_depth_buckets_cover_both_sides(spark, ob_result):
    _, out = ob_result
    depth = out["depth_by_spread_bucket"]
    sides = {r["side"] for r in depth.select("side").distinct().collect()}
    assert sides == {"bid", "ask"}
    buckets = {
        r["spread_bucket"] for r in depth.select("spread_bucket").distinct().collect()
    }
    assert "0-2.5bps" in buckets and ">50bps" in buckets
    assert depth.filter(F.col("notional_depth") <= 0).count() == 0


def test_mm_quality_score(spark, ob_result):
    _, out = ob_result
    q = out["mm_quality"]
    # VWAP lies within the quoted price range (both sides included); allow
    # ulp-level slack from the decimal→double ratio on single-price groups
    eps = F.col("max_quote") * 1e-9
    bad_vwap = q.filter(
        (F.col("vwap") < F.col("min_quote") - eps)
        | (F.col("vwap") > F.col("max_quote") + eps)
    )
    assert bad_vwap.count() == 0
    # one-sided quotes score zero
    assert q.filter((F.col("two_sided") == 0) & (F.col("quality_score") != 0)).count() == 0


def test_market_params_weights(spark):
    params = market_params_df(spark)
    total = params.agg(F.sum("weight")).first()[0]
    assert abs(total - 1.0) < 1e-9
