"""End-to-end pipeline-shape test for the transactions pipeline (SURVEY §3.1)
on deterministic nested fixtures (FIXTURES.md F1/F2/F4): explode → predicate →
dim join → UDF-free event merge → hourly gold → 24h rolling."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.transactions import (
    MARKETS_SCHEMA,
    TRANSACTIONS_SCHEMA,
    ZETAGROUP_SCHEMA,
    build_transactions_pipeline,
)

BASE_TS = datetime(2024, 3, 1, 0, 0, 0)
ASSETS = ["SOL", "BTC", "ETH"]


def _gen_transactions(n=300, seed=42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ts = BASE_TS + timedelta(minutes=rng.randrange(0, 60 * 48))
        asset = rng.choice(ASSETS)
        zg = f"zg_{asset}"
        kind = rng.choice(["deposit", "taker", "maker", "failed", "other"])
        authority = f"auth_{rng.randrange(20)}"
        margin = f"m_{authority}"
        if kind == "deposit":
            instr = {
                "name": "deposit",
                "args": {"amount": str(rng.randrange(1, 500) * 1_000_000)},
                "accounts": {
                    "named": {"authority": authority, "margin_account": margin},
                    "remaining": [],
                },
                "program_id": "zeta",
                "events": [],
            }
        elif kind == "taker":
            price = rng.randrange(10, 100) * 1_000_000
            size = rng.randrange(1, 50) * 1_000
            instr = {
                "name": rng.choice(
                    ["place_order", "place_perp_order_v3", "place_order_v4"]
                ),
                "args": {},
                "accounts": {"named": {}, "remaining": []},
                "program_id": "zeta",
                "events": [
                    {
                        "name": "place_order_event",
                        "event": {
                            "user": authority,
                            "margin_account": margin,
                            "fee": "500000",
                            "oracle_price": str(price),
                        },
                    },
                    {
                        "name": rng.choice(["trade_event", "trade_event_v3"]),
                        "event": {
                            "user": authority,
                            "margin_account": margin,
                            "zeta_group": zg,
                            "price": str(price),
                            "size": str(size),
                            "is_bid": rng.choice(["true", "false"]),
                        },
                    },
                ],
            }
        elif kind == "maker":
            price = rng.randrange(10, 100) * 1_000_000
            size = rng.randrange(1, 50) * 1_000
            instr = {
                "name": "crank_event_queue",
                "args": {},
                "accounts": {"named": {}, "remaining": []},
                "program_id": "zeta",
                "events": [
                    {
                        "name": "trade_event",
                        "event": {
                            "user": authority,
                            "margin_account": margin,
                            "zeta_group": zg,
                            "price": str(price),
                            "size": str(size),
                            "is_bid": "false",
                        },
                    }
                ],
            }
        else:
            instr = {
                "name": "cancel_order",
                "args": {},
                "accounts": {"named": {}, "remaining": []},
                "program_id": "zeta",
                "events": [],
            }
        rows.append(
            {
                "signature": f"sig_{i}",
                "instructions": [instr],
                "is_successful": kind != "failed",
                "slot": 1000 + i,
                "block_time": ts,
                "fee": 5000,
            }
        )
    return rows


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    raw = spark.createDataFrame(_gen_transactions(), TRANSACTIONS_SCHEMA)
    markets = spark.createDataFrame(
        [(a, f"mkt_{a}", 0.0, "perp", BASE_TS, BASE_TS) for a in ASSETS],
        MARKETS_SCHEMA,
    )
    zg = spark.createDataFrame(
        [(f"zg_{a}", a) for a in ASSETS], ZETAGROUP_SCHEMA
    )
    base = str(tmp_path_factory.mktemp("txpipe"))
    p = build_transactions_pipeline(spark, base, raw, markets, zg)
    out = p.run(
        spark,
        targets=[
            "cleaned_transactions",
            "cleaned_ix_deposit",
            "cleaned_ix_trade",
            "agg_ix_trade_asset_1h",
            "agg_ix_trade_asset_24h_rolling",
        ],
    )
    return raw, out


def test_cleaned_excludes_failures(spark, pipeline_result):
    raw, out = pipeline_result
    ok = raw.filter("is_successful").count()
    assert out["cleaned_transactions"].count() == ok
    assert out["cleaned_transactions"].filter("not is_successful").count() == 0


def test_deposit_scaling(spark, pipeline_result):
    raw, out = pipeline_result
    dep = out["cleaned_ix_deposit"]
    # every deposit amount is an exact multiple of 1 (USDC) after /1e6 scaling
    bad = dep.filter((F.col("deposit_amount") % 1 != 0) | (F.col("deposit_amount") <= 0))
    assert bad.count() == 0
    assert dep.filter(F.col("authority").isNull()).count() == 0


def test_maker_taker_partition_and_merge(spark, pipeline_result):
    raw, out = pipeline_result
    trades = out["cleaned_ix_trade"]
    kinds = {r["maker_taker"] for r in trades.select("maker_taker").distinct().collect()}
    assert kinds == {"maker", "taker"}
    # merged taker payload carried fields from BOTH events: price/size from
    # trade_event, authority from either — and the dim join resolved the asset
    takers = trades.filter("maker_taker = 'taker'")
    assert takers.filter(F.col("price").isNull()).count() == 0
    assert takers.filter(F.col("asset").isNull()).count() == 0
    # volume = price*size positive
    assert trades.filter(F.col("volume") <= 0).count() == 0


def test_hourly_gold_consistency(spark, pipeline_result):
    raw, out = pipeline_result
    trades = out["cleaned_ix_trade"]
    hourly = out["agg_ix_trade_asset_1h"]
    assert hourly.agg(F.sum("trade_count")).first()[0] == trades.count()
    direct = trades.agg(F.sum("volume")).first()[0]
    agg = hourly.agg(F.sum("volume")).first()[0]
    assert abs(direct - agg) < 1e-6


def test_rolling_spine_dense_and_monotone(spark, pipeline_result):
    raw, out = pipeline_result
    rolling = out["agg_ix_trade_asset_24h_rolling"]
    # spine densification: every (hour, asset) pair in range is present
    hours = rolling.select("timestamp").distinct().count()
    assert rolling.count() == hours * len(ASSETS)
    # rolling sum ≥ hourly value everywhere
    assert rolling.filter(F.col("volume_24h") < F.col("volume")).count() == 0
    assert rolling.filter(
        F.col("trade_count_24h") < F.col("trade_count")
    ).count() == 0
