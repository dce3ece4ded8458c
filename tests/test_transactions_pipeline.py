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
        kind = rng.choice(
            [
                "deposit",
                "taker",
                "maker",
                "failed",
                "other",
                "withdraw",
                "liquidate",
                "funding",
                "cancel_complete",
            ]
        )
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
        elif kind == "withdraw":
            instr = {
                "name": rng.choice(["withdraw", "withdraw_v2"]),
                "args": {"amount": str(rng.randrange(1, 500) * 1_000_000)},
                "accounts": {
                    "named": {"authority": authority, "margin_account": margin},
                    "remaining": [],
                },
                "program_id": "zeta",
                "events": [],
            }
        elif kind == "liquidate":
            size = rng.randrange(1, 40) * 1_000 * rng.choice([1, -1])
            instr = {
                "name": rng.choice(["liquidate", "liquidate_v2"]),
                "args": {"size": str(abs(size))},
                "accounts": {
                    "named": {"market": f"mkt_{asset}"},
                    "remaining": [],
                },
                "program_id": "zeta",
                "events": [
                    {
                        "name": "liquidation_event",
                        "event": {
                            "size": str(size),
                            "asset": asset.lower(),
                            "liquidatee": f"auth_{rng.randrange(20)}",
                            "liquidator": authority,
                            "liquidator_reward": str(rng.randrange(1, 90) * 1_000_000),
                            "insurance_reward": str(rng.randrange(0, 20) * 1_000_000),
                            "cost_of_trades": str(rng.randrange(1, 900) * 1_000_000),
                            "mark_price": str(rng.randrange(10, 100) * 1_000_000),
                        },
                    }
                ],
            }
        elif kind == "funding":
            instr = {
                "name": "apply_funding",
                "args": {},
                "accounts": {"named": {}, "remaining": []},
                "program_id": "zeta",
                "events": [
                    {
                        "name": "apply_funding_event",
                        "event": {
                            "asset": asset.lower(),
                            "user": authority,
                            "margin_account": margin,
                            # ~1 in 6 rows are zero-change and must be dropped
                            "balance_change": str(
                                rng.choice([0, 1, 1, -1, -1, 2])
                                * rng.randrange(1, 50)
                                * 100_000
                            ),
                            "funding_rate": str(rng.randrange(1, 500)),
                            "oracle_price": str(rng.randrange(10, 100) * 1_000_000),
                            "position_size": str(rng.randrange(1, 60) * 1_000),
                        },
                    }
                ],
            }
        elif kind == "cancel_complete":
            instr = {
                "name": rng.choice(["cancel_order", "cancel_all_market_orders"]),
                "args": {},
                "accounts": {
                    "named": {"authority": authority, "market": f"mkt_{asset}"},
                    "remaining": [],
                },
                "program_id": "zeta",
                "events": [
                    {
                        "name": "order_complete_event",
                        "event": {
                            "asset": asset.lower(),
                            "margin_account": margin,
                            "order_complete_type": rng.choice(["cancel", "fill"]),
                            "side": rng.choice(["bid", "ask"]),
                            "unfilled_size": str(rng.randrange(0, 30) * 1_000),
                            "order_id": str(rng.randrange(10**9)),
                            "client_order_id": str(rng.randrange(10**6)),
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
            "cleaned_ix_withdraw",
            "cleaned_ix_order_complete",
            "cleaned_ix_liquidate",
            "cleaned_ix_funding",
            "cleaned_ix_trade",
            "agg_ix_trade_asset_1h",
            "agg_ix_deposit_user_1h",
            "agg_ix_withdraw_user_1h",
            "agg_funding_rate_user_asset_1h",
            "agg_ix_liquidate_asset_1h",
            "fee_tiers",
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


def test_withdraw_scaling_and_prefix(spark, pipeline_result):
    raw, out = pipeline_result
    wd = out["cleaned_ix_withdraw"]
    assert wd.count() > 0
    bad = wd.filter(
        (F.col("withdraw_amount") % 1 != 0) | (F.col("withdraw_amount") <= 0)
    )
    assert bad.count() == 0
    # no deposit leaked into the withdraw family
    assert wd.filter(F.col("authority").isNull()).count() == 0


def test_order_complete_event_pairing(spark, pipeline_result):
    raw, out = pipeline_result
    oc = out["cleaned_ix_order_complete"]
    assert oc.count() > 0
    # every row came from an order_complete_event: required payload fields set
    assert oc.filter(F.col("order_complete_type").isNull()).count() == 0
    # markets dim resolved the asset (uppercase underlying, not the
    # lowercase event fallback)
    assert oc.filter(F.col("asset") != F.upper("asset")).count() == 0
    # "other"-kind cancels carry no order_complete_event and must not appear
    assert oc.filter(F.col("order_id").isNull()).count() == 0
    # scaling: unfilled_size is integral after /1e3 on the *_000 fixture
    assert oc.filter(F.col("unfilled_size") % 1 != 0).count() == 0


def test_liquidation_side_and_scaling(spark, pipeline_result):
    raw, out = pipeline_result
    lq = out["cleaned_ix_liquidate"]
    assert lq.count() > 0
    # side is derived from the SIGN of event size; desired_size from args is
    # always positive
    assert set(r["side"] for r in lq.select("side").distinct().collect()) == {
        "bid",
        "ask",
    }
    assert lq.filter(F.col("desired_size") <= 0).count() == 0
    assert lq.filter(F.col("liquidated_size") <= 0).count() == 0
    assert lq.filter(F.col("liquidator_reward") < 0).count() == 0
    assert lq.filter(F.col("asset").isNull()).count() == 0


def test_funding_drops_zero_change(spark, pipeline_result):
    raw, out = pipeline_result
    fd = out["cleaned_ix_funding"]
    assert fd.count() > 0
    assert fd.filter(F.col("balance_change") == 0).count() == 0
    # signed balance changes survive in both directions
    assert fd.filter(F.col("balance_change") < 0).count() > 0
    assert fd.filter(F.col("balance_change") > 0).count() > 0


def test_user_hourly_golds_consistent(spark, pipeline_result):
    raw, out = pipeline_result
    for fam, agg_name, cnt_col, amt_col in [
        ("cleaned_ix_deposit", "agg_ix_deposit_user_1h", "deposit_count",
         "deposit_amount"),
        ("cleaned_ix_withdraw", "agg_ix_withdraw_user_1h", "withdraw_count",
         "withdraw_amount"),
    ]:
        silver, gold = out[fam], out[agg_name]
        assert gold.agg(F.sum(cnt_col)).first()[0] == silver.count()
        assert abs(
            gold.agg(F.sum(amt_col)).first()[0]
            - silver.agg(F.sum(amt_col)).first()[0]
        ) < 1e-6


def test_liquidation_hourly_gold(spark, pipeline_result):
    raw, out = pipeline_result
    lq, gold = out["cleaned_ix_liquidate"], out["agg_ix_liquidate_asset_1h"]
    assert gold.agg(F.sum("liquidation_count")).first()[0] == lq.count()
    assert gold.filter(F.col("liquidatees") > F.col("liquidation_count")).count() == 0


def test_fee_tiers_latest_and_monotone(spark, pipeline_result):
    raw, out = pipeline_result
    ft = out["fee_tiers"]
    # exactly one row per authority (latest-per-key)
    assert ft.count() == ft.select("authority").distinct().count()
    # tier ↔ multiplier mapping is the reference's fixed 8-branch table
    pairs = {
        (r["fee_tier"], r["fee_multiplier"])
        for r in ft.select("fee_tier", "fee_multiplier").distinct().collect()
    }
    legal = {(7, 0.3), (6, 0.4), (5, 0.5), (4, 0.6), (3, 0.7), (2, 0.8),
             (1, 0.9), (0, 1.0)}
    assert pairs <= legal
    # rolling total is at least the final hour's own volume
    assert ft.filter(F.col("total_volume_30d") < F.col("volume")).count() == 0


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
