"""Pipeline-shape tests for rewards/referrals: share-of-total sums to 1 per
epoch (SURVEY §5.4 property), CDC key uniqueness, as-of attribution only after
referral time, cumulative monotonicity."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.rewards import (
    REFERRALS_SCHEMA,
    TRADES_SCHEMA,
    build_rewards_pipeline,
)

BASE_TS = datetime(2024, 3, 4, 0, 0, 0)  # a Monday (epoch boundary)
USERS = [f"u{i}" for i in range(12)]


def _gen_trades(n=400, seed=42):
    rng = random.Random(seed)
    return [
        {
            "block_time": BASE_TS + timedelta(minutes=rng.randrange(0, 60 * 24 * 21)),
            "authority": rng.choice(USERS),
            "asset": rng.choice(["SOL", "BTC"]),
            "maker_taker": rng.choice(["maker", "taker"]),
            "volume": rng.randrange(100, 20_000) * 1.0,
        }
        for _ in range(n)
    ]


def _gen_referrals(seed=7):
    rng = random.Random(seed)
    rows = []
    # u0..u5 referred by r_A/r_B mid-window; multiple CDC snapshots per key
    for i in range(6):
        ref_ts = BASE_TS + timedelta(days=7 + i)
        for snap in range(2):
            rows.append(
                {
                    "referrer": "r_A" if i % 2 == 0 else "r_B",
                    "referral": f"u{i}",
                    "timestamp": ref_ts,
                    "indexed_timestamp": ref_ts + timedelta(hours=snap),
                }
            )
    return rows


@pytest.fixture(scope="module")
def rw(spark, tmp_path_factory):
    trades = spark.createDataFrame(_gen_trades(), TRADES_SCHEMA)
    refs = spark.createDataFrame(_gen_referrals(), REFERRALS_SCHEMA)
    base = str(tmp_path_factory.mktemp("rwpipe"))
    p = build_rewards_pipeline(spark, base, trades, refs)
    out = p.run(
        spark,
        targets=[
            "referrals",
            "epoch_user_rewards",
            "cumulative_rewards",
            "referrer_rewards",
        ],
    )
    return trades, refs, out


def test_share_of_total_sums_to_one(spark, rw):
    _, _, out = rw
    shares = (
        out["epoch_user_rewards"]
        .groupBy("epoch")
        .agg(F.sum("taker_share").alias("s"), F.sum("taker_volume").alias("v"))
        .collect()
    )
    for r in shares:
        if r["v"] and r["v"] > 0:
            assert abs(r["s"] - 1.0) < 1e-9


def test_cdc_latest_unique_keys(spark, rw):
    _, refs, out = rw
    latest = out["referrals"]
    assert latest.count() == 6  # one row per (referrer, referral)
    dup = latest.groupBy("referrer", "referral").count().filter("count > 1")
    assert dup.count() == 0


def test_asof_attribution_only_after_referral(spark, rw):
    trades, refs, out = rw
    rr = out["referrer_rewards"]
    # referred volume can only come from trades at/after the earliest referral
    first_ref = min(r["timestamp"] for r in refs.collect())
    eligible = trades.filter(F.col("block_time") >= F.lit(first_ref)).agg(
        F.sum("volume")
    ).first()[0]
    attributed = rr.agg(F.sum("referred_volume")).first()[0]
    assert attributed is not None and attributed <= eligible + 1e-6
    assert rr.filter(F.col("referrer_reward") < 0).count() == 0


def test_cumulative_monotone(spark, rw):
    _, _, out = rw
    cum = out["cumulative_rewards"]
    # decimal window sums round at 1e-6 — allow that much slack
    w_bad = cum.filter(F.col("cumulative_reward") < F.col("epoch_reward") - 1e-5)
    assert w_bad.count() == 0
