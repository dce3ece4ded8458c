"""Flex pipeline tests: CDC latest-wins per entity, map-balance explode TVL."""

from __future__ import annotations

from datetime import datetime

from zeta_etl_spark.pipelines.flex import (
    AUCTIONS_SCHEMA,
    VAULTS_SCHEMA,
    build_flex_pipeline,
)


def test_flex_cdc_and_tvl(spark, tmp_path):
    t = datetime(2024, 3, 1, 10)
    t2 = datetime(2024, 3, 1, 10, 30)
    auctions = spark.createDataFrame(
        [
            ("a1", "SOL", "open", 5.0, t),
            ("a1", "SOL", "closed", 5.0, t2),
            ("a2", "ETH", "open", 2.0, t),
        ],
        AUCTIONS_SCHEMA,
    )
    vaults = spark.createDataFrame(
        [
            ("v1", "SOL", {"USDC": 100.0, "SOL": 2.0}, t, t),
            ("v1", "SOL", {"USDC": 150.0, "SOL": 2.0}, t, t2),  # newer snapshot
            ("v2", "ETH", {"USDC": 50.0}, t, t),
        ],
        VAULTS_SCHEMA,
    )
    p = build_flex_pipeline(spark, str(tmp_path / "flex"), auctions, vaults)
    out = p.run(spark, targets=["auctions", "vaults", "hourly_tvl"])

    a = {r["auction_id"]: r["state"] for r in out["auctions"].collect()}
    assert a == {"a1": "closed", "a2": "open"}
    assert out["vaults"].count() == 2

    tvl = {r["underlying"]: r for r in out["hourly_tvl"].collect()}
    assert abs(tvl["SOL"]["tvl"] - 152.0) < 1e-6  # newer v1 snapshot wins
    assert tvl["SOL"]["n_tokens"] == 2
    assert abs(tvl["ETH"]["tvl"] - 50.0) < 1e-6
