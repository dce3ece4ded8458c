"""MM-uptime pipeline tests: placement→completion interval construction,
epoch-end sentinel for open quotes, two-sided overlap pairing, per-minute
uptime sampling, median durations."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.mm_uptime import ORDERS_SCHEMA, build_mm_uptime_pipeline

T0 = "2024-03-01 00:00:00"
EPOCH_END = "2024-03-01 01:00:00"


def _ev(order_id, auth, side, price, action, ts):
    return {
        "order_id": order_id,
        "authority": auth,
        "asset": "SOL",
        "side": side,
        "price": price,
        "size": 1.0,
        "action": action,
        "block_time": datetime.fromisoformat(ts),
    }


@pytest.fixture(scope="module")
def mm_out(spark, tmp_path_factory):
    rows = [
        # mm_a: bid 00:00-00:30 (cancelled), ask 00:10-end (never completed)
        _ev("b1", "mm_a", "bid", 99.0, "place", "2024-03-01 00:00:00"),
        _ev("b1", "mm_a", "bid", 99.0, "cancel", "2024-03-01 00:30:00"),
        _ev("a1", "mm_a", "ask", 101.0, "place", "2024-03-01 00:10:00"),
        # mm_b: crossed quotes (ask below bid) — must NOT pair
        _ev("b2", "mm_b", "bid", 100.0, "place", "2024-03-01 00:00:00"),
        _ev("a2", "mm_b", "ask", 99.5, "place", "2024-03-01 00:00:00"),
        # mm_c: non-overlapping bid/ask windows — must NOT pair
        _ev("b3", "mm_c", "bid", 98.0, "place", "2024-03-01 00:00:00"),
        _ev("b3", "mm_c", "bid", 98.0, "fill", "2024-03-01 00:05:00"),
        _ev("a3", "mm_c", "ask", 102.0, "place", "2024-03-01 00:40:00"),
    ]
    df = spark.createDataFrame(rows, ORDERS_SCHEMA)
    base = str(tmp_path_factory.mktemp("mmpipe"))
    p = build_mm_uptime_pipeline(spark, base, df, EPOCH_END)
    return p.run(spark, targets=["quote_intervals", "two_sided_intervals", "mm_uptime"])


def test_open_quotes_closed_at_epoch_end(spark, mm_out):
    qi = {r["order_id"]: r for r in mm_out["quote_intervals"].collect()}
    assert qi["a1"]["end_time"] == datetime.fromisoformat(EPOCH_END)
    assert qi["b1"]["quote_duration_seconds"] == 30 * 60
    assert qi["b3"]["quote_duration_seconds"] == 5 * 60


def test_two_sided_pairing_rules(spark, mm_out):
    pairs = mm_out["two_sided_intervals"].collect()
    auths = {r["authority"] for r in pairs}
    assert auths == {"mm_a"}  # crossed (mm_b) and disjoint (mm_c) excluded
    (row,) = [r for r in pairs if r["authority"] == "mm_a"]
    # overlap = [00:10 (ask start), 00:30 (bid end)]
    assert row["overlap_start"].minute == 10 and row["overlap_end"].minute == 30
    assert row["spread"] == 2.0


def test_uptime_minutes(spark, mm_out):
    up = {r["authority"]: r for r in mm_out["mm_uptime"].collect()}
    # mm_a quoted two-sided 00:10–00:30 → 21 sampled minutes (inclusive ends)
    assert up["mm_a"]["quoted_minutes"] == 21
    assert up["mm_b"]["quoted_minutes"] == 0
    assert up["mm_a"]["median_quote_duration_s"] > 0
    assert up["mm_c"]["n_quotes"] == 2


def test_pairing_join_keyed_beyond_authority_asset(spark):
    # VERDICT r1 #8: the pairing must not be a plain (authority, asset) equi
    # join (quadratic per prolific MM) — the bucketized overlap join adds the
    # time bucket to the equi keys.  (Checked on the logical pairing frame:
    # the pipeline node itself reads back from parquet.)
    from datetime import datetime

    from zeta_etl_spark.operators.temporal import interval_overlap_join

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    asks = spark.createDataFrame(
        [("mm", "SOL", 101.0, t("2024-03-01 00:10:00"), t("2024-03-01 01:00:00"))],
        "authority string, asset string, ask_price double, "
        "ask_start timestamp, ask_end timestamp",
    )
    bids = spark.createDataFrame(
        [("mm", "SOL", 99.0, t("2024-03-01 00:00:00"), t("2024-03-01 00:30:00"))],
        "authority string, asset string, bid_price double, "
        "bid_start timestamp, bid_end timestamp",
    )
    paired = interval_overlap_join(
        asks, bids, "ask_start", "ask_end", "bid_start", "bid_end",
        keys=["authority", "asset"], bucket_seconds=3600,
    )
    assert paired.count() == 1  # overlap still detected through the buckets
    plan = paired._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "HashJoin" in ln
    ]
    assert any("_bucket" in ln for ln in join_lines), join_lines
