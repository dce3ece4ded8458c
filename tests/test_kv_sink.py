"""KV serving-sink tests: composite keys, camelCase, unix timestamps, TTL,
sidecar metadata (S9/S10)."""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import Row

from zeta_etl_spark.sinks.kv_sink import KVTableSpec, export_to_kv


def test_kv_export_shape(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(timestamp=datetime(2024, 3, 1, 12, 0, 0), asset="SOL",
                trade_count=10, total_volume=123.5),
            Row(timestamp=datetime(2024, 3, 1, 13, 0, 0), asset="BTC",
                trade_count=3, total_volume=9.25),
        ]
    )
    spec = KVTableSpec(
        table_name="hourly_trades",
        partition_key=["asset"],
        sort_key=["timestamp"],
        global_secondary_indexes={"byHour": ["timestamp"]},
        ttl="interval 2 weeks",
        ttl_anchor="timestamp",
    )
    out = export_to_kv(df, spec, str(tmp_path))
    rows = {r["pk"]: r.asDict() for r in out.collect()}
    sol = rows["SOL"]
    # camelCase + unix seconds + TTL exactly 14 days ahead
    assert sol["tradeCount"] == 10
    assert sol["timestamp"] == int(datetime(2024, 3, 1, 12, 0, 0).timestamp())
    assert sol["expiry"] - sol["timestamp"] == 14 * 86400
    assert sol["sk"] == str(sol["timestamp"])

    meta_path = os.path.join(
        str(tmp_path), "hourly_trades", "_kv_table_spec.json"
    )
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["partition_key"] == ["asset"]
    assert meta["gsi"] == {"byHour": ["timestamp"]}
    # data materialized
    assert spark.read.parquet(
        os.path.join(str(tmp_path), "hourly_trades")
    ).count() == 2


# --- KVReader: the DynamoDB-shaped read surface ------------------------------


def _serve_table(spark, tmp_path):
    from zeta_etl_spark.sinks.kv_sink import KVReader

    df = spark.createDataFrame(
        [
            Row(timestamp=datetime(2024, 3, 1, h, 0, 0), asset=a,
                trade_count=h * 10 + i, total_volume=float(h))
            for i, a in enumerate(["SOL", "BTC"])
            for h in (10, 11, 12)
        ]
    )
    spec = KVTableSpec(
        table_name="serve",
        partition_key=["asset"],
        sort_key=["timestamp"],
        global_secondary_indexes={"byHour": ["timestamp", "asset"]},
        ttl="interval 1 hour",
        ttl_anchor="timestamp",
    )
    export_to_kv(df, spec, str(tmp_path))
    return KVReader(spark, str(tmp_path), "serve")


def test_kv_get_item_point_read(spark, tmp_path):
    r = _serve_table(spark, tmp_path)
    ts = int(datetime(2024, 3, 1, 11, 0, 0).timestamp())
    item = r.get_item("SOL", sk=ts)
    assert item["tradeCount"] == 110
    assert r.get_item("DOGE") is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple items"):
        r.get_item("SOL")  # 3 items share the pk, sk required


def test_kv_query_sort_key_semantics(spark, tmp_path):
    r = _serve_table(spark, tmp_path)
    t10 = int(datetime(2024, 3, 1, 10, 0, 0).timestamp())
    t11 = int(datetime(2024, 3, 1, 11, 0, 0).timestamp())
    items = r.query("SOL")
    assert [i["timestamp"] for i in items] == sorted(
        i["timestamp"] for i in items
    )
    assert len(items) == 3
    # ScanIndexForward=false + Limit: latest first
    latest = r.query("SOL", ascending=False, limit=1)
    assert latest[0]["tradeCount"] == 120
    # BETWEEN on the sk
    mid = r.query("SOL", between=(t10, t11))
    assert [i["tradeCount"] for i in mid] == [100, 110]
    # begins_with
    assert len(r.query("SOL", begins_with=str(t10)[:5])) == 3


def test_kv_query_index_and_lazy_ttl(spark, tmp_path):
    r = _serve_table(spark, tmp_path)
    t11 = int(datetime(2024, 3, 1, 11, 0, 0).timestamp())
    by_hour = r.query_index("byHour", t11)
    assert sorted(i["asset"] for i in by_hour) == ["BTC", "SOL"]
    import pytest as _pytest

    with _pytest.raises(KeyError, match="not declared"):
        r.query_index("nope", 1)
    # lazy TTL: expiry = ts + 1h; at now = t11 + 1h + 1s the 10:00 and
    # 11:00 items are expired, 12:00 survives
    now = t11 + 3600 + 1
    live = r.query("SOL", now_epoch=now)
    assert [i["tradeCount"] for i in live] == [120]
    assert r.get_item("SOL", sk=t11, now_epoch=now) is None


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "asset string, period string, volume double"
    )


def _spec():
    return KVTableSpec(
        table_name="metrics", partition_key=["asset"], sort_key=["period"]
    )


def test_put_mode_merges_per_key_like_dynamodb(spark, tmp_path):
    from zeta_etl_spark.sinks.kv_sink import KVReader

    t = str(tmp_path)
    export_to_kv(
        _mk(spark, [("SOL", "24h", 10.0), ("BTC", "24h", 5.0)]), _spec(), t
    )
    # second export: overwrites SOL#24h, adds ETH, leaves BTC intact
    export_to_kv(
        _mk(spark, [("SOL", "24h", 99.0), ("ETH", "24h", 7.0)]), _spec(), t
    )
    r = KVReader(spark, t, "metrics")
    assert r.get_item("SOL", "24h")["volume"] == 99.0
    assert r.get_item("BTC", "24h")["volume"] == 5.0  # survived the put
    assert r.get_item("ETH", "24h")["volume"] == 7.0
    # recreate truncates: BTC is gone
    export_to_kv(
        _mk(spark, [("SOL", "24h", 1.0)]), _spec(), t, mode="recreate"
    )
    assert KVReader(spark, t, "metrics").get_item("BTC", "24h") is None


def test_batch_get_items_and_100_key_cap(spark, tmp_path):
    import pytest

    from zeta_etl_spark.sinks.kv_sink import KVReader

    t = str(tmp_path)
    export_to_kv(
        _mk(
            spark,
            [("A", "1h", 1.0), ("A", "24h", 2.0), ("B", "24h", 3.0)],
        ),
        _spec(),
        t,
    )
    r = KVReader(spark, t, "metrics")
    got = r.batch_get_items([("A", "24h"), ("B", "24h"), ("C", "24h")])
    assert sorted((x["pk"], x["volume"]) for x in got) == [
        ("A", 2.0), ("B", 3.0),
    ]  # missing keys simply absent, like BatchGetItem
    with pytest.raises(ValueError, match="100"):
        r.batch_get_items([("A", str(i)) for i in range(101)])


def test_estimate_write_plan_accounts_batches_and_wcu(spark):
    from zeta_etl_spark.sinks.kv_sink import build_export_frame, estimate_write_plan

    spec = _spec()  # batch size 25
    rows = [("A", str(i), float(i)) for i in range(60)] + [
        ("B", str(i), float(i)) for i in range(10)
    ]
    export = build_export_frame(_mk(spark, rows), spec)
    plan = estimate_write_plan(export, spec)
    assert plan["n_items"] == 70
    # per-pk chunks of 25: A=60 -> 3 batches, B=10 -> 1
    assert plan["n_batches"] == 4
    # every item is tiny (<1 KB) -> exactly 1 WCU each
    assert plan["total_wcu"] == 70
    assert plan["n_oversize_items"] == 0
    assert plan["est_seconds_at_provisioned"] == 70 / spec.throughput


def test_put_rejects_duplicate_keys_in_one_export(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="duplicate primary keys"):
        export_to_kv(
            _mk(spark, [("A", "24h", 1.0), ("A", "24h", 2.0)]),
            _spec(),
            str(tmp_path),
        )


def test_put_swap_recovers_from_crash_window(spark, tmp_path):
    import shutil

    from zeta_etl_spark.sinks.kv_sink import KVReader

    t = str(tmp_path)
    export_to_kv(_mk(spark, [("A", "24h", 1.0)]), _spec(), t)
    path = os.path.join(t, "metrics")
    # simulate a crash between the two swap renames: live dir moved
    # aside, replacement never landed
    shutil.move(path, path + "__old")
    export_to_kv(_mk(spark, [("B", "24h", 2.0)]), _spec(), t)
    r = KVReader(spark, t, "metrics")
    # the pre-crash table was recovered and merged into, not discarded
    assert r.get_item("A", "24h")["volume"] == 1.0
    assert r.get_item("B", "24h")["volume"] == 2.0


def test_put_merges_even_when_sidecar_is_missing(spark, tmp_path):
    """r11 advisor: a crash in an older writer could leave a live table
    without its sidecar; the merge gate is now the TABLE's existence, so
    a sidecar-less table still merges instead of silently truncating
    (and the sidecar now travels inside the staged dir, closing the
    crash window for good)."""
    import shutil

    spec = KVTableSpec(table_name="t", partition_key=["asset"])
    df1 = spark.createDataFrame([Row(asset="SOL", v=1)])
    export_to_kv(df1, spec, str(tmp_path))
    table = os.path.join(str(tmp_path), "t")
    os.unlink(os.path.join(table, "_kv_table_spec.json"))  # simulated crash
    df2 = spark.createDataFrame([Row(asset="BTC", v=2)])
    export_to_kv(df2, spec, str(tmp_path))
    got = {r["pk"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {"SOL": 1, "BTC": 2}  # merged, not truncated
    # sidecar restored atomically with the data
    assert os.path.exists(os.path.join(table, "_kv_table_spec.json"))
    shutil.rmtree(table)


def test_batch_get_items_separator_in_key_does_not_alias(spark, tmp_path):
    """r11 advisor: composite keys are matched as (pk, sk) TUPLES — a key
    value containing any would-be separator character must not alias a
    different pair."""
    from zeta_etl_spark.sinks.kv_sink import KVReader

    spec = KVTableSpec(
        table_name="alias", partition_key=["a"], sort_key=["b"]
    )
    sep = chr(1)
    df = spark.createDataFrame(
        [
            Row(a="x" + sep + "y", b="z", v=1),   # pk embeds the separator
            Row(a="x", b="y" + sep + "z", v=2),   # sk embeds it
            Row(a="x", b="q", v=3),
        ]
    )
    export_to_kv(df, spec, str(tmp_path), mode="recreate")
    reader = KVReader(spark, str(tmp_path), "alias")
    # asking for ("x", "y\x01z") must return ONLY row 2, never row 1
    got = reader.batch_get_items([("x", "y" + sep + "z")])
    assert [(r["pk"], r["sk"], r["v"]) for r in got] == [
        ("x", "y" + sep + "z", 2)
    ]
    # and the embedded-separator pk row is addressable as itself
    got2 = reader.batch_get_items([("x" + sep + "y", "z")])
    assert [r["v"] for r in got2] == [1]
