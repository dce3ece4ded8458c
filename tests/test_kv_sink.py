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
