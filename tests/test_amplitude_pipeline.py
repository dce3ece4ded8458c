"""End-to-end amplitude pipeline test (SURVEY §3.4): gz-JSON glob source →
wallet-connect validity windows → interval-join attribution, on deterministic
gzip fixtures."""

from __future__ import annotations

import gzip
import json
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.pipelines.amplitude import SENTINEL, build_amplitude_pipeline

T0 = datetime(2024, 5, 1, 9, 0, 0)


def _iso(dt):
    return dt.strftime("%Y-%m-%dT%H:%M:%S")


def _write_gz(path, rows):
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def amplitude_result(spark, tmp_path_factory):
    landed = tmp_path_factory.mktemp("amp_landed")
    # device d1: modern connect (props) at +0h, legacy connect (split form)
    # at +2h, trades around them; one pre-first-connect event at -1h that
    # must fall back to the FIRST connect
    rows1 = [
        {"amplitude_id": "d1", "event_id": "e0", "event_type": "page_view",
         "event_time": _iso(T0 - timedelta(hours=1)), "event_properties": {},
         "city": "SG", "country": "SG", "device_family": "mac"},
        {"amplitude_id": "d1", "event_id": "e1", "event_type": "Wallet_Connect",
         "event_time": _iso(T0),
         "event_properties": {"wallet_address": "addr1", "wallet_provider": "phantom"},
         "city": "SG", "country": "SG", "device_family": "mac"},
        {"amplitude_id": "d1", "event_id": "e2", "event_type": "trade",
         "event_time": _iso(T0 + timedelta(hours=1)),
         "event_properties": {"asset": "SOL", "price": 20.0, "size": 3.0},
         "city": "SG", "country": "SG", "device_family": "mac"},
        {"amplitude_id": "d1", "event_id": "e3",
         "event_type": "wallet_connect addr2 solflare",
         "event_time": _iso(T0 + timedelta(hours=2)), "event_properties": {},
         "city": "SG", "country": "SG", "device_family": "mac"},
        {"amplitude_id": "d1", "event_id": "e4", "event_type": "trade",
         "event_time": _iso(T0 + timedelta(hours=3)),
         "event_properties": {"asset": "BTC", "price": 100.0, "size": 0.5},
         "city": "SG", "country": "SG", "device_family": "mac"},
    ]
    # device d2: never connects — every event is unknown/not connected
    rows2 = [
        {"amplitude_id": "d2", "event_id": "x1", "event_type": "page_view",
         "event_time": _iso(T0), "event_properties": {},
         "city": "NY", "country": "US", "device_family": "win"},
    ]
    _write_gz(str(landed / "part1.json.gz"), rows1)
    _write_gz(str(landed / "part2.json.gz"), rows2)

    base = str(tmp_path_factory.mktemp("amp_pipe"))
    p = build_amplitude_pipeline(spark, base, str(landed) + "/*.json.gz")
    out = p.run(spark)
    return out


def test_gz_glob_ingested(spark, amplitude_result):
    assert amplitude_result["raw_amplitude_events"].count() == 6


def test_wallet_connect_extraction_both_forms(spark, amplitude_result):
    wc = amplitude_result["cleaned_amplitude_wallet_connects"]
    rows = {r["wallet_connect_sequence"]: r for r in wc.collect()}
    assert len(rows) == 2
    # modern form reads event_properties; legacy form splits event_type
    assert (rows[1]["wallet_address"], rows[1]["wallet_provider"]) == (
        "addr1", "phantom")
    assert (rows[2]["wallet_address"], rows[2]["wallet_provider"]) == (
        "addr2", "solflare")
    # validity chain: first window ends where the second begins; last window
    # carries the 9999-12-31 sentinel
    assert rows[1]["usage_end"] == rows[2]["usage_start"]
    assert str(rows[2]["usage_end"]).startswith("9999-12-31")


def test_interval_attribution_and_fallback(spark, amplitude_result):
    ev = amplitude_result["cleaned_amplitude_events"]
    by_id = {r["event_id"]: r for r in ev.collect()}
    # in-window: trade at +1h belongs to connect 1, trade at +3h to connect 2
    assert by_id["e2"]["wallet_address"] == "addr1"
    assert by_id["e4"]["wallet_address"] == "addr2"
    # pre-first-connect event falls back to the FIRST connect (c2 join)
    assert by_id["e0"]["wallet_address"] == "addr1"
    # never-connected device
    assert by_id["x1"]["wallet_address"] == "unknown/not connected"
    # event-name normalization: legacy 'wallet_connect addr2 solflare' is NOT
    # renamed (only '%Wallet_Connect%' matches the reference predicate), the
    # modern one stays Wallet_Connect
    assert by_id["e1"]["event_type"] == "Wallet_Connect"
    # amount = size * price
    assert by_id["e2"]["amount"] == 60.0
    assert by_id["x1"]["amount"] is None


def test_connect_rows_self_attribution(spark, amplitude_result):
    # each connect event lands in its own [start, end) window
    ev = amplitude_result["cleaned_amplitude_events"]
    by_id = {r["event_id"]: r for r in ev.collect()}
    assert by_id["e1"]["wallet_address"] == "addr1"
    assert by_id["e3"]["wallet_address"] == "addr2"
