"""Stream-stream joins in Structured Streaming (beyond-reference: the
reference joins streams only against static dims — J1; a true
stream-stream join with watermark-bounded state is the Spark-native way
to correlate two live feeds, e.g. order placements against fills).

Pinned properties:
- inner join with BOTH sides watermarked and a time-range condition →
  state is bounded (Spark can evict rows older than the watermark);
- results match the equivalent batch join over the same files;
- left-outer stream-stream join emits unmatched left rows with nulls
  once the watermark passes (requires the range condition).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from zeta_etl_spark.sources.json_source import read_json

IMP = "imp_id bigint, user_id bigint, its timestamp"
CLK = "clk_id bigint, user_id bigint, cts timestamp"


def _write(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_join(spark, imp_dir, clk_dir, ckpt, join_type="inner"):
    imp = (
        read_json(spark, imp_dir, IMP, streaming=True)
        .withWatermark("its", "10 minutes")
    )
    clk = (
        read_json(spark, clk_dir, CLK, streaming=True)
        .withWatermark("cts", "10 minutes")
    )
    joined = imp.join(
        clk,
        (imp["user_id"] == clk["user_id"])
        & (clk["cts"] >= imp["its"])
        & (clk["cts"] <= imp["its"] + F.expr("INTERVAL 30 minutes")),
        join_type,
    )
    out = []
    (
        joined.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .foreachBatch(lambda df, _bid: out.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .start()
        .awaitTermination()
    )
    return out


def test_stream_stream_inner_join_matches_batch(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _write(
        imp_dir,
        "a.json",
        [
            {"imp_id": 1, "user_id": 7, "its": "2024-01-01 10:00:00"},
            {"imp_id": 2, "user_id": 7, "its": "2024-01-01 11:00:00"},
            {"imp_id": 3, "user_id": 9, "its": "2024-01-01 10:00:00"},
        ],
    )
    _write(
        clk_dir,
        "a.json",
        [
            # in-range for imp 1 (10:10), out of range for imp 2
            {"clk_id": 100, "user_id": 7, "cts": "2024-01-01 10:10:00"},
            # in-range for imp 2
            {"clk_id": 101, "user_id": 7, "cts": "2024-01-01 11:29:00"},
            # wrong user
            {"clk_id": 102, "user_id": 8, "cts": "2024-01-01 10:05:00"},
        ],
    )
    rows = _run_join(spark, imp_dir, clk_dir, str(tmp_path / "ck"))
    got = sorted((r.imp_id, r.clk_id) for r in rows)
    assert got == [(1, 100), (2, 101)]

    # batch twin over the same files must agree
    bi = read_json(spark, imp_dir, IMP)
    bc = read_json(spark, clk_dir, CLK)
    batch = bi.join(
        bc,
        (bi["user_id"] == bc["user_id"])
        & (bc["cts"] >= bi["its"])
        & (bc["cts"] <= bi["its"] + F.expr("INTERVAL 30 minutes")),
    )
    assert sorted((r.imp_id, r.clk_id) for r in batch.collect()) == got


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _write(
        imp_dir,
        "a.json",
        [
            {"imp_id": 1, "user_id": 7, "its": "2024-01-01 10:00:00"},
            {"imp_id": 2, "user_id": 8, "its": "2024-01-01 10:00:00"},
            # a late event far past the others advances the watermark so
            # the unmatched 10:00 imps are provably expired and emitted
            {"imp_id": 3, "user_id": 7, "its": "2024-01-02 12:00:00"},
        ],
    )
    _write(
        clk_dir,
        "a.json",
        [
            {"clk_id": 100, "user_id": 7, "cts": "2024-01-01 10:10:00"},
            {"clk_id": 101, "user_id": 7, "cts": "2024-01-02 12:05:00"},
        ],
    )
    ckpt = str(tmp_path / "ck")
    rows = _run_join(spark, imp_dir, clk_dir, ckpt, "left_outer")
    # availableNow runs the full input then one final watermark advance;
    # a second incremental run flushes any remainder deterministically
    rows += _run_join(spark, imp_dir, clk_dir, ckpt, "left_outer")
    got = sorted((r.imp_id, r.clk_id) for r in rows)
    assert (1, 100) in got and (3, 101) in got
    assert (2, None) in got, f"unmatched left row must surface: {got}"
