"""Streaming exact dedup — the streaming twin of the batch dedup family
(operators/dedup.py).  Two Spark-native operators pinned:

- ``dropDuplicates`` on a key in streaming mode: state holds EVERY key
  forever (correct, unbounded state — the scale hazard);
- ``dropDuplicatesWithinWatermark``: state is evicted once the watermark
  passes, so duplicates are suppressed only within the lateness horizon —
  the bounded-state contract a 100 TB ingest pipeline actually runs
  (exactly the at-least-once-delivery dedup the reference's CDC ingest
  assumes upstream of apply_changes; SURVEY.md §2.9).

Pinned semantics: a duplicate arriving WITHIN the watermark window is
dropped; the same key arriving again AFTER the watermark advanced past
the first occurrence's event time is emitted again (state was evicted) —
that re-emission is the documented cost of bounded state.
"""

from __future__ import annotations

import json
import os

from zeta_etl_spark.sources.json_source import read_json

SCHEMA = "msg_id bigint, user_id bigint, ts timestamp"


def _write(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src_dir, ckpt, dedup_within_watermark):
    df = read_json(spark, src_dir, SCHEMA, streaming=True).withWatermark(
        "ts", "10 minutes"
    )
    if dedup_within_watermark:
        deduped = df.dropDuplicatesWithinWatermark(["msg_id"])
    else:
        deduped = df.dropDuplicates(["msg_id"])
    out = []
    (
        deduped.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .foreachBatch(lambda d, _b: out.extend(d.collect()))
        .option("checkpointLocation", ckpt)
        .start()
        .awaitTermination()
    )
    return out


def test_dedup_within_watermark_drops_in_window_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    # msg 1 delivered twice within minutes (the at-least-once retry case),
    # msg 2 clean
    _write(
        src,
        "a.json",
        [
            {"msg_id": 1, "user_id": 7, "ts": "2024-01-01 10:00:00"},
            {"msg_id": 1, "user_id": 7, "ts": "2024-01-01 10:02:00"},
            {"msg_id": 2, "user_id": 8, "ts": "2024-01-01 10:03:00"},
        ],
    )
    rows = _run(spark, src, str(tmp_path / "ck1"), True)
    assert sorted(r.msg_id for r in rows) == [1, 2]


def test_dedup_within_watermark_reemits_after_horizon(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck2")
    _write(
        src,
        "a.json",
        [{"msg_id": 1, "user_id": 7, "ts": "2024-01-01 10:00:00"}],
    )
    first = _run(spark, src, ckpt, True)
    assert [r.msg_id for r in first] == [1]
    # watermark eviction happens BETWEEN microbatches: a later batch must
    # first advance the watermark past msg 1's expiry (10:00 + 10min)...
    _write(
        src,
        "b.json",
        [{"msg_id": 2, "user_id": 8, "ts": "2024-01-01 15:00:00"}],
    )
    assert [r.msg_id for r in _run(spark, src, ckpt, True)] == [2]
    # ...then the same msg_id re-delivered afterwards is re-emitted: its
    # state was evicted — bounded state trades eternal dedup for horizon
    # dedup
    _write(
        src,
        "c.json",
        [{"msg_id": 1, "user_id": 7, "ts": "2024-01-01 16:00:00"}],
    )
    second = _run(spark, src, ckpt, True)
    assert [r.msg_id for r in second] == [1]


def test_plain_streaming_dropduplicates_is_eternal(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck3")
    _write(
        src,
        "a.json",
        [{"msg_id": 1, "user_id": 7, "ts": "2024-01-01 10:00:00"}],
    )
    assert [r.msg_id for r in _run(spark, src, ckpt, False)] == [1]
    # re-delivery 6h later is STILL dropped — state never evicts, which is
    # exactly why this variant cannot run unbounded at ingest scale
    _write(
        src,
        "b.json",
        [{"msg_id": 1, "user_id": 7, "ts": "2024-01-01 16:00:00"}],
    )
    assert _run(spark, src, ckpt, False) == []
