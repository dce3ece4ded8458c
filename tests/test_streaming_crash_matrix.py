"""Streaming crash matrix (VERDICT r6 next-6): kill each foreachBatch sink
at every seam of its commit protocol and assert exactly-once output after
resume.

Protocol seams (``zeta_etl_spark.streaming.runner._fault_injection``):

- ``post_stage``   — versioned dir written, nothing committed
- ``pre_publish``  — derived mirror / level-2 rebuilt, pointer not swapped
- ``post_publish`` — pointer committed, stream checkpoint NOT yet written
  (the availableNow replay path: the next run re-delivers the batch and the
  sink must re-merge idempotently)

Method per (operator × seam): run wave 1 clean → arm the fault → wave 2
crashes at the seam → disarm → rerun (checkpoint resume) → final output
must equal a clean twin run over the same two-wave schedule.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.streaming import runner as runner_mod
from zeta_etl_spark.streaming.runner import (
    foreach_batch_partitioned_append,
    foreach_batch_topk,
    foreach_batch_two_level_agg,
    foreach_batch_upsert,
    hourly_agg_stream,
)

SEAMS = ["post_stage", "pre_publish", "post_publish"]


class Crash(RuntimeError):
    pass


def _arm(monkeypatch, seam: str):
    """Fault that fires ONCE at the chosen seam, then disarms (the resumed
    run must be able to pass the same seam)."""
    fired = {"done": False}

    def fault(tag):
        if tag == seam and not fired["done"]:
            fired["done"] = True
            raise Crash(seam)

    monkeypatch.setattr(runner_mod, "_fault_injection", fault)
    return fired


def _disarm(monkeypatch):
    monkeypatch.setattr(runner_mod, "_fault_injection", lambda tag: None)


def _write_json(path: str, rows: list[dict], name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


# --- two-level agg ---------------------------------------------------------

AGG_SCHEMA = "user string, ts timestamp, amount double"
WAVE1 = [
    {"user": "a", "ts": "2024-01-01 00:10:00", "amount": 1.0},
    {"user": "a", "ts": "2024-01-01 01:20:00", "amount": 2.0},
    {"user": "b", "ts": "2024-01-01 02:30:00", "amount": 3.0},
]
WAVE2 = [
    {"user": "b", "ts": "2024-01-01 03:30:00", "amount": 4.0},
    {"user": "a", "ts": "2024-01-01 03:40:00", "amount": 5.0},
]


def _two_level_run(spark, src, out, ckpt):
    def second_level(l1):
        return l1.groupBy("user").agg(
            F.sum("total").alias("grand_total"), F.sum("n").alias("n_events")
        )

    stream = (
        spark.readStream.schema(AGG_SCHEMA).json(src)
    )
    first = hourly_agg_stream(
        stream,
        "ts",
        keys=[F.col("user")],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("amount").alias("total")],
        watermark="5 minutes",
    )
    foreach_batch_two_level_agg(
        first, ["hour_ts", "user"], out, ckpt, second_level, spark
    )


def _two_level_read(spark, out):
    return sorted(
        (r.user, r.grand_total, r.n_events)
        for r in spark.read.parquet(out).collect()
    )


# --- top-k -----------------------------------------------------------------

TOPK_SCHEMA = "grp string, item string, score double"
TOPK_WAVE1 = [
    {"grp": "g", "item": "w", "score": 10.0},
    {"grp": "g", "item": "x", "score": 20.0},
    {"grp": "g", "item": "y", "score": 30.0},
]
TOPK_WAVE2 = [
    {"grp": "g", "item": "z", "score": 25.0},
    {"grp": "g", "item": "w", "score": 40.0},  # update: w overtakes all
]


def _topk_run(spark, src, out, ckpt):
    stream = spark.readStream.schema(TOPK_SCHEMA).json(src)
    foreach_batch_topk(
        stream, out, ckpt, group_keys=["grp"], id_cols=["item"],
        order_col="score", k=2, spark=spark,
    )


def _topk_read(spark, out):
    return sorted(
        (r.grp, r.item, r.score, r.topk_rank)
        for r in spark.read.parquet(out).collect()
    )


# --- CDC upsert ------------------------------------------------------------

UPSERT_SCHEMA = "k string, v double, seq long"
UPSERT_WAVE1 = [
    {"k": "a", "v": 1.0, "seq": 1},
    {"k": "b", "v": 2.0, "seq": 1},
]
UPSERT_WAVE2 = [
    {"k": "a", "v": 9.0, "seq": 2},
    {"k": "c", "v": 3.0, "seq": 1},
]


def _upsert_run(spark, src, out, ckpt):
    stream = spark.readStream.schema(UPSERT_SCHEMA).json(src)
    foreach_batch_upsert(
        stream, out, ckpt, keys=["k"], sequence_by=["seq"], spark=spark
    )


def _upsert_read(spark, out):
    return sorted(
        (r.k, r.v, r.seq) for r in spark.read.parquet(out).collect()
    )


# --- CEP matches through the partitioned-append sink -----------------------

CEP_SCHEMA = "user_id long, event_id long, ts timestamp, event_type string"
CEP_WAVE1 = [
    {"user_id": 1, "event_id": 1, "ts": "2024-01-01 00:00:00", "event_type": "view"},
    {"user_id": 1, "event_id": 2, "ts": "2024-01-01 00:10:00", "event_type": "click"},
    {"user_id": 1, "event_id": 3, "ts": "2024-01-01 00:20:00", "event_type": "purchase"},
    # advance the watermark far enough to finalize the match above
    {"user_id": 9, "event_id": 4, "ts": "2024-01-01 02:00:00", "event_type": "view"},
]
CEP_WAVE2 = [
    {"user_id": 2, "event_id": 5, "ts": "2024-01-01 02:05:00", "event_type": "view"},
    {"user_id": 2, "event_id": 6, "ts": "2024-01-01 02:15:00", "event_type": "click"},
    {"user_id": 2, "event_id": 7, "ts": "2024-01-01 02:25:00", "event_type": "purchase"},
    {"user_id": 9, "event_id": 8, "ts": "2024-01-01 05:00:00", "event_type": "view"},
]


def _cep_run(spark, src, out, ckpt):
    from zeta_etl_spark.streaming.cep import detect_sequence_stream

    stream = spark.readStream.schema(CEP_SCHEMA).json(src)
    matches = detect_sequence_stream(stream, watermark="10 minutes")
    foreach_batch_partitioned_append(matches, out, ckpt)


def _cep_read(spark, out):
    return sorted(
        (r.user_id, r.match_ep)
        for r in spark.read.parquet(out).drop("batch").collect()
    )


OPERATORS = {
    "two_level_agg": (
        _two_level_run, _two_level_read, AGG_SCHEMA, WAVE1, WAVE2, SEAMS
    ),
    "topk": (
        _topk_run, _topk_read, TOPK_SCHEMA, TOPK_WAVE1, TOPK_WAVE2, SEAMS
    ),
    "upsert": (
        _upsert_run, _upsert_read, UPSERT_SCHEMA, UPSERT_WAVE1, UPSERT_WAVE2,
        SEAMS,
    ),
    # single-phase protocol: the partition write is the publish
    "cep": (
        _cep_run, _cep_read, CEP_SCHEMA, CEP_WAVE1, CEP_WAVE2,
        ["post_stage", "post_publish"],
    ),
}

CASES = [
    (op, seam) for op, spec in OPERATORS.items() for seam in spec[5]
]


@pytest.mark.parametrize("op,seam", CASES, ids=[f"{o}-{s}" for o, s in CASES])
def test_crash_at_seam_then_resume_is_exactly_once(
    spark, tmp_path, monkeypatch, op, seam
):
    run, read, _schema, wave1, wave2, _seams = OPERATORS[op]

    # clean twin: same two-wave schedule, separate dirs → expected output
    twin_src = str(tmp_path / "twin_src")
    twin_out = str(tmp_path / "twin_out")
    twin_ckpt = str(tmp_path / "twin_ckpt")
    _disarm(monkeypatch)
    _write_json(twin_src, wave1, "wave1.json")
    run(spark, twin_src, twin_out, twin_ckpt)
    _write_json(twin_src, wave2, "wave2.json")
    run(spark, twin_src, twin_out, twin_ckpt)
    expected = read(spark, twin_out)
    assert expected, f"{op}: twin run produced no rows — vacuous test"

    # crashed run
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_json(src, wave1, "wave1.json")
    run(spark, src, out, ckpt)

    _write_json(src, wave2, "wave2.json")
    fired = _arm(monkeypatch, seam)
    with pytest.raises(Exception) as exc_info:
        run(spark, src, out, ckpt)
    # the crash must come from OUR seam, not an unrelated failure
    assert "Crash" in str(exc_info.value) or isinstance(
        exc_info.value, Crash
    ), f"unexpected failure: {exc_info.value}"
    assert fired["done"], "fault never fired"

    # resume: checkpoint replays the uncommitted (or un-checkpointed) batch
    _disarm(monkeypatch)
    run(spark, src, out, ckpt)
    assert read(spark, out) == expected

    # a further no-input run must be a no-op (idempotence after heal)
    run(spark, src, out, ckpt)
    assert read(spark, out) == expected
