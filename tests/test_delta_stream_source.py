"""Structured-streaming source over the NATIVE Delta log (r12 verdict
ask #5): delta_stream_batches (rate-limited micro-batches: snapshot
chunks + per-commit tail) and run_delta_stream (foreachBatch-style drain
into a native Delta sink, exactly-once across crash replay via the
spec's txn action)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    delete_delta,
    delta_stream_batches,
    read_delta,
    write_delta,
)
from zeta_etl_spark.streaming import runner
from zeta_etl_spark.streaming.runner import run_delta_stream


def _src(spark, tmp_path, bands=((0, 10), (10, 20), (20, 30))):
    t = str(tmp_path / "src")
    for i, (lo, hi) in enumerate(bands):
        df = spark.createDataFrame(
            [(k, f"v{k}") for k in range(lo, hi)], "k bigint, v string"
        ).coalesce(1)
        write_delta(df, t, mode="append" if i else "overwrite")
    return t


def test_snapshot_then_incremental(spark, tmp_path):
    src = _src(spark, tmp_path)
    dest = str(tmp_path / "dest")
    cur = str(tmp_path / "cursor.json")
    res = run_delta_stream(
        spark, src, dest, app_id="s1", cursor_path=cur
    )
    # new consumer: the whole table arrives as ONE snapshot batch
    assert res["batches_delivered"] == 1
    assert read_delta(spark, dest).count() == 30
    # caught up: nothing re-delivered
    res2 = run_delta_stream(
        spark, src, dest, app_id="s1", cursor_path=cur
    )
    assert res2 == {
        "batches_delivered": 0, "batches_skipped": 0,
        "last_version": None,
    }
    # two more source commits arrive as the incremental tail only
    for lo, hi in ((30, 35), (35, 40)):
        write_delta(
            spark.createDataFrame(
                [(k, f"v{k}") for k in range(lo, hi)],
                "k bigint, v string",
            ).coalesce(1),
            src, mode="append",
        )
    res3 = run_delta_stream(
        spark, src, dest, app_id="s1", cursor_path=cur
    )
    assert res3["batches_delivered"] >= 1
    back = read_delta(spark, dest)
    assert back.count() == 40
    assert sorted(r["k"] for r in back.collect()) == list(range(40))


def test_rate_limit_shapes_batches(spark, tmp_path):
    src = _src(spark, tmp_path)  # 3 commits, 1 file each
    cur = str(tmp_path / "c.json")
    # snapshot chunked at 1 file per batch -> 3 snapshot batches
    batches = list(
        delta_stream_batches(
            spark, src, cur, max_files_per_trigger=1
        )
    )
    assert len(batches) == 3
    # cursor only advances on the LAST snapshot chunk
    assert [c for _, _, c in batches] == [None, None, 2]
    # txn versions strictly increase
    txns = [t for _, t, _ in batches]
    assert txns == sorted(txns) and len(set(txns)) == 3
    # consume: commit cursor at the final chunk
    from zeta_etl_spark.sinks.delta_log import commit_cursor

    commit_cursor(cur, "default", 2)
    # 4 more single-file commits; limit 2 files/trigger -> 2 batches
    for i in range(4):
        write_delta(
            spark.createDataFrame([(100 + i, "x")], "k bigint, v string")
            .coalesce(1),
            src, mode="append",
        )
    tail = list(
        delta_stream_batches(
            spark, src, cur, max_files_per_trigger=2
        )
    )
    assert len(tail) == 2
    assert [c for _, _, c in tail] == [4, 6]
    assert sum(df.count() for df, _, _ in tail) == 4


def test_crash_between_sink_and_cursor_is_exactly_once(
    spark, tmp_path, monkeypatch
):
    src = _src(spark, tmp_path)
    dest = str(tmp_path / "dest")
    cur = str(tmp_path / "cursor.json")
    run_delta_stream(spark, src, dest, app_id="s1", cursor_path=cur)
    # two tail commits; crash AFTER the first tail batch is sunk but
    # BEFORE its cursor commit
    for lo, hi in ((30, 33), (33, 36)):
        write_delta(
            spark.createDataFrame(
                [(k, "t") for k in range(lo, hi)], "k bigint, v string"
            ).coalesce(1),
            src, mode="append",
        )
    boom = {"n": 0}

    def _crash(tag):
        if tag == "delta_stream_post_sink":
            boom["n"] += 1
            if boom["n"] == 1:
                raise RuntimeError("injected crash")

    monkeypatch.setattr(runner, "_fault_injection", _crash)
    with pytest.raises(RuntimeError, match="injected"):
        run_delta_stream(
            spark, src, dest, app_id="s1", cursor_path=cur,
            max_files_per_trigger=1,
        )
    # the crashed batch IS durably in dest (sink-first ordering)...
    n_after_crash = read_delta(spark, dest).count()
    assert n_after_crash == 33
    # ...and the resumed drain re-delivers it into the txn skip: no
    # duplicates, both commits land exactly once
    res = run_delta_stream(
        spark, src, dest, app_id="s1", cursor_path=cur,
        max_files_per_trigger=1,
    )
    assert res["batches_skipped"] == 1
    back = read_delta(spark, dest)
    assert back.count() == 36
    assert back.groupBy("k").count().filter("count > 1").isEmpty()


def test_appends_mode_refuses_change_commits(spark, tmp_path):
    src = _src(spark, tmp_path)
    cur = str(tmp_path / "c.json")
    from zeta_etl_spark.sinks.delta_log import commit_cursor

    commit_cursor(cur, "default", 2)  # caught up past the snapshot
    delete_delta(spark, src, [("k", "<", 5)], mode="rewrite")
    with pytest.raises(DeltaUnsupported, match="cdf"):
        list(delta_stream_batches(spark, src, cur))
    # cdf mode delivers the row-level changes instead
    batches = list(delta_stream_batches(spark, src, cur, mode="cdf"))
    changes = batches[0][0]
    assert (
        changes.filter(F.col("_change_type") == "delete").count() == 5
    )
