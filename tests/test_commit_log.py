"""Durable checkpointed commit log (round 8 session 3) — the _delta_log
stand-in that decouples DESCRIBE HISTORY from data retention:

- the log OUTLIVES vacuumed generations (history() is windowed by
  retain_generations; commit_log() is not)
- checkpoint + tail compaction bounds the read cost to O(1 checkpoint +
  tail) files regardless of total commits ever made
- a crash between pointer publish and log append is healed by the next
  writer's backfill

Reference semantics: Delta's transaction log + checkpointInterval backing
every @dlt.table write (zetadex-transactions-helius-pipeline.py:281-291).
"""

from __future__ import annotations

import os
import re

import pytest

import zeta_etl_spark.plans.graph as graph_mod
from zeta_etl_spark.plans.graph import Pipeline


def _mk(base, spark, rows, **kw):
    p = Pipeline("clog", base, **kw)

    @p.table(name="tbl")
    def tbl(pl):
        return spark.createDataFrame(rows, "k int, v int")

    p.run(spark, targets=["tbl"])
    return p


def _overwrite(p, spark, rows):
    node = p.nodes["tbl"]
    p._write_overwrite_atomic(
        node, spark.createDataFrame(rows, "k int, v int")
    )


def test_commit_log_survives_vacuum(spark, tmp_path):
    p = _mk(str(tmp_path / "t"), spark, [(1, 1)], retain_generations=1)
    for i in range(2, 7):
        _overwrite(p, spark, [(1, i)])
    # retention keeps only current + 1 prior; the log kept everything
    assert p.table_versions("tbl") == [5, 6]
    assert [h["version"] for h in p.history("tbl")] == [5, 6]
    log = p.commit_log("tbl")
    assert [e["version"] for e in log] == [1, 2, 3, 4, 5, 6]
    assert [e["retained"] for e in log] == [False] * 4 + [True] * 2
    assert [e["is_current"] for e in log] == [False] * 5 + [True]
    # every entry carries the footprint stats the log recorded at seal time
    assert all(e["files"] >= 1 and e["bytes"] > 0 for e in log)


def test_checkpoint_compacts_tail(spark, tmp_path):
    p = _mk(
        str(tmp_path / "t"),
        spark,
        [(1, 1)],
        retain_generations=1,
        log_checkpoint_every=3,
    )
    for i in range(2, 8):
        _overwrite(p, spark, [(1, i)])
    log_dir = p.path("tbl") + "__gen/_log"
    names = sorted(os.listdir(log_dir))
    ckpts = [n for n in names if n.startswith("_checkpoint_")]
    tails = [n for n in names if re.fullmatch(r"\d{6}\.json", n)]
    # checkpoints at v3 and v6; only the latest survives compaction, and
    # only the post-checkpoint tail (v7) remains as an entry file
    assert ckpts == ["_checkpoint_000006.json"]
    assert tails == ["000007.json"]
    assert [e["version"] for e in p.commit_log("tbl")] == list(range(1, 8))


def test_crash_before_log_append_backfilled(spark, tmp_path, monkeypatch):
    p = _mk(str(tmp_path / "t"), spark, [(1, 1)], retain_generations=2)

    class Boom(RuntimeError):
        pass

    def crash_post_retain(tag):
        if tag == "post_retain":
            raise Boom()

    monkeypatch.setattr(graph_mod, "_fault_injection", crash_post_retain)
    with pytest.raises(Boom):
        _overwrite(p, spark, [(1, 2)])
    monkeypatch.setattr(graph_mod, "_fault_injection", lambda tag: None)
    # v2 published (pointer swapped before the crash) but never logged
    assert p.table_versions("tbl") == [1, 2]
    assert [e["version"] for e in p.commit_log("tbl")] == [1]
    # the next writer's append backfills the gap from the sealed dir
    _overwrite(p, spark, [(1, 3)])
    log = p.commit_log("tbl")
    assert [e["version"] for e in log] == [1, 2, 3]
    assert log[1]["operation"] == "overwrite"


def test_merge_and_restore_operations_logged(spark, tmp_path):
    p = _mk(str(tmp_path / "t"), spark, [(1, 1), (2, 2)])
    src = spark.createDataFrame([(2, 99), (3, 3)], "k int, v int")
    p.merge_into(
        spark,
        "tbl",
        src,
        on=["k"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert={"k": "s.k", "v": "s.v"},
    )
    p.restore(spark, "tbl", 1)
    ops = [e["operation"] for e in p.commit_log("tbl")]
    assert ops[0] == "overwrite"
    assert "merge" in ops
    assert ops[-1] == "restore"
