"""``enable_row_tracking`` — turning Row Tracking ON for an existing
table (PROTOCOL.md "Row Tracking" enablement): protocol upgrade to the
writer feature, generated materialized column names, the
``delta.enableRowTracking`` stability flag, and the BACKFILL that
re-adds every id-less live file so the commit choke point allocates its
baseRowId range — all one commit, legal because no file leaves it
without ids."""

from __future__ import annotations

import json

import pytest

from zeta_etl_spark.sinks.delta_log import (
    _replay,
    delete_delta,
    domain_metadata,
    enable_row_tracking,
    optimize,
    read_delta,
    read_delta_row_ids,
    update_delta,
    write_delta,
)


def _mk(spark, tmp_path, n=20, files=2, name="ert"):
    t = str(tmp_path / name)
    write_delta(
        spark.range(n).selectExpr("id AS k", "concat('v', id) AS v")
        .repartition(files),
        t, mode="append",
    )
    return t


def test_enable_backfills_and_stabilizes(spark, tmp_path):
    t = _mk(spark, tmp_path, n=30, files=3)
    v = enable_row_tracking(t)
    protocol, meta, live, _ = _replay(t)
    assert "rowTracking" in protocol["writerFeatures"]
    cfg = meta["configuration"]
    assert cfg["delta.enableRowTracking"] == "true"
    assert cfg["delta.rowTracking.materializedRowIdColumnName"]
    # every live file got a disjoint gap-free range at the backfill
    spans = sorted(
        (a["baseRowId"],
         a["baseRowId"] + json.loads(a["stats"])["numRecords"] - 1)
        for a in live.values()
    )
    assert spans[0][0] == 0
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert lo2 == hi1 + 1
    assert all(
        a["defaultRowCommitVersion"] == v for a in live.values()
    )
    ids = {
        r["k"]: r["row_id"] for r in read_delta_row_ids(spark, t).collect()
    }
    assert sorted(ids.values()) == list(range(30))


def test_enable_is_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = enable_row_tracking(t)
    assert enable_row_tracking(t) == v1  # no-op, no extra commit
    _, meta, _, _ = _replay(t)
    names1 = {
        k: v for k, v in meta["configuration"].items()
        if k.startswith("delta.rowTracking.")
    }
    enable_row_tracking(t)
    _, meta2, _, _ = _replay(t)
    names2 = {
        k: v for k, v in meta2["configuration"].items()
        if k.startswith("delta.rowTracking.")
    }
    assert names1 == names2  # generated names never churn


def test_enabled_table_rewrites_preserve_ids(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20, files=2)
    v_enable = enable_row_tracking(t)
    before = {
        r["k"]: (r["row_id"], r["row_commit_version"])
        for r in read_delta_row_ids(spark, t).collect()
    }
    assert all(rcv == v_enable for _, rcv in before.values())
    v_upd = update_delta(
        spark, t, {"v": "'upd'"}, [("k", ">=", 15)]
    )["version"]
    optimize(spark, t, target_file_rows=1000)
    delete_delta(spark, t, [("k", "=", 0)], mode="rewrite")
    after = {
        r["k"]: (r["row_id"], r["row_commit_version"])
        for r in read_delta_row_ids(spark, t).collect()
    }
    assert set(after) == set(before) - {0}
    for k, (rid, rcv) in after.items():
        assert rid == before[k][0]
        assert rcv == (v_upd if k >= 15 else v_enable)


def test_enable_unstable_keeps_rewrites_fresh(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    enable_row_tracking(t, stable=False)
    _, meta, _, _ = _replay(t)
    assert "delta.enableRowTracking" not in meta["configuration"]
    # ids exist but are NOT promised stable: optimize reallocates
    optimize(spark, t, target_file_rows=1000)
    _, _, live, _ = _replay(t)
    assert all(a["baseRowId"] >= 10 for a in live.values())


def test_backfill_preserves_dv_descriptors(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, files=1)
    delete_delta(spark, t, [("k", "<", 20)], mode="dv")
    enable_row_tracking(t)
    _, _, live, _ = _replay(t)
    add = next(iter(live.values()))
    assert add["deletionVector"]["cardinality"] == 20
    assert add["baseRowId"] is not None
    # DV'd positions keep their gaps: live ids are 20..49
    ids = sorted(
        r["row_id"] for r in read_delta_row_ids(spark, t).collect()
    )
    assert ids == list(range(20, 50))
    assert read_delta(spark, t).count() == 30


def test_post_enable_appends_extend_the_mark(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, files=1)
    enable_row_tracking(t)
    write_delta(
        spark.range(10, 14).selectExpr("id AS k", "'x' AS v"),
        t, mode="append",
    )
    hwm = json.loads(
        domain_metadata(t)["delta.rowTracking"]
    )["rowIdHighWaterMark"]
    assert hwm == 13
    ids = sorted(
        r["row_id"] for r in read_delta_row_ids(spark, t).collect()
    )
    assert ids == list(range(14))
