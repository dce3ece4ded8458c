"""V2 checkpoint WRITE (sinks/delta_log.py write_checkpoint(format='v2')).

The engine has READ v2 checkpoints (UUID top file + sidecars) since r12;
this file covers the WRITE half (r12 verdict ask #1): layout bytes, the
protocol gate, DV-descriptor survival, and a round-trip through an
INDEPENDENT reader implemented here from the spec (delta.io PROTOCOL.md
"V2 Spec Checkpoints") that never calls the module's own replay."""

from __future__ import annotations

import json
import os
import re
import urllib.parse

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    cleanup_log,
    delete_delta,
    enable_v2_checkpoints,
    last_txn_version,
    read_delta,
    write_checkpoint,
    write_delta,
)

_TOP_RE = re.compile(
    r"^(\d{20})\.checkpoint\."
    r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    r"\.parquet$"
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(lo, hi)],
        "k bigint, cat string, v double",
    )


def _v2_top_files(table):
    log = os.path.join(table, "_delta_log")
    return sorted(f for f in os.listdir(log) if _TOP_RE.match(f))


def _independent_v2_snapshot(table: str):
    """A second v2-checkpoint reader written HERE from the spec: find the
    newest UUID-named top file, take protocol/metaData from it, follow
    its sidecar actions into _delta_log/_sidecars/ for the add actions,
    then replay any JSON commits AFTER the checkpoint version.  Live
    files scan with bare pyarrow; DV'd files drop the deleted row
    indexes.  No delta_log.py code on this side."""
    log = os.path.join(table, "_delta_log")
    tops: dict[int, str] = {}
    for f in os.listdir(log):
        m = _TOP_RE.match(f)
        if m:
            tops[int(m.group(1))] = f
    assert tops, "no v2 top file written"
    v_ck = max(tops)
    top_rows = pq.read_table(os.path.join(log, tops[v_ck])).to_pylist()
    meta, live = None, {}
    ck_meta_rows = [r for r in top_rows if r.get("checkpointMetadata")]
    assert len(ck_meta_rows) == 1
    assert dict(ck_meta_rows[0]["checkpointMetadata"])["version"] == v_ck
    for r in top_rows:
        if r.get("metaData"):
            meta = dict(r["metaData"])
        elif r.get("add") or r.get("remove"):
            raise AssertionError("file actions must live in sidecars")
        elif r.get("sidecar"):
            side = os.path.join(
                log, "_sidecars",
                urllib.parse.unquote(dict(r["sidecar"])["path"]),
            )
            for sr in pq.read_table(side).to_pylist():
                if sr.get("add"):
                    a = dict(sr["add"])
                    live[a["path"]] = a
    # JSON tail after the checkpoint
    for name in sorted(os.listdir(log)):
        m = re.fullmatch(r"(\d{20})\.json", name)
        if not m or int(m.group(1)) <= v_ck:
            continue
        for line in open(os.path.join(log, name)):
            if not line.strip():
                continue
            a = json.loads(line)
            if "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
    names = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    rows = []
    for rel, add in live.items():
        tbl = pq.read_table(
            os.path.join(table, urllib.parse.unquote(rel))
        ).to_pylist()
        dv = add.get("deletionVector")
        dead: set[int] = set()
        if dv:
            from zeta_etl_spark.sinks.delta_dv import read_dv_rows

            dead = set(read_dv_rows(dict(dv), table))
        for i, r in enumerate(tbl):
            if i in dead:
                continue
            full = dict(r)
            for k, v in dict(add.get("partitionValues") or {}).items():
                full[k] = v
            rows.append(tuple(str(full[n]) for n in names))
    return names, sorted(rows)


def test_v2_refuses_without_feature(spark, tmp_path):
    t = str(tmp_path / "nofeat")
    write_delta(_df(spark, 0, 10), t)
    with pytest.raises(DeltaUnsupported, match="v2Checkpoint"):
        write_checkpoint(t, format="v2")
    # classic still fine on the same table
    assert write_checkpoint(t) == 0


def test_enable_v2_checkpoints_preserves_implied_features(spark, tmp_path):
    t = str(tmp_path / "feat")
    write_delta(_df(spark, 0, 10), t)
    v = enable_v2_checkpoints(t)
    assert v == 1
    # idempotent
    assert enable_v2_checkpoints(t) == 1
    from zeta_etl_spark.sinks.delta_log import _replay

    protocol, _, _, _ = _replay(t)
    assert protocol["minReaderVersion"] == 3
    assert protocol["minWriterVersion"] == 7
    assert "v2Checkpoint" in protocol["readerFeatures"]
    assert "v2Checkpoint" in protocol["writerFeatures"]
    # legacy writer 2 implied features enumerated
    assert {"appendOnly", "invariants"} <= set(protocol["writerFeatures"])


def test_v2_roundtrip_through_own_reader_after_cleanup(spark, tmp_path):
    t = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 40), t, partition_by=("cat",))
    write_delta(
        _df(spark, 40, 60), t, mode="append", partition_by=("cat",),
        txn=("appA", 7),
    )
    enable_v2_checkpoints(t)
    v = write_checkpoint(t, format="v2", max_actions_per_sidecar=2)
    assert v == 2
    log = os.path.join(t, "_delta_log")
    assert _v2_top_files(t), "UUID-named top file missing"
    sidecars = os.listdir(os.path.join(log, "_sidecars"))
    assert len(sidecars) >= 2, "max_actions_per_sidecar=2 must shard"
    # no classic checkpoint was written
    assert not os.path.exists(
        os.path.join(log, f"{v:020d}.checkpoint.parquet")
    )
    gone = cleanup_log(t)
    assert gone == [0, 1]
    back = read_delta(spark, t)
    assert back.count() == 60
    assert back.agg(F.sum("k")).first()[0] == sum(range(60))
    # txn action survived into the v2 checkpoint
    assert last_txn_version(t, "appA") == 7
    # _last_checkpoint points at the v2 checkpoint
    lc = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert lc["version"] == v


def test_v2_independent_reader_agrees(spark, tmp_path):
    t = str(tmp_path / "indep")
    write_delta(_df(spark, 0, 30), t, partition_by=("cat",))
    write_delta(
        _df(spark, 30, 45), t, mode="append", partition_by=("cat",)
    )
    enable_v2_checkpoints(t)
    write_checkpoint(t, format="v2", max_actions_per_sidecar=3)
    # a post-checkpoint JSON commit must ride the tail replay
    write_delta(
        _df(spark, 45, 50), t, mode="append", partition_by=("cat",)
    )
    names, rows = _independent_v2_snapshot(t)
    ours = sorted(
        tuple(str(r[n]) for n in names)
        for r in read_delta(spark, t).collect()
    )
    assert ours == rows


def test_v2_checkpoint_carries_dv_descriptors(spark, tmp_path):
    t = str(tmp_path / "dv")
    write_delta(_df(spark, 0, 100), t)
    res = delete_delta(
        spark, t, [("k", "<", 20)], mode="dv"
    )
    assert res["rows_deleted"] == 20
    enable_v2_checkpoints(t)
    v = write_checkpoint(t, format="v2")
    cleanup_log(t)
    back = read_delta(spark, t, version=v)
    assert back.count() == 80
    assert back.agg(F.min("k")).first()[0] == 20
    # the independent reader sees the descriptor in the sidecar too
    names, rows = _independent_v2_snapshot(t)
    assert len(rows) == 80


def test_v2_empty_table_checkpoint(spark, tmp_path):
    t = str(tmp_path / "empty")
    write_delta(_df(spark, 0, 5), t)
    enable_v2_checkpoints(t)
    delete_delta(spark, t, [("k", ">=", 0)], mode="rewrite")
    v = write_checkpoint(t, format="v2")
    cleanup_log(t)
    assert read_delta(spark, t, version=v).count() == 0


def test_cleanup_collects_superseded_checkpoints_and_sidecars(
    spark, tmp_path
):
    t = str(tmp_path / "gc")
    write_delta(_df(spark, 0, 10), t)
    enable_v2_checkpoints(t)
    write_delta(_df(spark, 10, 20), t, mode="append")
    write_checkpoint(t, format="v2", max_actions_per_sidecar=1)  # v2
    log = os.path.join(t, "_delta_log")
    side = os.path.join(log, "_sidecars")
    old_sidecars = set(os.listdir(side))
    assert len(old_sidecars) >= 2
    old_top = _v2_top_files(t)
    write_delta(_df(spark, 20, 30), t, mode="append")
    v = write_checkpoint(t, format="v2", max_actions_per_sidecar=1)
    cleanup_log(t)
    # superseded top file AND its sidecars are gone; the newest
    # checkpoint's sidecars survive and replay still reconstructs
    assert _v2_top_files(t) == [
        f for f in _v2_top_files(t) if f.startswith(f"{v:020d}.")
    ]
    assert not (set(os.listdir(side)) & old_sidecars) or (
        # a sidecar may be re-referenced only if the new top names it
        set(os.listdir(side)) & old_sidecars
        == old_sidecars & set(os.listdir(side))
    )
    for gone_top in old_top:
        assert not os.path.exists(os.path.join(log, gone_top))
    back = read_delta(spark, t)
    assert back.count() == 30
    # survivors are exactly the files the newest top references
    import pyarrow.parquet as pq
    import urllib.parse as up

    top = pq.read_table(os.path.join(log, _v2_top_files(t)[0]))
    referenced = {
        up.unquote(dict(sc)["path"])
        for sc in top.column("sidecar").to_pylist()
        if sc is not None
    }
    assert set(os.listdir(side)) == referenced


def test_cleanup_collects_superseded_classic_checkpoints(spark, tmp_path):
    t = str(tmp_path / "gcc")
    write_delta(_df(spark, 0, 10), t)
    write_checkpoint(t)  # classic @0
    write_delta(_df(spark, 10, 20), t, mode="append")
    write_checkpoint(t)  # classic @1
    log = os.path.join(t, "_delta_log")
    cleanup_log(t)
    assert not os.path.exists(
        os.path.join(log, f"{0:020d}.checkpoint.parquet")
    )
    assert os.path.exists(
        os.path.join(log, f"{1:020d}.checkpoint.parquet")
    )
    assert read_delta(spark, t).count() == 20
