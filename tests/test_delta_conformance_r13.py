"""Independent, spec-derived verification of the r13 writer surface —
no engine read path involved on the CHECK side: raw log JSON and raw
parquet footers are compared against what delta.io PROTOCOL.md says a
conforming writer must have produced (same posture as
test_delta_conformance.py: the engine writes, an independent reader
audits the bytes)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from zeta_etl_spark.sinks.delta_log import (
    enable_row_tracking,
    optimize,
    widen_column_type,
    add_check_constraint,
    write_delta,
)


def _log_actions(table):
    """Every action of every commit, raw from the JSON log."""
    log = os.path.join(table, "_delta_log")
    out = {}
    for f in sorted(os.listdir(log)):
        if f.endswith(".json") and f[0].isdigit():
            v = int(f.split(".")[0])
            out[v] = [
                json.loads(ln)
                for ln in open(os.path.join(log, f))
                if ln.strip()
            ]
    return out


def _last_meta(actions_by_version):
    meta = None
    for v in sorted(actions_by_version):
        for a in actions_by_version[v]:
            if "metaData" in a:
                meta = a["metaData"]
    return meta


def test_widening_commit_is_spec_shaped(spark, tmp_path):
    t = str(tmp_path / "cw")
    write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        t, mode="append",
    )
    widen_column_type(t, "v", "bigint")
    acts = _log_actions(t)
    # the widening commit: protocol with typeWidening in BOTH lists
    # (readerWriter feature, reader 3 / writer 7)
    protos = [a["protocol"] for a in acts[1] if "protocol" in a]
    assert len(protos) == 1
    p = protos[0]
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "typeWidening" in p["readerFeatures"]
    assert "typeWidening" in p["writerFeatures"]
    # schemaString: wide type + spec typeChanges record
    meta = _last_meta(acts)
    f = next(
        x for x in json.loads(meta["schemaString"])["fields"]
        if x["name"] == "v"
    )
    assert f["type"] == "long"
    assert f["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long", "tableVersion": 1}
    ]
    # the pre-widening data file still holds the NARROW physical type —
    # widening is metadata-only, no rewrite
    add = next(a["add"] for a in acts[0] if "add" in a)
    sch = pq.read_schema(os.path.join(t, add["path"]))
    assert str(sch.field("v").type) == "int32"


def test_rowtracking_backfill_is_spec_shaped(spark, tmp_path):
    t = str(tmp_path / "crt")
    write_delta(
        spark.range(12).selectExpr("id AS k").coalesce(2),
        t, mode="append",
    )
    enable_row_tracking(t)
    acts = _log_actions(t)
    enable = acts[1]
    p = next(a["protocol"] for a in enable if "protocol" in a)
    assert "rowTracking" in p["writerFeatures"]
    assert "domainMetadata" in p["writerFeatures"]
    meta = next(a["metaData"] for a in enable if "metaData" in a)
    cfg = meta["configuration"]
    assert cfg["delta.enableRowTracking"] == "true"
    rid = cfg["delta.rowTracking.materializedRowIdColumnName"]
    assert rid and rid not in {"k"}
    # backfill re-adds: every live file re-committed with a baseRowId
    # range whose widths are the files' numRecords, disjoint from 0,
    # dataChange false, and the domain HWM equals the last id
    readds = [a["add"] for a in enable if "add" in a]
    assert len(readds) == 2
    assert all(a["dataChange"] is False for a in readds)
    spans = sorted(
        (a["baseRowId"],
         a["baseRowId"] + json.loads(a["stats"])["numRecords"] - 1)
        for a in readds
    )
    assert spans[0][0] == 0 and spans[1][0] == spans[0][1] + 1
    dom = next(a["domainMetadata"] for a in enable
               if "domainMetadata" in a)
    assert dom["domain"] == "delta.rowTracking"
    assert json.loads(dom["configuration"])["rowIdHighWaterMark"] == 11


def test_materialized_ids_in_rewritten_parquet_bytes(spark, tmp_path):
    # after OPTIMIZE on a stable-id table, the REWRITTEN parquet file
    # must physically contain each row's pre-rewrite id in the
    # materialized column — checked with pyarrow directly against the
    # base+position derivation from the ORIGINAL file bytes
    t = str(tmp_path / "cmat")
    write_delta(
        spark.range(10).selectExpr("id AS k").coalesce(1),
        t, mode="append",
    )
    enable_row_tracking(t)
    acts = _log_actions(t)
    orig_add = next(a["add"] for a in acts[1] if "add" in a)
    orig = pq.read_table(os.path.join(t, orig_add["path"]))
    expected = {
        k.as_py(): orig_add["baseRowId"] + i
        for i, k in enumerate(orig.column("k"))
    }
    optimize(spark, t, target_file_rows=1000)
    acts = _log_actions(t)
    meta = _last_meta(acts)
    rid = meta["configuration"][
        "delta.rowTracking.materializedRowIdColumnName"
    ]
    new_add = next(a["add"] for a in acts[2] if "add" in a)
    new = pq.read_table(os.path.join(t, new_add["path"]))
    got = {
        k.as_py(): r.as_py()
        for k, r in zip(new.column("k"), new.column(rid))
    }
    assert got == expected
    # and the add's stats do NOT describe the materialized column
    stats = json.loads(new_add["stats"])
    assert rid not in stats["minValues"]
    assert rid not in stats["nullCount"]


def test_constraint_commit_is_spec_shaped(spark, tmp_path):
    t = str(tmp_path / "cck")
    write_delta(
        spark.createDataFrame([(1, 5.0)], "k bigint, v double"),
        t, mode="append",
    )
    add_check_constraint(spark, t, "v_pos", "v > 0")
    acts = _log_actions(t)
    con = acts[1]
    # legacy ladder: creation protocol was writer 2 -> raised to 3
    # (the version that admits CHECK constraints), NOT feature-era
    p = next(a["protocol"] for a in con if "protocol" in a)
    assert p["minWriterVersion"] == 3
    meta = next(a["metaData"] for a in con if "metaData" in a)
    assert meta["configuration"]["delta.constraints.v_pos"] == "v > 0"
    ci = next(a["commitInfo"] for a in con if "commitInfo" in a)
    assert ci["operation"] == "ADD CONSTRAINT"
