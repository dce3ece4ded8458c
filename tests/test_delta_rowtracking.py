"""Row tracking (PROTOCOL.md "Row Tracking", writer feature
``rowTracking``): fresh base-row-id allocation from the
delta.rowTracking domain's high-water mark, defaultRowCommitVersion
stamping, id preservation on DV re-adds, checkpoint survival of the
per-file fields, and the stable-id (delta.enableRowTracking=true) gate
on row-moving operations."""

from __future__ import annotations

import json
import os

import pytest

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    _replay,
    cleanup_log,
    delete_delta,
    domain_metadata,
    merge_delta,
    optimize,
    read_delta,
    update_delta,
    write_checkpoint,
    write_delta,
)


def _golden_rt(table, enabled=False):
    """Foreign rowTracking table: feature declared, empty live set."""
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
        ],
    })
    cfg = {"delta.enableRowTracking": "true"} if enabled else {}
    actions = [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "CREATE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking",
                                         "domainMetadata"]}},
        {"metaData": {
            "id": "55555555-5555-5555-5555-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": cfg, "createdTime": 1700000000000,
        }},
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def _adds_by_version(table):
    log = os.path.join(table, "_delta_log")
    out = {}
    for f in sorted(os.listdir(log)):
        if f.endswith(".json") and f[0].isdigit():
            v = int(f.split(".")[0])
            out[v] = [
                json.loads(ln)["add"]
                for ln in open(os.path.join(log, f))
                if ln.strip() and json.loads(ln).get("add")
            ]
    return out


def _hwm(table):
    return json.loads(
        domain_metadata(table)["delta.rowTracking"]
    )["rowIdHighWaterMark"]


def test_appends_allocate_disjoint_ranges(spark, tmp_path):
    t = str(tmp_path / "rt")
    _golden_rt(t)
    write_delta(
        spark.range(25).selectExpr("id AS k").repartition(3),
        t, mode="append",
    )
    write_delta(
        spark.range(25, 35).selectExpr("id AS k").coalesce(1),
        t, mode="append",
    )
    adds = _adds_by_version(t)
    spans = []
    for v, alist in adds.items():
        for a in alist:
            n = json.loads(a["stats"])["numRecords"]
            assert a["defaultRowCommitVersion"] == v
            spans.append((a["baseRowId"], a["baseRowId"] + n - 1))
    # every row id allocated exactly once: disjoint, gap-free coverage
    spans.sort()
    assert spans[0][0] == 0
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert lo2 == hi1 + 1
    assert _hwm(t) == 34


def test_dv_delete_preserves_base_row_ids(spark, tmp_path):
    t = str(tmp_path / "rtdv")
    _golden_rt(t, enabled=True)  # stable ids: dv delete must still work
    write_delta(
        spark.range(100).selectExpr("id AS k").coalesce(1),
        t, mode="append",
    )
    before = {
        a["path"]: a["baseRowId"]
        for a in _adds_by_version(t)[1]
    }
    delete_delta(spark, t, [("k", "<", 10)], mode="dv")
    _, _, live, _ = _replay(t)
    for p, add in live.items():
        assert add["baseRowId"] == before[p]  # the re-add kept its id
        assert add["deletionVector"] is not None
    assert read_delta(spark, t).count() == 90
    # the DV commit added no files, so the mark is unchanged
    assert _hwm(t) == 99


def test_stable_ids_gate_row_moving_ops(spark, tmp_path):
    t = str(tmp_path / "rtgate")
    _golden_rt(t, enabled=True)
    write_delta(
        spark.range(10).selectExpr("id AS k").coalesce(1),
        t, mode="append",
    )
    src = spark.createDataFrame([(1,), (100,)], "k bigint")
    with pytest.raises(DeltaUnsupported, match="stable row ids"):
        merge_delta(spark, t, src, on=["k"],
                    when_not_matched_insert="*")
    with pytest.raises(DeltaUnsupported, match="stable row ids"):
        update_delta(spark, t, {"k": "k + 1000"}, [("k", "=", 1)])
    with pytest.raises(DeltaUnsupported, match="stable row ids"):
        delete_delta(spark, t, [("k", "<", 5)], mode="rewrite")
    with pytest.raises(DeltaUnsupported, match="stable row ids"):
        optimize(spark, t)
    # appends and dv deletes stay available
    write_delta(
        spark.range(10, 12).selectExpr("id AS k"), t, mode="append"
    )
    delete_delta(spark, t, [("k", "=", 0)], mode="dv")
    assert read_delta(spark, t).count() == 11


def test_unstable_ids_allow_rewrites_with_fresh_ranges(spark, tmp_path):
    # feature present but enableRowTracking NOT true: ids exist but are
    # not guaranteed stable — rewrites allowed, rewritten files get
    # FRESH ranges beyond the mark
    t = str(tmp_path / "rtfree")
    _golden_rt(t, enabled=False)
    for lo, hi in ((0, 10), (10, 20)):
        write_delta(
            spark.range(lo, hi).selectExpr("id AS k").coalesce(1),
            t, mode="append",
        )
    assert _hwm(t) == 19
    optimize(spark, t)
    _, _, live, _ = _replay(t)
    for add in live.values():
        assert add["baseRowId"] >= 20  # fresh range, never reused
    assert _hwm(t) >= 20 + 19
    assert read_delta(spark, t).count() == 20


def test_row_ids_survive_checkpoint(spark, tmp_path):
    t = str(tmp_path / "rtck")
    _golden_rt(t)
    write_delta(
        spark.range(30).selectExpr("id AS k").coalesce(1),
        t, mode="append",
    )
    write_checkpoint(t)
    cleanup_log(t)
    _, _, live, _ = _replay(t)
    add = next(iter(live.values()))
    assert add["baseRowId"] == 0
    assert add["defaultRowCommitVersion"] == 1
    assert _hwm(t) == 29
    # post-checkpoint appends keep allocating past the surviving mark
    write_delta(
        spark.range(30, 33).selectExpr("id AS k"), t, mode="append"
    )
    assert _hwm(t) == 32
