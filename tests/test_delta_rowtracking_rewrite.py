"""Stable row ids THROUGH rewrites (PROTOCOL.md "Row Tracking",
materialized row id / row commit version columns): when
``delta.enableRowTracking=true`` AND the table declares
``delta.rowTracking.materializedRowIdColumnName`` /
``...RowCommitVersionColumnName``, the row-moving operations (OPTIMIZE,
rewrite DELETE, UPDATE, MERGE) preserve each row's id by writing it into
the materialized physical column of the rewritten file; the row commit
version is preserved for copied rows and advances to the committing
version for updated rows.  The r13 gate (refusal without declared
names) stays for tables that promise stability without naming the
columns."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    _replay,
    delete_delta,
    merge_delta,
    optimize,
    read_delta,
    read_delta_row_ids,
    update_delta,
    write_delta,
)

RID = "_row-id-col-7af3"
RCV = "_row-commit-col-7af3"


def _golden_rt_mat(table, schema_fields=None, partition_cols=()):
    """Foreign stable-row-id table WITH materialized column names
    declared (the spec's required state when enableRowTracking=true)."""
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": schema_fields or [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    actions = [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "CREATE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking",
                                         "domainMetadata"]}},
        {"metaData": {
            "id": "66666666-6666-6666-6666-666666666666",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema,
            "partitionColumns": list(partition_cols),
            "configuration": {
                "delta.enableRowTracking": "true",
                "delta.rowTracking.materializedRowIdColumnName": RID,
                "delta.rowTracking."
                "materializedRowCommitVersionColumnName": RCV,
            },
            "createdTime": 1700000000000,
        }},
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def _ids(spark, table):
    """{k: (row_id, row_commit_version)} via the public read surface."""
    return {
        r["k"]: (r["row_id"], r["row_commit_version"])
        for r in read_delta_row_ids(spark, table).collect()
    }


def _seed(spark, table, n=20, files=2):
    write_delta(
        spark.range(n).selectExpr("id AS k", "concat('v', id) AS v")
        .repartition(files),
        table, mode="append",
    )


def test_optimize_preserves_ids_and_versions(spark, tmp_path):
    t = str(tmp_path / "rtopt")
    _golden_rt_mat(t)
    _seed(spark, t, n=20, files=3)
    write_delta(
        spark.range(20, 30).selectExpr("id AS k", "concat('v', id) AS v"),
        t, mode="append",
    )
    before = _ids(spark, t)
    optimize(spark, t, target_file_rows=1000)
    after = _ids(spark, t)
    # every row kept BOTH its id and its commit version across the move
    assert after == before
    # the rewritten file materialized the ids physically
    _, _, live, _ = _replay(t)
    assert len(live) == 1
    f = pq.read_table(os.path.join(t, next(iter(live))))
    assert RID in f.schema.names and RCV in f.schema.names
    # stats never describe the physical-only columns
    add = next(iter(live.values()))
    stats = json.loads(add["stats"])
    assert RID not in stats["minValues"] and RCV not in stats["nullCount"]
    # the new add still gets a fresh baseRowId range (materialized
    # values simply take precedence)
    assert add["baseRowId"] is not None


def test_rewrite_delete_preserves_survivors(spark, tmp_path):
    t = str(tmp_path / "rtdel")
    _golden_rt_mat(t)
    _seed(spark, t, n=10, files=1)
    before = _ids(spark, t)
    res = delete_delta(spark, t, [("k", "<", 4)], mode="rewrite")
    assert res["rows_deleted"] == 4
    after = _ids(spark, t)
    assert after == {k: rv for k, rv in before.items() if k >= 4}
    assert read_delta(spark, t).count() == 6


def test_update_keeps_id_advances_version(spark, tmp_path):
    t = str(tmp_path / "rtupd")
    _golden_rt_mat(t)
    _seed(spark, t, n=10, files=1)
    before = _ids(spark, t)
    res = update_delta(
        spark, t, {"v": "concat(v, '!')"}, [("k", ">=", 7)]
    )
    v_new = res["version"]
    after = _ids(spark, t)
    for k, (rid, rcv) in after.items():
        assert rid == before[k][0]          # id stable for ALL rows
        if k >= 7:
            assert rcv == v_new             # updated: committing version
        else:
            assert rcv == before[k][1]      # copied: preserved


def test_merge_clause_matrix_row_tracking(spark, tmp_path):
    t = str(tmp_path / "rtmrg")
    _golden_rt_mat(t)
    _seed(spark, t, n=10, files=1)
    before = _ids(spark, t)
    src = spark.createDataFrame(
        [(2, "upd2"), (5, "upd5"), (100, "new100")], "k bigint, v string"
    )
    res = merge_delta(
        spark, t, src, on=["k"],
        when_matched_update="*",
        when_not_matched_insert="*",
    )
    v_new = res["version"]
    after = _ids(spark, t)
    hwm_before = max(rid for rid, _ in before.values())
    for k, (rid, rcv) in after.items():
        if k == 100:                         # inserted: fresh id
            assert rid > hwm_before and rcv == v_new
        elif k in (2, 5):                    # updated: id kept
            assert rid == before[k][0] and rcv == v_new
        else:                                # copied: both kept
            assert (rid, rcv) == before[k]
    # CDF/change accounting untouched by the carry-through columns
    assert res["rows_updated"] == 2 and res["rows_inserted"] == 1


def test_merge_delete_clause_drops_ids(spark, tmp_path):
    t = str(tmp_path / "rtmrgdel")
    _golden_rt_mat(t)
    _seed(spark, t, n=6, files=1)
    before = _ids(spark, t)
    src = spark.createDataFrame([(0,), (3,)], "k bigint")
    merge_delta(spark, t, src, on=["k"], when_matched_delete=True)
    after = _ids(spark, t)
    assert after == {k: rv for k, rv in before.items() if k not in (0, 3)}


def test_dv_delete_then_optimize_keeps_live_ids(spark, tmp_path):
    # DV delete punches holes (positions keep their ids); the OPTIMIZE
    # rewrite then materializes the survivors' GAPPED ids
    t = str(tmp_path / "rtdvopt")
    _golden_rt_mat(t)
    _seed(spark, t, n=12, files=1)
    before = _ids(spark, t)
    delete_delta(spark, t, [("k", "<", 5)], mode="dv")
    optimize(spark, t, target_file_rows=1000)
    after = _ids(spark, t)
    assert after == {k: rv for k, rv in before.items() if k >= 5}


def test_second_rewrite_reads_materialized_values(spark, tmp_path):
    # round-trip: rewrite of a rewrite must read ids from the
    # MATERIALIZED columns, not re-derive base+position
    t = str(tmp_path / "rtrt2")
    _golden_rt_mat(t)
    _seed(spark, t, n=8, files=2)
    before = _ids(spark, t)
    optimize(spark, t, target_file_rows=1000)
    delete_delta(spark, t, [("k", "=", 0)], mode="rewrite")
    update_delta(spark, t, {"v": "'x'"}, [("k", "=", 7)])
    after = _ids(spark, t)
    assert {k: rv[0] for k, rv in after.items()} == {
        k: rv[0] for k, rv in before.items() if k != 0
    }


def test_gate_stays_without_materialized_names(spark, tmp_path):
    # enableRowTracking=true WITHOUT declared names still refuses —
    # regression guard on the r13 gate semantics
    from tests.test_delta_rowtracking import _golden_rt

    t = str(tmp_path / "rtgate2")
    _golden_rt(t, enabled=True)
    write_delta(
        spark.range(5).selectExpr("id AS k"), t, mode="append"
    )
    with pytest.raises(DeltaUnsupported, match="stable row ids"):
        optimize(spark, t)


def test_materialized_name_collision_refuses(spark, tmp_path):
    t = str(tmp_path / "rtcol")
    _golden_rt_mat(
        t,
        schema_fields=[
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": RID, "type": "long", "nullable": True,
             "metadata": {}},
        ],
    )
    write_delta(
        spark.range(3).selectExpr("id AS k", "id AS `" + RID + "`"),
        t, mode="append",
    )
    with pytest.raises(DeltaUnsupported, match="collide"):
        optimize(spark, t)


def test_row_ids_readable_without_materialized_names(spark, tmp_path):
    # feature declared, stability off: ids exist (base+position) and the
    # read surface works without any materialized columns
    from tests.test_delta_rowtracking import _golden_rt

    t = str(tmp_path / "rtread")
    _golden_rt(t, enabled=False)
    write_delta(
        spark.range(7).selectExpr("id AS k").coalesce(1),
        t, mode="append",
    )
    ids = {
        r["k"]: (r["row_id"], r["row_commit_version"])
        for r in read_delta_row_ids(spark, t).collect()
    }
    assert sorted(rid for rid, _ in ids.values()) == list(range(7))
    assert all(rcv == 1 for _, rcv in ids.values())


def test_zorder_optimize_preserves_ids(spark, tmp_path):
    # the z-order branch reshuffles rows across files aggressively —
    # exactly the move stable ids must survive
    t = str(tmp_path / "rtz")
    _golden_rt_mat(t)
    _seed(spark, t, n=40, files=4)
    before = _ids(spark, t)
    optimize(spark, t, zorder_by=["k"], target_file_rows=10)
    after = _ids(spark, t)
    assert after == before
