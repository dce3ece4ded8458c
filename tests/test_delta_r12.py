"""Round-12 regression tests for the Delta format layer.

Covers the r11 verdict/advice findings:

1. a zero-change MERGE with ``write_cdf=False`` must commit NOTHING
   (the r11 bug committed a dataChange rewrite whose CDF derivation
   fabricated delete+insert rows for every copied row);
2. no write path commits zero-row part files as adds, and a legacy
   table that HAS empty adds (foreign writers) is both readable and
   never forced to rewrite them;
3. writer-protocol validation: ``delta.appendOnly`` gates removes,
   unknown writerFeatures / CHECK constraints / invariants /
   generated columns refuse loudly before any commit;
4. v2-checkpoint sidecar paths are URI-decoded;
5. MERGE on a non-hive (flat foreign) layout takes partition values
   from the LOG and never NULL-corrupts copied rows.
"""

from __future__ import annotations

import json
import os
import urllib.parse

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    merge_delta,
    optimize,
    read_delta,
    restore_table,
    table_changes,
    write_delta,
)


# ------------------------------------------ 1. zero-change merge gates


def _seed(spark, t, rows=((1, 1.0), (2, 2.0))):
    write_delta(
        spark.createDataFrame(list(rows), "k bigint, v double"), t
    )


def test_zero_change_merge_without_cdf_commits_nothing(spark, tmp_path):
    """r11 verdict #1 repro: update_condition='false' + write_cdf=False
    claimed no row, yet committed a remove+add whose CDF derivation
    fabricated delete+insert pairs."""
    t = str(tmp_path / "zc")
    _seed(spark, t)
    m = merge_delta(
        spark, t,
        spark.createDataFrame([(2, 20.0)], "k bigint, v double"),
        on=["k"],
        when_matched_update="*",
        update_condition="false",
        write_cdf=False,
    )
    assert m["version"] == 0 and m["files_removed"] == 0
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    )
    # CDF over the untouched range: only the seed insert exists
    ch = table_changes(spark, t, 0, None)
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}


def test_zero_change_merge_without_cdf_and_metrics(spark, tmp_path):
    # the gate must hold even with collect_metrics=False (computed from
    # the plan itself, never from the cdc staging side effect)
    t = str(tmp_path / "zcm")
    _seed(spark, t)
    m = merge_delta(
        spark, t,
        spark.createDataFrame([(2, 20.0)], "k bigint, v double"),
        on=["k"],
        when_matched_update="*",
        update_condition="false",
        write_cdf=False,
        collect_metrics=False,
    )
    assert m["version"] == 0
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    )


# ------------------------------------------ 2. zero-row adds


def test_write_delta_never_commits_empty_adds(spark, tmp_path):
    t = str(tmp_path / "small")
    # 2 rows over 8 slices: 6 part files would be empty
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, v double"
    ).repartition(8)
    write_delta(df, t)
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
        adds = [
            json.loads(line)["add"] for line in fh if '"add"' in line
        ]
    assert adds, "non-empty slices must still commit"
    for a in adds:
        assert json.loads(a["stats"])["numRecords"] > 0
    # and no orphaned zero-row files linger in the table dir
    for root, _d, files in os.walk(t):
        if "_delta_log" in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                assert pq.ParquetFile(
                    os.path.join(root, f)
                ).metadata.num_rows > 0


def _legacy_table_with_empty_add(t):
    """Hand-author a foreign table with one real file and one committed
    ZERO-ROW add (stats numRecords=0), the wart r11 verdict #2 found."""
    os.makedirs(os.path.join(t, "_delta_log"))
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([1.0, 2.0])}),
        os.path.join(t, "real.parquet"),
    )
    pq.write_table(
        pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.float64())}),
        os.path.join(t, "empty.parquet"),
    )
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
    ]})
    lines = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 2}}),
        json.dumps({"metaData": {
            "id": "aaaaaaaa-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1}}),
        json.dumps({"add": {
            "path": "real.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True,
            "stats": json.dumps({"numRecords": 2,
                                 "minValues": {"k": 1},
                                 "maxValues": {"k": 2},
                                 "nullCount": {"k": 0}})}}),
        json.dumps({"add": {
            "path": "empty.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True,
            "stats": json.dumps({"numRecords": 0, "minValues": {},
                                 "maxValues": {}, "nullCount": {}})}}),
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_merge_prunes_legacy_empty_adds(spark, tmp_path):
    t = str(tmp_path / "legacy")
    _legacy_table_with_empty_add(t)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [1, 2]
    m = merge_delta(
        spark, t,
        spark.createDataFrame([(2, 9.0)], "k bigint, v double"),
        on=["k"], when_matched_update="*",
    )
    # the declared-empty add is PRUNED, never touched/rewritten
    assert m["files_removed"] == 1 and m["files_pruned"] == 1
    with open(
        os.path.join(t, "_delta_log", f"{m['version']:020d}.json")
    ) as fh:
        removed = [
            json.loads(line)["remove"]["path"]
            for line in fh
            if '"remove"' in line
        ]
    assert removed == ["real.parquet"]
    assert {(r["k"], r["v"]) for r in read_delta(spark, t).collect()} \
        == {(1, 1.0), (2, 9.0)}


def test_stats_less_empty_foreign_add_still_readable(spark, tmp_path):
    """ADVICE r11 #5: a zero-row foreign add WITHOUT stats, on a layout
    that needs per-file anchoring (flat non-hive), must not trip the
    must-surface assertion."""
    t = str(tmp_path / "flat0")
    os.makedirs(os.path.join(t, "_delta_log"))
    pq.write_table(
        pa.table({"k": pa.array([7], pa.int64())}),
        os.path.join(t, "Aa-x.parquet"),
    )
    pq.write_table(
        pa.table({"k": pa.array([], pa.int64())}),
        os.path.join(t, "Bb-empty.parquet"),
    )
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "p", "type": "string", "nullable": True, "metadata": {}},
    ]})
    lines = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 2}}),
        json.dumps({"metaData": {
            "id": "bbbbbbbb-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": ["p"],
            "configuration": {}, "createdTime": 1}}),
        # flat layout: partition values ONLY in the log, NO stats
        json.dumps({"add": {
            "path": "Aa-x.parquet", "partitionValues": {"p": "x"},
            "size": 1, "modificationTime": 1, "dataChange": True}}),
        json.dumps({"add": {
            "path": "Bb-empty.parquet", "partitionValues": {"p": "y"},
            "size": 1, "modificationTime": 1, "dataChange": True}}),
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    got = read_delta(spark, t)
    assert [(r["k"], r["p"]) for r in got.collect()] == [(7, "x")]


# ------------------------------------------ 3. writer protocol


def _retag_protocol(t, protocol=None, configuration=None, schema=None):
    """Rewrite commit 0's protocol/metaData in place (fixture surgery)."""
    path = os.path.join(t, "_delta_log", f"{0:020d}.json")
    out = []
    for line in open(path):
        if not line.strip():
            continue
        a = json.loads(line)
        if "protocol" in a and protocol is not None:
            a["protocol"] = protocol
        if "metaData" in a:
            if configuration is not None:
                a["metaData"]["configuration"] = configuration
            if schema is not None:
                a["metaData"]["schemaString"] = schema
        out.append(json.dumps(a))
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")


def test_append_only_table_gates_removes(spark, tmp_path):
    t = str(tmp_path / "ao")
    _seed(spark, t)
    _retag_protocol(t, configuration={"delta.appendOnly": "true"})
    df = spark.createDataFrame([(3, 3.0)], "k bigint, v double")
    # appends stay fine
    write_delta(df, t, mode="append")
    # overwrite / MERGE / RESTORE remove data -> refused
    with pytest.raises(DeltaUnsupported, match="appendOnly"):
        write_delta(df, t, mode="overwrite")
    with pytest.raises(DeltaUnsupported, match="appendOnly"):
        merge_delta(spark, t, df, on=["k"], when_matched_update="*")
    with pytest.raises(DeltaUnsupported, match="appendOnly"):
        restore_table(t, 0)
    # OPTIMIZE's dataChange:false removes are compaction — allowed
    optimize(spark, t)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [1, 2, 3]


def test_unknown_writer_features_refuse_before_commit(spark, tmp_path):
    t = str(tmp_path / "wf")
    _seed(spark, t)
    # collations: the designated genuinely-unsupported fixture
    # (rowTracking moved into the honored subset in r13; typeWidening
    # followed later the same round)
    _retag_protocol(t, protocol={
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["appendOnly", "collations"],
    })
    df = spark.createDataFrame([(3, 3.0)], "k bigint, v double")
    with pytest.raises(DeltaUnsupported, match="collations"):
        write_delta(df, t, mode="append")
    with pytest.raises(DeltaUnsupported, match="collations"):
        merge_delta(spark, t, df, on=["k"], when_matched_update="*")
    # no commit happened
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    )
    # the known-subset feature list stays writable
    _retag_protocol(t, protocol={
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["appendOnly", "changeDataFeed", "invariants"],
    })
    write_delta(df, t, mode="append")
    assert read_delta(spark, t).count() == 3


def test_check_constraints_and_invariants_enforced(spark, tmp_path):
    # r13 late: CHECK constraints and top-level invariants moved from
    # vacuous refusal to ROW-LEVEL ENFORCEMENT — a violating row aborts
    # the write loudly, a conforming one commits
    t = str(tmp_path / "ck")
    _seed(spark, t)
    _retag_protocol(
        t, configuration={"delta.constraints.positive": "v > 0"}
    )
    df = spark.createDataFrame([(3, -3.0)], "k bigint, v double")
    with pytest.raises(ValueError, match="violates"):
        write_delta(df, t, mode="append")
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    )
    write_delta(
        spark.createDataFrame([(3, 3.0)], "k bigint, v double"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 3

    t2 = str(tmp_path / "inv")
    _seed(spark, t2)
    inv_schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {"delta.invariants":
                      '{"expression":{"expression":"v > 0"}}'}},
    ]})
    _retag_protocol(t2, schema=inv_schema)
    with pytest.raises(ValueError, match="violates"):
        write_delta(df, t2, mode="append")
    assert read_delta(spark, t2).count() == 2


def test_legacy_writer_version_6_accepted_8_refused(spark, tmp_path):
    # r13: writer v6 (identity columns) is inside the implemented
    # subset — a v6 table WITHOUT identity metadata appends plainly
    # (tests/test_delta_identity.py covers generation/HWM); versions
    # past the table-features era still refuse loudly
    t = str(tmp_path / "w6")
    _seed(spark, t)
    _retag_protocol(
        t, protocol={"minReaderVersion": 1, "minWriterVersion": 6}
    )
    write_delta(
        spark.createDataFrame([(3, 3.0)], "k bigint, v double"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 3
    _retag_protocol(
        t, protocol={"minReaderVersion": 1, "minWriterVersion": 8}
    )
    with pytest.raises(DeltaUnsupported, match="minWriterVersion 8"):
        write_delta(
            spark.createDataFrame([(4, 4.0)], "k bigint, v double"),
            t, mode="append",
        )


# ------------------------------------------ 4. sidecar URI decoding


def test_sidecar_path_is_uri_decoded(tmp_path):
    from zeta_etl_spark.sinks.delta_log import _load_checkpoint

    t = str(tmp_path / "v2sc")
    log = os.path.join(t, "_delta_log")
    os.makedirs(os.path.join(log, "_sidecars"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})
    side_name = "part 1.parquet"  # space: URI-encodes to %20
    pq.write_table(
        pa.table({
            "add": pa.array(
                [{"path": "f1.parquet", "partitionValues": [],
                  "size": 1, "modificationTime": 1, "dataChange": True,
                  "stats": None}],
                pa.struct([
                    ("path", pa.string()),
                    ("partitionValues",
                     pa.map_(pa.string(), pa.string())),
                    ("size", pa.int64()),
                    ("modificationTime", pa.int64()),
                    ("dataChange", pa.bool_()),
                    ("stats", pa.string()),
                ]),
            )
        }),
        os.path.join(log, "_sidecars", side_name),
    )
    pq.write_table(
        pa.table({
            "protocol": pa.array(
                [{"minReaderVersion": 1, "minWriterVersion": 2}, None],
                pa.struct([("minReaderVersion", pa.int32()),
                           ("minWriterVersion", pa.int32())]),
            ),
            "metaData": pa.array(
                [None,
                 {"id": "x", "schemaString": schema,
                  "partitionColumns": [], "createdTime": 1}],
                pa.struct([
                    ("id", pa.string()),
                    ("schemaString", pa.string()),
                    ("partitionColumns", pa.list_(pa.string())),
                    ("createdTime", pa.int64()),
                ]),
            ),
            "sidecar": pa.array(
                [None,
                 {"path": urllib.parse.quote(side_name),
                  "sizeInBytes": 1, "modificationTime": 1}],
                pa.struct([("path", pa.string()),
                           ("sizeInBytes", pa.int64()),
                           ("modificationTime", pa.int64())]),
            ),
        }),
        os.path.join(
            log,
            f"{0:020d}.checkpoint.80a083e8-7026-4e79-81be-000000000000"
            ".parquet",
        ),
    )
    _protocol, _meta, live, _txns, _domains = _load_checkpoint(t, 0)
    assert sorted(live) == ["f1.parquet"]


# ------------------------------------------ 5. merge on flat layouts


def test_merge_on_flat_foreign_layout_keeps_partition_values(
    spark, tmp_path
):
    """ADVICE r11 #1: merge_delta used a basePath read for touched
    files; on a flat (non-hive) foreign layout that silently NULLed the
    partition column of every copied row.  The shared _scan_live seam
    takes them from the log."""
    t = str(tmp_path / "flatm")
    os.makedirs(os.path.join(t, "_delta_log"))
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([1.0, 2.0])}),
        os.path.join(t, "Xq-f1.parquet"),
    )
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        {"name": "p", "type": "string", "nullable": True, "metadata": {}},
    ]})
    lines = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 2}}),
        json.dumps({"metaData": {
            "id": "cccccccc-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": ["p"],
            "configuration": {}, "createdTime": 1}}),
        json.dumps({"add": {
            "path": "Xq-f1.parquet", "partitionValues": {"p": "x"},
            "size": 1, "modificationTime": 1, "dataChange": True}}),
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    m = merge_delta(
        spark, t,
        spark.createDataFrame([(2, 9.0, "x")],
                              "k bigint, v double, p string"),
        on=["k"], when_matched_update="*",
    )
    assert m["rows_updated"] == 1
    got = {(r["k"], r["v"], r["p"]) for r in read_delta(spark, t).collect()}
    # the COPIED row k=1 keeps p='x' — never NULL-corrupted
    assert got == {(1, 1.0, "x"), (2, 9.0, "x")}


# ------------------------------------------ 6. delete_delta (r12 new op)


def test_delete_rewrite_mode(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "delr")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k bigint, v double"
        ),
        t,
    )
    d = delete_delta(spark, t, [("k", ">=", 7)])
    assert d["mode"] == "rewrite" and d["rows_deleted"] == 3
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == list(range(7))
    # protocol untouched — any reader can still consume the table
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
        proto = next(
            json.loads(l)["protocol"] for l in fh if '"protocol"' in l
        )
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    # CDF: the delete commit carries cdc files with the deleted rows only
    ch = table_changes(spark, t, d["version"], d["version"])
    assert sorted(
        (r["k"], r["_change_type"]) for r in ch.collect()
    ) == [(7, "delete"), (8, "delete"), (9, "delete")]
    # time travel still shows everything pre-delete
    assert read_delta(spark, t, version=0).count() == 10
    # no-match delete commits NOTHING
    d2 = delete_delta(spark, t, [("k", ">=", 100)])
    assert d2["rows_deleted"] == 0 and d2["version"] == d["version"]


def test_delete_dv_mode_writes_spec_true_descriptor(spark, tmp_path):
    import struct
    import zlib

    from zeta_etl_spark.sinks.delta_dv import (
        deserialize_dv_bitmap,
        dv_file_path,
    )
    from zeta_etl_spark.sinks.delta_log import _replay, delete_delta

    t = str(tmp_path / "deld")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)],
            "k bigint, v double",
        ).repartition(1),
        t,
    )
    d = delete_delta(spark, t, [("k", ">=", 6)], mode="dv")
    assert d["mode"] == "dv" and d["rows_deleted"] == 4
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == list(range(6))
    _, _, live, _ = _replay(t)
    (rel, add), = live.items()
    desc = add["deletionVector"]
    assert desc["storageType"] == "u" and desc["cardinality"] == 4
    # the data file was NOT rewritten (DV is the whole point)
    assert read_delta(spark, t, version=0).count() == 10
    # independently parse the DV file bytes: version byte, BE size/data/
    # crc framing at the declared offset, portable bitmap inside
    path = dv_file_path(desc, t)
    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw[0:1] == b"\x01"
    off = desc["offset"]
    (size,) = struct.unpack(">i", raw[off:off + 4])
    assert size == desc["sizeInBytes"]
    data = raw[off + 4:off + 4 + size]
    (crc,) = struct.unpack(">i", raw[off + 4 + size:off + 8 + size])
    assert zlib.crc32(data) & 0xFFFFFFFF == crc & 0xFFFFFFFF
    # row indexes: single sorted file, so k=i sits at row index i
    assert deserialize_dv_bitmap(data) == [6, 7, 8, 9]
    # protocol upgraded to table features with the implied legacy set
    with open(
        os.path.join(t, "_delta_log", f"{d['version']:020d}.json")
    ) as fh:
        proto = next(
            json.loads(l)["protocol"] for l in fh if '"protocol"' in l
        )
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])


def test_delete_dv_mode_unions_with_existing_dv(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_dv import read_dv_rows
    from zeta_etl_spark.sinks.delta_log import _replay, delete_delta

    t = str(tmp_path / "deldu")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)],
            "k bigint, v double",
        ).repartition(1),
        t,
    )
    delete_delta(spark, t, [("k", ">=", 8)], mode="dv")
    d2 = delete_delta(spark, t, [("k", "<", 2)], mode="dv")
    assert d2["rows_deleted"] == 2
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [2, 3, 4, 5, 6, 7]
    _, _, live, _ = _replay(t)
    (rel, add), = live.items()
    assert add["deletionVector"]["cardinality"] == 4  # union, not replace
    assert read_dv_rows(add["deletionVector"], t) == [0, 1, 8, 9]
    # a second delete of already-DV'd rows is a no-op commit-wise
    d3 = delete_delta(spark, t, [("k", "<", 2)], mode="dv")
    assert d3["rows_deleted"] == 0 and d3["version"] == d2["version"]


def test_delete_dv_then_optimize_purges(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import (
        _replay,
        delete_delta,
        optimize,
        vacuum,
    )

    t = str(tmp_path / "deldp")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)],
            "k bigint, v double",
        ).repartition(1),
        t,
    )
    delete_delta(spark, t, [("k", "=", 3)], mode="dv")
    # vacuum must NOT collect the referenced DV file, even at 0 retention
    gone = vacuum(t, retention_ms=0)
    assert not any(g.endswith(".bin") for g in gone)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    optimize(spark, t)
    _, _, live, _ = _replay(t)
    assert not any(a.get("deletionVector") for a in live.values())
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    # now the DV file is unreferenced: vacuum collects it
    gone = vacuum(t, retention_ms=0)
    assert any(g.endswith(".bin") for g in gone)


def test_delete_rewrite_on_partitioned_prunes(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "delp")
    write_delta(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
            "k bigint, p string, v double",
        ),
        t,
        partition_by=["p"],
    )
    d = delete_delta(spark, t, [("p", "=", "a"), ("k", "=", 1)])
    assert d["rows_deleted"] == 1
    assert d["files_pruned"] >= 1  # the p=b file never read
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [2, 3, 4]


# ------------------------------------------ 7. update_delta (r12 new op)


def test_update_rewrite_with_cdf(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import update_delta

    t = str(tmp_path / "upd")
    write_delta(
        spark.createDataFrame(
            [(i, "a" if i < 5 else "b", float(i)) for i in range(10)],
            "k bigint, p string, v double",
        ),
        t,
        partition_by=["p"],
    )
    u = update_delta(
        spark, t, {"v": "v * 10"}, [("p", "=", "b"), ("k", ">=", 7)]
    )
    assert u["rows_updated"] == 3
    assert u["files_pruned"] >= 1  # the p=a file never read
    got = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {
        0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0,
        5: 5.0, 6: 6.0, 7: 70.0, 8: 80.0, 9: 90.0,
    }
    ch = table_changes(spark, t, u["version"], u["version"])
    kinds = sorted(
        (r["k"], r["_change_type"], r["v"]) for r in ch.collect()
    )
    assert kinds == [
        (7, "update_postimage", 70.0), (7, "update_preimage", 7.0),
        (8, "update_postimage", 80.0), (8, "update_preimage", 8.0),
        (9, "update_postimage", 90.0), (9, "update_preimage", 9.0),
    ]
    # no-match update commits NOTHING
    u2 = update_delta(spark, t, {"v": "v + 1"}, [("k", ">=", 100)])
    assert u2["rows_updated"] == 0 and u2["version"] == u["version"]
    # partition-column SET refuses loudly
    with pytest.raises(DeltaUnsupported, match="partition"):
        update_delta(spark, t, {"p": "'c'"}, [("k", "=", 1)])


def test_update_through_deletion_vector(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import (
        _replay,
        delete_delta,
        update_delta,
    )

    t = str(tmp_path / "upddv")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)],
            "k bigint, v double",
        ).repartition(1),
        t,
    )
    delete_delta(spark, t, [("k", "=", 4)], mode="dv")
    u = update_delta(spark, t, {"v": "v + 100"}, [("k", ">=", 3)])
    # k=4 is deleted: 3,5..9 update (6 rows), the rewrite drops the DV
    assert u["rows_updated"] == 6
    _, _, live, _ = _replay(t)
    assert not any(a.get("deletionVector") for a in live.values())
    got = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert 4 not in got
    assert got[3] == 103.0 and got[9] == 109.0 and got[2] == 2.0


# ------------------------------- 8. generated columns (r12 enforced)


def _gen_col_table(spark, t):
    """Foreign table declaring a generated column: total = k * 2."""
    write_delta(
        spark.createDataFrame(
            [(1, 2.0), (2, 4.0)], "k bigint, total double"
        ),
        t,
    )
    gen_schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "total", "type": "double", "nullable": True,
         "metadata": {"delta.generationExpression": "k * 2"}},
    ]})
    _retag_protocol(
        t,
        protocol={"minReaderVersion": 1, "minWriterVersion": 4},
        schema=gen_schema,
    )


def test_generated_columns_validated_on_append(spark, tmp_path):
    t = str(tmp_path / "gen")
    _gen_col_table(spark, t)
    # a provided value violating the expression is a loud error
    with pytest.raises(ValueError, match="generated-column violation"):
        write_delta(
            spark.createDataFrame([(5, 99.0)], "k bigint, total double"),
            t, mode="append",
        )
    # a satisfying append commits
    write_delta(
        spark.createDataFrame([(5, 10.0)], "k bigint, total double"),
        t, mode="append",
    )
    # an ABSENT generated column is computed
    write_delta(
        spark.createDataFrame([(7,)], "k bigint"),
        t, mode="append",
    )
    got = {r["k"]: r["total"] for r in read_delta(spark, t).collect()}
    assert got[5] == 10.0 and got[7] == 14.0


def test_generated_columns_recomputed_on_merge_and_update(
    spark, tmp_path
):
    from zeta_etl_spark.sinks.delta_log import update_delta

    t = str(tmp_path / "genm")
    _gen_col_table(spark, t)
    # MERGE '*' with a WRONG source total: the output recomputes it
    merge_delta(
        spark, t,
        spark.createDataFrame(
            [(2, 123.0), (9, 456.0)], "k bigint, total double"
        ),
        on=["k"], when_matched_update="*", when_not_matched_insert="*",
    )
    got = {r["k"]: r["total"] for r in read_delta(spark, t).collect()}
    assert got == {1: 2.0, 2: 4.0, 9: 18.0}
    # UPDATE of the source column: the generated column follows
    update_delta(spark, t, {"k": "k + 10"}, [("k", "=", 1)])
    got = {r["k"]: r["total"] for r in read_delta(spark, t).collect()}
    assert got == {11: 22.0, 2: 4.0, 9: 18.0}


def test_nested_generation_expression_still_refuses(spark, tmp_path):
    t = str(tmp_path / "genn")
    _seed(spark, t)
    nested = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": {"type": "struct", "fields": [
            {"name": "inner", "type": "double", "nullable": True,
             "metadata": {"delta.generationExpression": "1"}}]},
         "nullable": True, "metadata": {}},
    ]})
    _retag_protocol(t, schema=nested)
    with pytest.raises(DeltaUnsupported, match="nested generated"):
        write_delta(
            spark.createDataFrame([(3, 3.0)], "k bigint, v double"),
            t, mode="append",
        )


# ------------------------- 9. multi-part classic checkpoints (read)


def test_multipart_classic_checkpoint_reads(spark, tmp_path):
    """Foreign big-table layout: one classic checkpoint split over N
    parts (``<v>.checkpoint.<k>.<n>.parquet``).  All parts reconstitute
    together; an INCOMPLETE part set is ignored per spec."""
    from zeta_etl_spark.sinks.delta_log import cleanup_log

    t = str(tmp_path / "mp")
    log = os.path.join(t, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})
    for name, ks in (("f1.parquet", [1, 2]), ("f2.parquet", [3])):
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64())}),
            os.path.join(t, name),
        )
    # v0 (will be cleaned), v1 checkpointed across 2 parts
    for v, adds in ((0, ["f1.parquet"]), (1, ["f2.parquet"])):
        lines = [json.dumps(
            {"commitInfo": {"timestamp": v, "operation": "WRITE"}})]
        if v == 0:
            lines += [
                json.dumps({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}}),
                json.dumps({"metaData": {
                    "id": "dddddddd-0000-0000-0000-000000000000",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema, "partitionColumns": [],
                    "configuration": {}, "createdTime": 1}}),
            ]
        lines += [json.dumps({"add": {
            "path": p, "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True}}) for p in adds]
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    # part 1: protocol+metaData+f1; part 2: f2
    part_schema = {
        "protocol": pa.struct([("minReaderVersion", pa.int32()),
                               ("minWriterVersion", pa.int32())]),
        "metaData": pa.struct([
            ("id", pa.string()), ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("createdTime", pa.int64())]),
        "add": pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()), ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()), ("stats", pa.string())]),
    }

    def _part(rows, name):
        cols = {}
        for key, typ in part_schema.items():
            cols[key] = pa.array(
                [r.get(key) for r in rows], typ
            )
        pq.write_table(pa.table(cols), os.path.join(log, name))

    _part(
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "x", "schemaString": schema,
                          "partitionColumns": [], "createdTime": 1}},
            {"add": {"path": "f1.parquet", "partitionValues": [],
                     "size": 1, "modificationTime": 1,
                     "dataChange": True, "stats": None}},
        ],
        f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet",
    )
    _part(
        [
            {"add": {"path": "f2.parquet", "partitionValues": [],
                     "size": 1, "modificationTime": 1,
                     "dataChange": True, "stats": None}},
        ],
        f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet",
    )
    # cleanup deletes v0's JSON below the checkpoint; replay must come
    # back from the two parts alone
    gone = cleanup_log(t)
    assert gone == [0]
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [1, 2, 3]
    # an INCOMPLETE part set must be ignored: drop part 2 -> replay has
    # neither checkpoint nor v0 JSON, so it fails LOUDLY (no partial)
    os.unlink(os.path.join(
        log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
    ))
    with pytest.raises(ValueError, match="cannot reconstruct"):
        read_delta(spark, t)


# --------------------- 10. DML on column-mapped tables (cross paths)


def test_update_and_delete_on_mapped_table(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import delete_delta, update_delta

    t = str(tmp_path / "mapdml")
    write_delta(
        spark.createDataFrame(
            [(i, "a" if i < 5 else "b", float(i)) for i in range(10)],
            "k bigint, p string, v double",
        ),
        t,
        partition_by=["p"],
        column_mapping="name",
    )
    u = update_delta(spark, t, {"v": "v * 10"}, [("k", ">=", 8)])
    assert u["rows_updated"] == 2
    d = delete_delta(spark, t, [("k", "=", 0)])
    assert d["rows_deleted"] == 1
    got = {r["k"]: (r["p"], r["v"]) for r in read_delta(spark, t).collect()}
    assert 0 not in got
    assert got[8] == ("b", 80.0) and got[9] == ("b", 90.0)
    assert got[1] == ("a", 1.0)
    # everything staged under PHYSICAL names
    for root, dirs, _f in os.walk(t):
        for dname in dirs:
            assert not dname.startswith("p="), dname
    # CDF of the update surfaces logical names
    ch = table_changes(spark, t, u["version"], u["version"])
    assert set(ch.columns) >= {"k", "p", "v", "_change_type"}
    assert ch.count() == 4  # 2 pre + 2 post


def test_merge_schema_evolution_on_mapped_table(spark, tmp_path):
    t = str(tmp_path / "mapevo")
    write_delta(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
        t,
        column_mapping="name",
    )
    merge_delta(
        spark, t,
        spark.createDataFrame(
            [(2, 20.0, "x"), (3, 30.0, "y")],
            "k bigint, v double, note string",
        ),
        on=["k"],
        when_matched_update="*",
        when_not_matched_insert="*",
        schema_evolution=True,
    )
    from zeta_etl_spark.sinks.delta_log import _replay

    _, meta, _, _ = _replay(t)
    fields = json.loads(meta["schemaString"])["fields"]
    note = next(f for f in fields if f["name"] == "note")
    assert note["metadata"]["delta.columnMapping.id"] == 3
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] == "3"
    got = {r["k"]: (r["v"], r["note"]) for r in read_delta(spark, t).collect()}
    assert got == {1: (1.0, None), 2: (20.0, "x"), 3: (30.0, "y")}


# ------------------- 11. CDF over deletion-vector commits (r12 lift)


def test_cdf_derives_deletes_from_dv_delta(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import (
        delete_delta,
        read_delta_incremental,
    )

    t = str(tmp_path / "dvcdf")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)],
            "k bigint, v double",
        ).repartition(1),
        t,
    )
    d1 = delete_delta(spark, t, [("k", ">=", 8)], mode="dv")
    d2 = delete_delta(spark, t, [("k", "=", 0)], mode="dv")
    # commit 1: deletes exactly k=8,9; commit 2: exactly k=0 — the DV
    # UNION never re-reports the old positions
    ch1 = table_changes(spark, t, d1["version"], d1["version"])
    assert sorted((r["k"], r["_change_type"]) for r in ch1.collect()) \
        == [(8, "delete"), (9, "delete")]
    ch2 = table_changes(spark, t, d2["version"], d2["version"])
    assert [(r["k"], r["_change_type"]) for r in ch2.collect()] \
        == [(0, "delete")]
    # the incremental consumer in cdf mode sees insert + the 3 deletes
    cur = str(tmp_path / "cur.json")
    out, v = read_delta_incremental(
        spark, t, cur, consumer_id="c", mode="cdf"
    )
    assert v == d2["version"]
    kinds = {r["_change_type"] for r in out.collect()}
    assert kinds == {"insert"}  # initial snapshot bootstrap
    delete_delta(spark, t, [("k", "=", 5)], mode="dv")
    out2, _ = read_delta_incremental(
        spark, t, cur, consumer_id="c", mode="cdf"
    )
    assert [(r["k"], r["_change_type"]) for r in out2.collect()] \
        == [(5, "delete")]


# ---------------- 12. timestampNtz + vacuumProtocolCheck features


def test_timestamp_ntz_feature_table_round_trips(spark, tmp_path):
    """Modern delta-spark declares timestampNtz for TIMESTAMP_NTZ
    columns and vacuumProtocolCheck unconditionally — both are inside
    the implemented subset now."""
    import datetime

    t = str(tmp_path / "ntz")
    os.makedirs(os.path.join(t, "_delta_log"))
    pq.write_table(
        pa.table({
            "k": pa.array([1, 2], pa.int64()),
            # isAdjustedToUTC=false == TIMESTAMP_NTZ
            "ts": pa.array(
                [datetime.datetime(2024, 5, 1, 12, 0),
                 datetime.datetime(2024, 5, 2, 13, 30)],
                pa.timestamp("us"),
            ),
        }),
        os.path.join(t, "f1.parquet"),
    )
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "ts", "type": "timestamp_ntz", "nullable": True,
         "metadata": {}},
    ]})
    lines = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz", "vacuumProtocolCheck"],
            "writerFeatures": ["timestampNtz", "vacuumProtocolCheck",
                               "appendOnly"],
        }}),
        json.dumps({"metaData": {
            "id": "eeeeeeee-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1}}),
        json.dumps({"add": {
            "path": "f1.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True}}),
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    got = read_delta(spark, t)
    assert got.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    rows = sorted((r["k"], r["ts"].isoformat()) for r in got.collect())
    assert rows == [(1, "2024-05-01T12:00:00"), (2, "2024-05-02T13:30:00")]
    # writes are inside the feature subset too (append-only table)
    import datetime as dt

    write_delta(
        spark.createDataFrame(
            [(3, dt.datetime(2024, 5, 3, 9, 0))],
            "k bigint, ts timestamp_ntz",
        ),
        t,
        mode="append",
    )
    assert read_delta(spark, t).count() == 3


def test_cdf_of_overwrite_over_dv_table_excludes_deleted_rows(
    spark, tmp_path
):
    """A whole-file remove of a DV'd file (overwrite) must derive delete
    changes for the LIVE rows only — never resurrect DV-deleted rows
    into the change feed."""
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "dvow")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "k bigint, v double"
        ).repartition(1),
        t,
    )
    delete_delta(spark, t, [("k", ">=", 4)], mode="dv")
    v = write_delta(
        spark.createDataFrame([(100, 1.0)], "k bigint, v double"),
        t,
        mode="overwrite",
    )
    ch = table_changes(spark, t, v, v)
    got = sorted((r["k"], r["_change_type"]) for r in ch.collect())
    # deletes: only the 4 live rows; k=4,5 were already DV-deleted
    assert got == [
        (0, "delete"), (1, "delete"), (2, "delete"), (3, "delete"),
        (100, "insert"),
    ]


def test_cdf_of_restore_to_dv_snapshot(spark, tmp_path):
    """RESTORE back to a DV snapshot re-adds the DV'd file: CDF derives
    the returning file's LIVE rows as inserts (minus the descriptor) and
    the overwrite file's rows as deletes."""
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "dvres")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(4)], "k bigint, v double"
        ).repartition(1),
        t,
    )
    d = delete_delta(spark, t, [("k", "=", 3)], mode="dv")
    write_delta(
        spark.createDataFrame([(100, 1.0)], "k bigint, v double"),
        t,
        mode="overwrite",
    )
    rv = restore_table(t, d["version"])
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [0, 1, 2]
    ch = table_changes(spark, t, rv, rv)
    got = sorted((r["k"], r["_change_type"]) for r in ch.collect())
    assert got == [
        (0, "insert"), (1, "insert"), (2, "insert"), (100, "delete"),
    ]


def test_dv_delete_upgrades_legacy_protocol_with_implied_features(
    spark, tmp_path
):
    """dv-mode DELETE on a legacy writer-5 (column-mapped) table must
    enumerate every feature the legacy versions implied when upgrading
    to table features — dropping one would let an engine that cannot
    honor it write the table."""
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "legup")
    write_delta(
        spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, 3.0)], "k bigint, v double"
        ).repartition(1),
        t,
        column_mapping="name",
    )
    d = delete_delta(spark, t, [("k", "=", 2)], mode="dv")
    assert d["rows_deleted"] == 1
    with open(
        os.path.join(t, "_delta_log", f"{d['version']:020d}.json")
    ) as fh:
        proto = next(
            json.loads(l)["protocol"] for l in fh if '"protocol"' in l
        )
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert set(proto["readerFeatures"]) == {
        "columnMapping", "deletionVectors"
    }
    assert set(proto["writerFeatures"]) >= {
        "appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns", "columnMapping",
        "deletionVectors",
    }
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) \
        == [1, 3]


# ---------------- 13. review-pass regressions (NULL predicates & gates)


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL semantics: DELETE WHERE v >= 5 must keep rows where v IS NULL
    (the predicate is not TRUE).  The review found filter(~cond) silently
    dropped them from the rewritten file."""
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "nulld")
    write_delta(
        spark.createDataFrame(
            [(1, 1.0), (2, 5.0), (3, None)], "k bigint, v double"
        ).repartition(1),
        t,
    )
    d = delete_delta(spark, t, [("v", ">=", 5.0)])
    assert d["rows_deleted"] == 1
    got = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: 1.0, 3: None}  # the NULL row SURVIVES
    # and dv mode agrees
    t2 = str(tmp_path / "nulldv")
    write_delta(
        spark.createDataFrame(
            [(1, 1.0), (2, 5.0), (3, None)], "k bigint, v double"
        ).repartition(1),
        t2,
    )
    d2 = delete_delta(spark, t2, [("v", ">=", 5.0)], mode="dv")
    assert d2["rows_deleted"] == 1
    got2 = {r["k"]: r["v"] for r in read_delta(spark, t2).collect()}
    assert got2 == {1: 1.0, 3: None}


def test_update_null_predicate_rows_copied(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import update_delta

    t = str(tmp_path / "nullu")
    write_delta(
        spark.createDataFrame(
            [(1, 1.0), (2, 5.0), (3, None)], "k bigint, v double"
        ).repartition(1),
        t,
    )
    u = update_delta(spark, t, {"v": "v * 10"}, [("v", ">=", 5.0)])
    assert u["rows_updated"] == 1
    got = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: 1.0, 2: 50.0, 3: None}  # NULL row copied unchanged


def test_dml_only_rewrites_files_with_actual_hits(spark, tmp_path):
    """Stats overlap is not a hit: a candidate file whose rows all miss
    must keep its identity (no remove, no rewrite)."""
    from zeta_etl_spark.sinks.delta_log import (
        _replay,
        delete_delta,
        update_delta,
    )

    t = str(tmp_path / "hits")
    # two files with overlapping k-ranges; only one holds k=5
    write_delta(
        spark.createDataFrame([(1, 1.0), (9, 9.0)], "k bigint, v double")
        .repartition(1),
        t,
    )
    write_delta(
        spark.createDataFrame([(2, 2.0), (5, 5.0)], "k bigint, v double")
        .repartition(1),
        t,
        mode="append",
    )
    _, _, live_before, _ = _replay(t)
    d = delete_delta(spark, t, [("k", "=", 5)])
    assert d["files_touched"] == 1
    _, _, live_after, _ = _replay(t)
    # the miss file survives BY IDENTITY
    assert len(set(live_before) & set(live_after)) == 1
    u = update_delta(spark, t, {"v": "v + 1"}, [("k", "=", 9)])
    assert u["files_touched"] == 1


def test_checkpoint_and_vacuum_gate_unknown_writer_features(
    spark, tmp_path
):
    """The fixed checkpoint schema would DROP an unknown feature's
    per-file fields; vacuum could delete files an unknown feature still
    references — both must refuse.  (rowTracking, the r12 example,
    moved into the honored subset in r13 — its baseRowId fields now
    ride the checkpoint schema; collations is the designated
    genuinely-unsupported fixture.)"""
    from zeta_etl_spark.sinks.delta_log import vacuum, write_checkpoint

    t = str(tmp_path / "widen")
    _seed(spark, t)
    _retag_protocol(t, protocol={
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["collations"],
    })
    with pytest.raises(DeltaUnsupported, match="collations"):
        write_checkpoint(t)
    with pytest.raises(DeltaUnsupported, match="collations"):
        vacuum(t, retention_ms=0)
    # reading stays fine (reader protocol is v1)
    assert read_delta(spark, t).count() == 2


def test_nullability_relaxation_refused(spark, tmp_path):
    t = str(tmp_path / "nonnull")
    _seed(spark, t)
    strict = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": False,
         "metadata": {}},
    ]})
    _retag_protocol(t, schema=strict)
    nullable_frame = spark.createDataFrame(
        [(7, 7.0)], "k bigint, v double"
    )  # v nullable by default
    with pytest.raises(DeltaUnsupported, match="nullability"):
        write_delta(nullable_frame, t, mode="append")
    with pytest.raises(DeltaUnsupported, match="nullability"):
        merge_delta(
            spark, t, nullable_frame, on=["k"], when_matched_update="*"
        )


def test_dv_delete_on_cdf_enabled_table_writes_cdc(spark, tmp_path):
    """Spec writer obligation: delta.enableChangeDataFeed=true means DV
    commits must carry cdc files — foreign consumers cannot derive
    changes from a descriptor delta."""
    from zeta_etl_spark.sinks.delta_log import delete_delta

    t = str(tmp_path / "dvcdc")
    _seed(spark, t, rows=((1, 1.0), (2, 2.0), (3, 3.0)))
    _retag_protocol(
        t, configuration={"delta.enableChangeDataFeed": "true"}
    )
    d = delete_delta(spark, t, [("k", ">=", 2)], mode="dv")
    log = os.path.join(t, "_delta_log", f"{d['version']:020d}.json")
    cdc = [json.loads(l)["cdc"] for l in open(log) if '"cdc"' in l]
    assert cdc, "CDF-enabled table: the DV commit must stage cdc files"
    # and the commit stays readable both ways
    ch = table_changes(spark, t, d["version"], d["version"])
    assert sorted((r["k"], r["_change_type"]) for r in ch.collect()) \
        == [(2, "delete"), (3, "delete")]
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [1]
