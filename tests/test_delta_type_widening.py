"""Type Widening (delta.io PROTOCOL.md): ``widen_column_type`` commits a
metadata-only lattice-checked type change with ``delta.typeChanges``
records and the ``typeWidening`` readerWriter feature; files written
before the widening keep their narrow physical type and every read
upcasts through the explicit current schema.  Stats-based skipping on
widened columns is conservatively disabled (old files carry stats in the
pre-widening rendering)."""

from __future__ import annotations

import json
import os

import pytest

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    _replay,
    _widening_ok,
    cleanup_log,
    delete_delta,
    merge_delta,
    read_delta,
    update_delta,
    widen_column_type,
    write_checkpoint,
    write_delta,
)


def _field(table, name):
    _, meta, _, _ = _replay(table)
    return next(
        f for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == name
    )


def test_widen_int_to_long_reads_old_and_new_files(spark, tmp_path):
    t = str(tmp_path / "w1")
    write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        t, mode="append",
    )
    v = widen_column_type(t, "v", "bigint")
    protocol, meta, _, _ = _replay(t)
    assert "typeWidening" in protocol["readerFeatures"]
    assert "typeWidening" in protocol["writerFeatures"]
    assert meta["configuration"]["delta.enableTypeWidening"] == "true"
    f = _field(t, "v")
    assert f["type"] == "long"
    assert f["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long", "tableVersion": v}
    ]
    # post-widening appends come in WIDE; the old narrow file upcasts
    write_delta(
        spark.createDataFrame(
            [(3, 30_000_000_000)], "k int, v bigint"
        ),
        t, mode="append",
    )
    rows = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows == {1: 10, 2: 20, 3: 30_000_000_000}
    assert dict(read_delta(spark, t).dtypes)["v"] == "bigint"


def test_widened_column_predicate_still_exact(spark, tmp_path):
    # stats skipping is disabled on the widened column, but the real
    # filter still applies — results are exact either way
    t = str(tmp_path / "w2")
    write_delta(
        spark.createDataFrame(
            [(i, i * 10) for i in range(10)], "k int, v int"
        ).repartition(3),
        t, mode="append",
    )
    widen_column_type(t, "v", "bigint")
    got = sorted(
        r["k"]
        for r in read_delta(
            spark, t, predicate=[("v", ">=", 70)]
        ).collect()
    )
    assert got == [7, 8, 9]


def test_dml_after_widening(spark, tmp_path):
    t = str(tmp_path / "w3")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "k int, v float"
        ),
        t, mode="append",
    )
    widen_column_type(t, "v", "double")
    update_delta(spark, t, {"v": "v + 0.5"}, [("k", "=", 1)])
    delete_delta(spark, t, [("k", "=", 2)], mode="rewrite")
    src = spark.createDataFrame([(3, 99.0), (100, 1.5)], "k int, v double")
    merge_delta(
        spark, t, src, on=["k"],
        when_matched_update="*", when_not_matched_insert="*",
    )
    rows = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows[1] == 1.5 and 2 not in rows
    assert rows[3] == 99.0 and rows[100] == 1.5


def test_merge_on_widened_key_column(spark, tmp_path):
    # the merge pruner's source-range predicate must not consult the
    # widened key's old-file stats
    t = str(tmp_path / "w4")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        t, mode="append",
    )
    widen_column_type(t, "k", "bigint")
    src = spark.createDataFrame([(2, "B"), (5, "E")], "k bigint, v string")
    merge_delta(
        spark, t, src, on=["k"],
        when_matched_update="*", when_not_matched_insert="*",
    )
    rows = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows == {1: "a", 2: "B", 5: "E"}


def test_decimal_and_date_widenings(spark, tmp_path):
    t = str(tmp_path / "w5")
    write_delta(
        spark.createDataFrame([(1,)], "k int").selectExpr(
            "k", "CAST(12.34 AS decimal(5,2)) AS d",
            "CAST('2024-03-01' AS date) AS dt",
        ),
        t, mode="append",
    )
    widen_column_type(t, "d", "decimal(9,4)")
    widen_column_type(t, "dt", "timestamp_ntz")
    protocol, _, _, _ = _replay(t)
    assert "timestampNtz" in protocol["readerFeatures"]
    row = read_delta(spark, t).collect()[0]
    assert str(row["d"]) == "12.3400"
    assert row["dt"].isoformat() == "2024-03-01T00:00:00"
    assert len(_field(t, "d")["metadata"]["delta.typeChanges"]) == 1


def test_double_widening_stacks_type_changes(spark, tmp_path):
    t = str(tmp_path / "w6")
    write_delta(
        spark.createDataFrame([(1, 2)], "k int, v tinyint"),
        t, mode="append",
    )
    v1 = widen_column_type(t, "v", "int")
    v2 = widen_column_type(t, "v", "bigint")
    assert _field(t, "v")["metadata"]["delta.typeChanges"] == [
        {"fromType": "byte", "toType": "integer", "tableVersion": v1},
        {"fromType": "integer", "toType": "long", "tableVersion": v2},
    ]
    assert read_delta(spark, t).collect()[0]["v"] == 2


def test_widening_refusals(spark, tmp_path):
    t = str(tmp_path / "w7")
    write_delta(
        spark.createDataFrame([(1, 10, "x")], "k int, v bigint, s string"),
        t, mode="append", partition_by=["k"],
    )
    with pytest.raises(DeltaUnsupported, match="lattice"):
        widen_column_type(t, "v", "int")      # narrowing
    with pytest.raises(DeltaUnsupported, match="lattice"):
        widen_column_type(t, "s", "bigint")   # string -> anything
    with pytest.raises(DeltaUnsupported, match="partition column"):
        widen_column_type(t, "k", "bigint")
    with pytest.raises(ValueError, match="no top-level column"):
        widen_column_type(t, "missing", "bigint")
    # no commit happened for any refusal
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{2:020d}.json")
    )


def test_widening_lattice_matrix(spark, tmp_path):
    # every allowed conversion actually upcasts through Spark's parquet
    # reader — the read-side claim the feature acceptance rests on
    t = str(tmp_path / "w8")
    write_delta(
        spark.createDataFrame([(1,)], "i int").selectExpr(
            "CAST(1 AS tinyint) AS tb", "CAST(2 AS smallint) AS sh",
            "CAST(3 AS int) AS it", "CAST(4.5 AS float) AS fl",
            "CAST('2024-03-01' AS date) AS dt",
            "CAST(12.34 AS decimal(5,2)) AS dec_c",
            "CAST(7 AS bigint) AS lg",
        ),
        t, mode="append",
    )
    expect = {
        ("tb", "smallint"): 1, ("tb", "int"): 1, ("tb", "bigint"): 1,
        ("tb", "double"): 1.0, ("sh", "int"): 2, ("sh", "bigint"): 2,
        ("sh", "double"): 2.0, ("it", "bigint"): 3,
        ("it", "double"): 3.0, ("fl", "double"): 4.5,
        ("lg", "decimal(20,0)"): 7,
    }
    for (col, to), want in expect.items():
        tt = str(tmp_path / f"w8_{col}_{to.replace('(','').replace(')','').replace(',','_')}")
        write_delta(read_delta(spark, t).select(col), tt, mode="append")
        widen_column_type(tt, col, to)
        got = read_delta(spark, tt).collect()[0][col]
        assert float(got) == float(want), (col, to, got)


def test_checkpoint_and_cleanup_on_widened_table(spark, tmp_path):
    t = str(tmp_path / "w9")
    write_delta(
        spark.createDataFrame([(1, 10)], "k int, v int"), t,
        mode="append",
    )
    widen_column_type(t, "v", "bigint")
    write_delta(
        spark.createDataFrame([(2, 20)], "k int, v bigint"), t,
        mode="append",
    )
    write_checkpoint(t)
    cleanup_log(t)
    assert _field(t, "v")["metadata"]["delta.typeChanges"]  # survived
    rows = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows == {1: 10, 2: 20}


def test_foreign_widened_table_reads(spark, tmp_path):
    # the FOREIGN direction: another engine already widened; our reader
    # honors the declared feature + current schema without any API call
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "wf")
    os.makedirs(os.path.join(t, "_delta_log"))
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int32())}),
        os.path.join(t, "f1.parquet"),
    )
    n = os.path.getsize(os.path.join(t, "f1.parquet"))
    schema_wide = json.dumps({
        "type": "struct",
        "fields": [{
            "name": "k", "type": "long", "nullable": True,
            "metadata": {"delta.typeChanges": [
                {"fromType": "integer", "toType": "long",
                 "tableVersion": 1}
            ]},
        }],
    })
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"],
                      "writerFeatures": ["typeWidening"]}},
        {"metaData": {
            "id": "w", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_wide, "partitionColumns": [],
            "configuration": {"delta.enableTypeWidening": "true"},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": n,
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}},
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    df = read_delta(spark, t)
    assert dict(df.dtypes)["k"] == "bigint"
    assert sorted(r["k"] for r in df.collect()) == [1, 2]
    # and our writer may append to it
    write_delta(
        spark.createDataFrame([(9_000_000_000,)], "k bigint"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 3


def test_widening_ok_lattice_unit():
    assert _widening_ok("integer", "long")
    assert _widening_ok("byte", "double")
    assert _widening_ok("float", "double")
    assert _widening_ok("date", "timestamp_ntz")
    assert _widening_ok("decimal(5,2)", "decimal(9,4)")
    assert _widening_ok("integer", "decimal(11,1)")
    assert _widening_ok("long", "decimal(20,0)")
    assert not _widening_ok("long", "integer")
    assert not _widening_ok("decimal(9,4)", "decimal(5,2)")
    assert not _widening_ok("decimal(5,2)", "decimal(6,4)")  # int part shrinks
    assert not _widening_ok("long", "decimal(19,0)")  # too few digits
    assert not _widening_ok("string", "long")
    assert not _widening_ok("long", "double")  # lossy, not in lattice
