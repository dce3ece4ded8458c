"""Identity columns (legacy writer v6 / identityColumns feature) on the
native Delta layer (r12 verdict ask #3): generation for absent columns,
the allowExplicitInsert gate, high-water-mark maintenance across
append/overwrite/MERGE, and the foreign-table path (a hand-authored v6
log this engine appends to).

Spec: delta.io PROTOCOL.md "Identity Columns" — delta.identity.start /
step / highWaterMark / allowExplicitInsert field metadata; generated
values must be unique, of form start + n*step, and beyond the mark; the
updated mark rides the commit as a fresh metaData action."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    _identity_cols,
    _replay,
    delete_delta,
    merge_delta,
    read_delta,
    update_delta,
    write_delta,
)


def _ident_schema(start=1, step=1, allow=None, hwm=None):
    md = {"delta.identity.start": start, "delta.identity.step": step}
    if allow is not None:
        md["delta.identity.allowExplicitInsert"] = allow
    if hwm is not None:
        md["delta.identity.highWaterMark"] = hwm
    return StructType(
        [
            StructField("id", LongType(), True, md),
            StructField("name", StringType(), True),
        ]
    )


def _hwm(table, col="id"):
    _, meta, _, _ = _replay(table)
    return _identity_cols(meta["schemaString"])[col]["hwm"]


def _golden_v6(table, start=100, step=10, allow=False, hwm=None):
    """A v6 identity table authored BY HAND from the spec (as a foreign
    engine would create it): empty live set, identity metadata in the
    schemaString, minWriterVersion 6."""
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    md = {
        "delta.identity.start": start,
        "delta.identity.step": step,
        "delta.identity.allowExplicitInsert": allow,
    }
    if hwm is not None:
        md["delta.identity.highWaterMark"] = hwm
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": md},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "CREATE TABLE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
        {
            "metaData": {
                "id": "11111111-1111-1111-1111-111111111111",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def test_generated_append_on_foreign_v6_table(spark, tmp_path):
    t = str(tmp_path / "g")
    _golden_v6(t, start=100, step=10)
    df = spark.createDataFrame(
        [(f"n{i}",) for i in range(25)], "name string"
    ).repartition(4)
    write_delta(df, t, mode="append")
    back = read_delta(spark, t)
    ids = sorted(r["id"] for r in back.collect())
    # gap-free, aligned, starting AT start
    assert ids == [100 + 10 * i for i in range(25)]
    assert _hwm(t) == 100 + 10 * 24
    # second append continues beyond the mark, still gap-free
    write_delta(
        spark.createDataFrame([("x",), ("y",)], "name string"),
        t, mode="append",
    )
    ids2 = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert ids2 == [100 + 10 * i for i in range(27)]
    assert _hwm(t) == 100 + 10 * 26


def test_generated_always_refuses_explicit(spark, tmp_path):
    t = str(tmp_path / "ga")
    _golden_v6(t, allow=False)
    with pytest.raises(DeltaUnsupported, match="GENERATED ALWAYS"):
        write_delta(
            spark.createDataFrame([(7, "a")], _ident_schema()),
            t, mode="append",
        )


def test_explicit_append_syncs_hwm(spark, tmp_path):
    t = str(tmp_path / "ex")
    _golden_v6(t, start=1, step=2, allow=True)
    # explicit values 5 and 10: 10 is not aligned (1 + 2n is odd) — the
    # mark syncs to the smallest aligned value >= 10, which is 11
    write_delta(
        spark.createDataFrame([(5, "a"), (10, "b")], _ident_schema()),
        t, mode="append",
    )
    assert _hwm(t) == 11
    # generation resumes past the synced mark
    write_delta(
        spark.createDataFrame([("c",)], "name string"), t, mode="append"
    )
    rows = {r["name"]: r["id"] for r in read_delta(spark, t).collect()}
    assert rows["c"] == 13


def test_explicit_nulls_refused(spark, tmp_path):
    t = str(tmp_path / "nl")
    _golden_v6(t, allow=True)
    with pytest.raises(ValueError, match="NULL"):
        write_delta(
            spark.createDataFrame(
                [(1, "a"), (None, "b")], _ident_schema()
            ),
            t, mode="append",
        )


def test_creation_with_identity_metadata(spark, tmp_path):
    t = str(tmp_path / "cr")
    # declared column entirely NULL at creation -> generated; protocol
    # lands at legacy writer 6
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (None, "c")],
        _ident_schema(start=5, step=5),
    )
    write_delta(df, t)
    protocol, meta, _, _ = _replay(t)
    assert protocol["minWriterVersion"] == 6
    ids = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert ids == [5, 10, 15]
    assert _hwm(t) == 15
    # the identity declaration SURVIVED generation (metadata on the
    # committed schemaString, not just values)
    assert _identity_cols(meta["schemaString"])["id"]["start"] == 5


def test_negative_step(spark, tmp_path):
    t = str(tmp_path / "neg")
    _golden_v6(t, start=0, step=-3)
    write_delta(
        spark.createDataFrame([("a",), ("b",), ("c",)], "name string"),
        t, mode="append",
    )
    ids = sorted(r["id"] for r in read_delta(spark, t).collect())
    assert ids == [-6, -3, 0]
    assert _hwm(t) == -6


def test_update_refuses_identity_set(spark, tmp_path):
    t = str(tmp_path / "upd")
    _golden_v6(t, allow=True)
    write_delta(
        spark.createDataFrame([(1, "a")], _ident_schema()),
        t, mode="append",
    )
    with pytest.raises(DeltaUnsupported, match="identity"):
        update_delta(spark, t, {"id": "id + 1"}, [("name", "=", "a")])


def test_merge_generates_for_inserts(spark, tmp_path):
    t = str(tmp_path / "mg")
    _golden_v6(t, start=1, step=1)
    write_delta(
        spark.createDataFrame(
            [(f"k{i}",) for i in range(5)], "name string"
        ),
        t, mode="append",
    )
    assert _hwm(t) == 5
    # source: 2 matched (update name via dict), 3 new (insert)
    src = spark.createDataFrame(
        [("k1", "K1"), ("k3", "K3"), ("x1", "X1"), ("x2", "X2"),
         ("x3", "X3")],
        "name string, label string",
    )
    merge_delta(
        spark, t, src, on=["name"],
        when_matched_update={"name": "concat(t.name, '_u')"},
        when_not_matched_insert={"name": "s.label"},
    )
    back = {r["name"]: r["id"] for r in read_delta(spark, t).collect()}
    assert len(back) == 8
    # matched rows KEPT their identity (ids were 1..5 in name order)
    assert back["k1_u"] == 2
    assert back["k3_u"] == 4
    inserted = sorted(back[n] for n in ("X1", "X2", "X3"))
    # inserted ids are unique, aligned, beyond the old mark (gaps from
    # the matched source rows' unconsumed allocations are spec-legal)
    assert len(set(inserted)) == 3
    assert all(i > 5 for i in inserted)
    all_ids = sorted(back.values())
    assert len(set(all_ids)) == 8
    assert _hwm(t) >= max(all_ids)


def test_merge_star_update_with_identity_in_source_refused(
    spark, tmp_path
):
    t = str(tmp_path / "ms")
    _golden_v6(t, allow=True)
    write_delta(
        spark.createDataFrame([(1, "a")], _ident_schema()),
        t, mode="append",
    )
    src = spark.createDataFrame([(9, "a")], _ident_schema())
    with pytest.raises(DeltaUnsupported, match="updating identity"):
        merge_delta(
            spark, t, src, on=["name"],
            when_matched_update="*",
            when_not_matched_insert="*",
        )


def test_merge_star_clauses_generate_when_source_lacks_identity(
    spark, tmp_path
):
    t = str(tmp_path / "m2")
    _golden_v6(t, start=1, step=1)
    write_delta(
        spark.createDataFrame([("a",), ("b",)], "name string"),
        t, mode="append",
    )
    src = spark.createDataFrame([("b",), ("c",)], "name string")
    merge_delta(
        spark, t, src, on=["name"],
        when_matched_update="*",
        when_not_matched_insert="*",
    )
    back = {r["name"]: r["id"] for r in read_delta(spark, t).collect()}
    assert set(back) == {"a", "b", "c"}
    assert len(set(back.values())) == 3
    assert back["c"] > 2  # generated beyond the pre-merge mark
    assert _hwm(t) >= back["c"]


def test_dv_delete_upgrade_enumerates_identity_feature(spark, tmp_path):
    t = str(tmp_path / "dv6")
    _golden_v6(t, start=1, step=1)
    write_delta(
        spark.createDataFrame(
            [(f"r{i}",) for i in range(10)], "name string"
        ),
        t, mode="append",
    )
    delete_delta(spark, t, [("id", "<", 4)], mode="dv")
    protocol, _, _, _ = _replay(t)
    assert protocol["minWriterVersion"] == 7
    assert "identityColumns" in protocol["writerFeatures"]
    assert "deletionVectors" in protocol["writerFeatures"]
    back = read_delta(spark, t)
    assert back.count() == 7
    assert back.agg(F.min("id")).first()[0] == 4
