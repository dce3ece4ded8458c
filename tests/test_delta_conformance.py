"""Delta Transaction Log Protocol conformance (sinks/delta_log.py).

delta-spark and DuckDB's delta extension are not installable in this
environment (re-confirmed r10), so the format layer would otherwise only
ever be read by the code that wrote it.  These tests close that loop from
both directions WITHOUT the module's own code on the other side:

- a GOLDEN ``_delta_log`` directory hand-authored in this file from the
  public protocol spec's action shapes (delta.io PROTOCOL.md) — JSON
  strings written literally, data files built with bare pyarrow — that
  :func:`read_delta` must reconstruct exactly (multi-commit, partitioned,
  escaped partition values, remove, time travel);
- an INDEPENDENT minimal reader, implemented here from the spec (own
  replay loop, pyarrow scan — no delta_log.py imports beyond the writer
  under test), that must agree with what :func:`write_delta` /
  :func:`merge_delta` produce;
- byte-level assertions on the writer's output: 20-digit names, per-action
  required field sets, schemaString as a STRING, partitionValues logical
  values + URL-escaped paths, stats JSON, checkpoint layout,
  ``_last_checkpoint`` fields.

If the writer drifts from the spec while staying self-consistent, these
fail."""

from __future__ import annotations

import json
import os
import re
import urllib.parse

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.sinks.delta_log import (
    merge_delta,
    read_delta,
    write_checkpoint,
    write_delta,
)

# ------------------------------------------------------- golden reader side

# schemaString exactly as the spec prescribes: the JSON form of a Spark
# StructType (PROTOCOL.md "Schema Serialization Format")
_GOLDEN_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
)


def _write_golden(table: str) -> None:
    """A two-commit partitioned table authored by hand: v0 adds two files
    (one in an escaped partition, one in the null partition), v1 removes
    the null-partition file and adds a third.  Data files are bare
    pyarrow parquet with the partition column STRIPPED, as the spec
    requires for hive-layout tables."""
    os.makedirs(os.path.join(table, "_delta_log"))
    # partition value "a b": hive leaves the SPACE unescaped in the
    # directory name; the add.path field is URL-encoded, so it carries
    # %20 and must unquote back to the on-disk name
    d1 = os.path.join(table, "part=a b")
    d2 = os.path.join(table, "part=__HIVE_DEFAULT_PARTITION__")
    d3 = os.path.join(table, "part=plain")
    for d in (d1, d2, d3):
        os.makedirs(d)
    pq.write_table(pa.table({"id": [1, 2]}), os.path.join(d1, "f1.parquet"))
    pq.write_table(pa.table({"id": [3]}), os.path.join(d2, "f2.parquet"))
    pq.write_table(pa.table({"id": [4, 5]}), os.path.join(d3, "f3.parquet"))

    def _add(path, pval, n):
        return json.dumps(
            {
                "add": {
                    "path": path,
                    "partitionValues": {"part": pval},
                    "size": 1,
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                    "stats": json.dumps(
                        {"numRecords": n, "minValues": {}, "maxValues": {},
                         "nullCount": {}}
                    ),
                }
            }
        )

    v0 = "\n".join(
        [
            json.dumps(
                {"commitInfo": {"timestamp": 1700000000000,
                                "operation": "WRITE"}}
            ),
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            ),
            json.dumps(
                {
                    "metaData": {
                        "id": "00000000-0000-0000-0000-000000000000",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _GOLDEN_SCHEMA,
                        "partitionColumns": ["part"],
                        "configuration": {},
                        "createdTime": 1700000000000,
                    }
                }
            ),
            _add("part=a%20b/f1.parquet", "a b", 2),
            _add("part=__HIVE_DEFAULT_PARTITION__/f2.parquet", None, 1),
        ]
    )
    v1 = "\n".join(
        [
            json.dumps(
                {"commitInfo": {"timestamp": 1700000001000,
                                "operation": "WRITE"}}
            ),
            json.dumps(
                {
                    "remove": {
                        "path": "part=__HIVE_DEFAULT_PARTITION__/f2.parquet",
                        "deletionTimestamp": 1700000001000,
                        "dataChange": True,
                    }
                }
            ),
            _add("part=plain/f3.parquet", "plain", 2),
        ]
    )
    with open(os.path.join(table, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(v0 + "\n")
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(v1 + "\n")


def test_reads_hand_authored_golden_log(spark, tmp_path):
    t = str(tmp_path / "golden")
    _write_golden(t)
    now = read_delta(spark, t)
    assert sorted(tuple(r) for r in now.collect()) == [
        (1, "a b"),  # escaped directory decodes to the logical value
        (2, "a b"),
        (4, "plain"),
        (5, "plain"),
    ]
    # time travel to v0 resurrects the null partition
    v0 = read_delta(spark, t, version=0)
    assert sorted(
        (r["id"], r["part"]) for r in v0.collect()
    ) == [(1, "a b"), (2, "a b"), (3, None)]
    # typed schema comes from schemaString, not inference
    assert dict(now.dtypes) == {"id": "bigint", "part": "string"}


def test_reads_hand_authored_checkpoint(spark, tmp_path):
    """A checkpoint parquet authored from the spec's classic-checkpoint
    column layout (top-level protocol/metaData/add struct columns, one
    non-null per row) + _last_checkpoint, with the covered JSON deleted —
    the reader must reconstruct purely from the checkpoint."""
    t = str(tmp_path / "ckgold")
    _write_golden(t)
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field("protocol", pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32())])),
            pa.field("metaData", pa.struct(
                [("id", pa.string()),
                 ("format", pa.struct(
                     [("provider", pa.string()), ("options", str_map)])),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", str_map),
                 ("createdTime", pa.int64())])),
            pa.field("add", pa.struct(
                [("path", pa.string()), ("partitionValues", str_map),
                 ("size", pa.int64()), ("modificationTime", pa.int64()),
                 ("dataChange", pa.bool_()), ("stats", pa.string())])),
        ]
    )
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _GOLDEN_SCHEMA,
            "partitionColumns": ["part"],
            "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "part=a%20b/f1.parquet",
                 "partitionValues": {"part": "a b"}, "size": 1,
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": None}},
        {"add": {"path": "part=plain/f3.parquet",
                 "partitionValues": {"part": "plain"}, "size": 1,
                 "modificationTime": 1700000001000, "dataChange": True,
                 "stats": None}},
    ]
    log = os.path.join(t, "_delta_log")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    os.unlink(os.path.join(log, f"{0:020d}.json"))  # covered by checkpoint
    got = read_delta(spark, t)
    assert sorted((r["id"], r["part"]) for r in got.collect()) == [
        (1, "a b"), (2, "a b"), (4, "plain"), (5, "plain"),
    ]


def test_rejects_reader_features_above_subset(spark, tmp_path):
    """Reader versions/features outside the implemented subset must be a
    loud refusal, never a silent misread: v2 (column mapping era) always;
    v3 when any reader feature beyond deletionVectors is required."""
    from zeta_etl_spark.sinks.delta_log import DeltaUnsupported

    t = str(tmp_path / "v3")
    _write_golden(t)
    with open(
        os.path.join(t, "_delta_log", f"{2:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["collations"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaUnsupported, match="collations"):
        read_delta(spark, t)
    # reader version 2 (legacy column mapping gate) is READABLE since the
    # column-mapping read path landed; a hypothetical future version is not
    t2 = str(tmp_path / "v2")
    _write_golden(t2)
    with open(
        os.path.join(t2, "_delta_log", f"{2:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
            + "\n"
        )
    assert read_delta(spark, t2).count() == 4
    with open(
        os.path.join(t2, "_delta_log", f"{3:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 9, "minWriterVersion": 9}}
            )
            + "\n"
        )
    with pytest.raises(DeltaUnsupported, match="reader version"):
        read_delta(spark, t2)


# ---------------------------------------------- independent reader vs writer

def _independent_snapshot(table: str):
    """A second Delta reader implemented HERE from the spec: replay every
    JSON commit in name order, last metaData wins, add/remove reconcile by
    path; scan live files with bare pyarrow; partition columns come from
    partitionValues (logical values), not from re-parsing directories."""
    log = os.path.join(table, "_delta_log")
    meta, live = None, {}
    for name in sorted(os.listdir(log)):
        if not re.fullmatch(r"\d{20}\.json", name):
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
    fields = json.loads(meta["schemaString"])["fields"]
    names = [f["name"] for f in fields]
    rows = []
    for rel, add in live.items():
        tbl = pq.read_table(
            os.path.join(table, urllib.parse.unquote(rel))
        ).to_pylist()
        for r in tbl:
            full = dict(r)
            for k, v in (add.get("partitionValues") or {}).items():
                full[k] = v
            rows.append(tuple(full[n] for n in names))
    return names, sorted(rows, key=lambda x: str(x))


def test_independent_reader_agrees_with_writer(spark, tmp_path):
    t = str(tmp_path / "x")
    df = spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(30)],
        "k bigint, cat string, v double",
    )
    write_delta(df, t, partition_by=("cat",))
    write_delta(
        spark.createDataFrame([(100, "c9", 1.5)], "k bigint, cat string, v double"),
        t,
        mode="append",
        partition_by=("cat",),
    )
    merge_delta(
        spark,
        t,
        spark.createDataFrame(
            [(100, "c9", 9.9), (200, "c9", 2.0)],
            "k bigint, cat string, v double",
        ),
        on=["k"],
        when_matched_update="*",
        when_not_matched_insert="*",
    )
    names, rows = _independent_snapshot(t)
    ours = sorted(
        (tuple(r[n] for n in names) for r in read_delta(spark, t).collect()),
        key=lambda x: str(x),
    )
    # partition values round-trip as STRINGS through the independent
    # reader (the spec stores them stringly); compare stringified rows
    assert [tuple(str(v) for v in r) for r in ours] == [
        tuple(str(v) for v in r) for r in rows
    ]


# -------------------------------------------------- writer byte-level shape

_ADD_REQUIRED = {"path", "partitionValues", "size", "modificationTime",
                 "dataChange"}
_REMOVE_REQUIRED = {"path", "deletionTimestamp", "dataChange"}
_META_REQUIRED = {"id", "format", "schemaString", "partitionColumns",
                  "configuration"}


def test_writer_action_shapes_and_names(spark, tmp_path):
    t = str(tmp_path / "w")
    df = spark.createDataFrame(
        [(1, "a b/c%d", 1.0), (2, None, 2.0)],
        "k bigint, cat string, v double",
    )
    write_delta(df, t, partition_by=("cat",))
    write_delta(
        spark.createDataFrame([(3, "plain", 3.0)],
                              "k bigint, cat string, v double"),
        t, mode="overwrite", partition_by=("cat",),
    )
    log = os.path.join(t, "_delta_log")
    names = sorted(os.listdir(log))
    assert names == [f"{0:020d}.json", f"{1:020d}.json"]
    assert all(re.fullmatch(r"\d{20}\.json", n) for n in names)

    v0 = [json.loads(l) for l in open(os.path.join(log, names[0]))]
    kinds = [next(iter(a)) for a in v0]
    assert kinds[0] == "commitInfo"
    assert {"protocol", "metaData"} <= set(kinds)
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    assert _META_REQUIRED <= set(meta)
    # schemaString is a JSON STRING (spec), and round-trips
    assert isinstance(meta["schemaString"], str)
    from pyspark.sql.types import StructType

    rt = StructType.fromJson(json.loads(meta["schemaString"]))
    assert [f.name for f in rt] == ["k", "cat", "v"]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["cat"]

    adds = [a["add"] for a in v0 if "add" in a]
    assert adds
    for add in adds:
        assert _ADD_REQUIRED <= set(add)
        assert not add["path"].startswith("/")  # relative
        stats = json.loads(add["stats"])
        assert {"numRecords", "minValues", "maxValues", "nullCount"} <= set(
            stats
        )
    # special characters: logical value in partitionValues; the PATH is
    # double-encoded exactly like delta-spark's — hive escapes '/' and
    # '%' in the directory name (space stays raw on disk), then the URL
    # encoding of add.path escapes those '%' again and the space once
    by_pv = {add["partitionValues"]["cat"]: add["path"] for add in adds}
    assert "a b/c%d" in by_pv
    assert "cat=a%20b%252Fc%2525d/" in by_pv["a b/c%d"]
    # and the encoded path unquotes to the real on-disk file
    assert os.path.exists(
        os.path.join(t, urllib.parse.unquote(by_pv["a b/c%d"]))
    )
    assert None in by_pv
    assert "__HIVE_DEFAULT_PARTITION__" in by_pv[None]

    v1 = [json.loads(l) for l in open(os.path.join(log, names[1]))]
    removes = [a["remove"] for a in v1 if "remove" in a]
    assert len(removes) == len(adds)
    for rm in removes:
        assert _REMOVE_REQUIRED <= set(rm)
        assert rm["dataChange"] is True


def test_writer_checkpoint_shape(spark, tmp_path):
    t = str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k bigint, v double"
    )
    write_delta(df, t, txn=("app", 7))
    write_delta(df, t, mode="append")
    v = write_checkpoint(t)
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{v:020d}.checkpoint.parquet"))
    lc = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert set(lc) >= {"version", "size"} and lc["version"] == v
    ck = pq.read_table(os.path.join(log, f"{v:020d}.checkpoint.parquet"))
    # spec: top-level struct columns, exactly one non-null per row
    assert {"protocol", "metaData", "add", "txn"} <= set(ck.schema.names)
    for row in ck.to_pylist():
        non_null = [k for k, val in row.items() if val is not None]
        assert len(non_null) == 1, row
    # the txn action survives checkpointing (appId reconciliation)
    txns = [r["txn"] for r in ck.to_pylist() if r["txn"] is not None]
    assert txns and txns[0]["appId"] == "app" and txns[0]["version"] == 7


def test_writer_cdc_action_shape(spark, tmp_path):
    t = str(tmp_path / "cdc")
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, v double"
    )
    write_delta(df, t)
    m = merge_delta(
        spark, t,
        spark.createDataFrame([(2, 20.0)], "k bigint, v double"),
        on=["k"], when_matched_update="*",
    )
    log = os.path.join(t, "_delta_log", f"{m['version']:020d}.json")
    cdc = [json.loads(l)["cdc"] for l in open(log) if '"cdc"' in l]
    assert cdc
    for c in cdc:
        assert {"path", "partitionValues", "size", "dataChange"} <= set(c)
        assert c["dataChange"] is False
        assert c["path"].startswith("_change_data/")
        assert os.path.exists(
            os.path.join(t, urllib.parse.unquote(c["path"]))
        )


# ------------------------------------------------- column mapping (read)

_MAPPED_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa111",
                },
            },
            {
                "name": "payload",
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "score",
                            "type": "double",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 3,
                                "delta.columnMapping.physicalName":
                                    "col-ccc333",
                            },
                        }
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbb222",
                },
            },
            {
                "name": "part",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 4,
                    "delta.columnMapping.physicalName": "col-ddd444",
                },
            },
        ],
    }
)


def _write_mapped_golden(table: str) -> None:
    """Hand-authored NAME-mode column-mapped table: data files and
    partition directories carry PHYSICAL names (col-…), the log's
    partitionValues/stats keys are physical, partitionColumns and
    schemaString names are logical — exactly what delta-spark writes
    after ALTER TABLE ... RENAME COLUMN."""
    os.makedirs(os.path.join(table, "_delta_log"))
    for pval, ids, scores in (
        ("x", [1, 2], [0.5, 1.5]),
        ("y", [3], [9.0]),
    ):
        d = os.path.join(table, f"col-ddd444={pval}")
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "col-aaa111": pa.array(ids, pa.int64()),
                    "col-bbb222": pa.array(
                        [{"col-ccc333": s} for s in scores],
                        pa.struct([("col-ccc333", pa.float64())]),
                    ),
                }
            ),
            os.path.join(d, "f.parquet"),
        )
    actions = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps(
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
        ),
        json.dumps(
            {
                "metaData": {
                    "id": "33333333-3333-3333-3333-333333333333",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _MAPPED_SCHEMA,
                    "partitionColumns": ["part"],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": "4",
                    },
                    "createdTime": 1700000000000,
                }
            }
        ),
    ]
    for pval, n, lo, hi in (("x", 2, 1, 2), ("y", 1, 3, 3)):
        actions.append(
            json.dumps(
                {
                    "add": {
                        "path": f"col-ddd444={pval}/f.parquet",
                        "partitionValues": {"col-ddd444": pval},
                        "size": 1,
                        "modificationTime": 1,
                        "dataChange": True,
                        "stats": json.dumps(
                            {
                                "numRecords": n,
                                "minValues": {"col-aaa111": lo},
                                "maxValues": {"col-aaa111": hi},
                                "nullCount": {"col-aaa111": 0},
                            }
                        ),
                    }
                }
            )
        )
    with open(
        os.path.join(table, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(actions) + "\n")


def test_reads_column_mapped_table(spark, tmp_path):
    t = str(tmp_path / "mapped")
    _write_mapped_golden(t)
    got = read_delta(spark, t)
    # logical names at every level, physical names nowhere
    assert got.columns == ["id", "payload", "part"]
    assert got.schema["payload"].dataType.fieldNames() == ["score"]
    rows = sorted(
        (r["id"], r["payload"]["score"], r["part"]) for r in got.collect()
    )
    assert rows == [(1, 0.5, "x"), (2, 1.5, "x"), (3, 9.0, "y")]


def test_column_mapped_predicates_prune_on_physical_stats(spark, tmp_path):
    t = str(tmp_path / "mappedp")
    _write_mapped_golden(t)
    # stats keys are physical (col-aaa111): a LOGICAL predicate must
    # still prune to the one matching file and filter exactly
    got = read_delta(spark, t, predicate=[("id", ">=", 3)])
    assert len(got.inputFiles()) == 1
    assert [r["id"] for r in got.collect()] == [3]
    # partition pruning through the physical partitionValues key
    gp = read_delta(spark, t, predicate=[("part", "=", "x")])
    assert len(gp.inputFiles()) == 1 and gp.count() == 2


def test_column_mapped_append_writes_physical_layout(spark, tmp_path):
    """r12: the column-mapping WRITE path (r11 verdict #3).  An append to
    a foreign name-mode table must land files and partition directories
    under PHYSICAL names with physical stats/partitionValues keys, while
    readers keep seeing logical names."""
    t = str(tmp_path / "mappedw")
    _write_mapped_golden(t)
    add = spark.createDataFrame(
        [(10, (3.5,), "z")],
        "id bigint, payload struct<score:double>, part string",
    )
    v = write_delta(add, t, mode="append", partition_by=["part"])
    assert v == 1
    # physical partition directory, logical nowhere on disk
    assert os.path.isdir(os.path.join(t, "col-ddd444=z"))
    assert not os.path.isdir(os.path.join(t, "part=z"))
    log = os.path.join(t, "_delta_log", f"{v:020d}.json")
    adds = [json.loads(l)["add"] for l in open(log) if '"add"' in l]
    assert adds
    for a in adds:
        assert set(a["partitionValues"]) == {"col-ddd444"}
        stats = json.loads(a["stats"])
        assert "col-aaa111" in stats["minValues"]
        assert "id" not in stats["minValues"]
    # the parquet file itself carries physical column names
    rel = urllib.parse.unquote(adds[0]["path"])
    cols = {f.name for f in pq.read_schema(os.path.join(t, rel))}
    assert cols == {"col-aaa111", "col-bbb222"}
    # and the read path surfaces logical names end-to-end
    got = read_delta(spark, t)
    assert got.columns == ["id", "payload", "part"]
    rows = sorted(
        (r["id"], r["payload"]["score"], r["part"]) for r in got.collect()
    )
    assert rows == [
        (1, 0.5, "x"), (2, 1.5, "x"), (3, 9.0, "y"), (10, 3.5, "z"),
    ]


def test_column_mapped_merge_and_cdf(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import merge_delta, table_changes

    t = str(tmp_path / "mappedm")
    _write_mapped_golden(t)
    src = spark.createDataFrame(
        [(1, (99.0,), "x"), (50, (1.0,), "y")],
        "id bigint, payload struct<score:double>, part string",
    )
    m = merge_delta(
        spark, t, src, on=["id"],
        when_matched_update="*", when_not_matched_insert="*",
    )
    assert m["rows_updated"] == 1 and m["rows_inserted"] == 1
    # file pruning worked through the PHYSICAL stats keys: the y-file
    # (ids 3..3) cannot hold id 1 and id 50 only inserts — but the
    # key-range [1, 50] spans it, so at minimum the x-file is touched
    rows = {
        r["id"]: (r["payload"]["score"], r["part"])
        for r in read_delta(spark, t).collect()
    }
    assert rows[1] == (99.0, "x") and rows[50] == (1.0, "y")
    assert sorted(rows) == [1, 2, 3, 50]
    # CDF reads the merge's cdc files and surfaces LOGICAL names
    ch = table_changes(spark, t, m["version"], m["version"])
    kinds = {(r["id"], r["_change_type"]) for r in ch.collect()}
    assert kinds == {
        (1, "update_preimage"), (1, "update_postimage"), (50, "insert"),
    }
    assert ch.schema["payload"].dataType.fieldNames() == ["score"]


def test_column_mapped_merge_schema_evolution_allocates_ids(
    spark, tmp_path
):
    t = str(tmp_path / "mappede")
    _write_mapped_golden(t)
    add = spark.createDataFrame(
        [(10, (3.5,), "z", "extra")],
        "id bigint, payload struct<score:double>, part string, note string",
    )
    v = write_delta(
        add, t, mode="append", partition_by=["part"], merge_schema=True
    )
    _, meta, _, _ = _replay_meta(t)
    fields = json.loads(meta["schemaString"])["fields"]
    note = next(f for f in fields if f["name"] == "note")
    md = note["metadata"]
    assert md["delta.columnMapping.id"] == 5  # past maxColumnId=4
    assert md["delta.columnMapping.physicalName"].startswith("col-")
    cfg = meta["configuration"]
    assert cfg["delta.columnMapping.maxColumnId"] == "5"
    got = read_delta(spark, t)
    by_id = {r["id"]: r["note"] for r in got.collect()}
    assert by_id[10] == "extra"
    assert by_id[1] is None  # pre-evolution files surface NULL
    assert v == 1


def _replay_meta(t):
    from zeta_etl_spark.sinks.delta_log import _replay

    return _replay(t)


def test_column_mapped_optimize_compacts_physical(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import optimize

    t = str(tmp_path / "mappedo")
    _write_mapped_golden(t)
    before = sorted(
        (r["id"], r["payload"]["score"], r["part"])
        for r in read_delta(spark, t).collect()
    )
    v = optimize(spark, t)
    assert v == 1
    after = sorted(
        (r["id"], r["payload"]["score"], r["part"])
        for r in read_delta(spark, t).collect()
    )
    assert after == before
    # rewritten files still carry PHYSICAL names
    log = os.path.join(t, "_delta_log", f"{v:020d}.json")
    adds = [json.loads(l)["add"] for l in open(log) if '"add"' in l]
    assert adds and all(
        set(a["partitionValues"]) == {"col-ddd444"} for a in adds
    )


def test_create_column_mapped_table_round_trips(spark, tmp_path):
    """Creating a mapped table from scratch: annotated schemaString,
    maxColumnId config, reader 2 / writer 5 protocol, physical files."""
    from zeta_etl_spark.sinks.delta_log import merge_delta

    for mode in ("name", "id"):
        t = str(tmp_path / f"fresh_{mode}")
        df = spark.createDataFrame(
            [(1, "a", 0.5), (2, "b", 1.5)],
            "k bigint, cat string, v double",
        )
        write_delta(
            df, t, partition_by=["cat"], column_mapping=mode
        )
        with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
            actions = [json.loads(l) for l in fh if l.strip()]
        proto = next(a["protocol"] for a in actions if "protocol" in a)
        assert proto == {"minReaderVersion": 2, "minWriterVersion": 5}
        meta = next(a["metaData"] for a in actions if "metaData" in a)
        cfg = meta["configuration"]
        assert cfg["delta.columnMapping.mode"] == mode
        assert cfg["delta.columnMapping.maxColumnId"] == "3"
        fields = json.loads(meta["schemaString"])["fields"]
        assert [f["metadata"]["delta.columnMapping.id"] for f in fields] \
            == [1, 2, 3]
        phys = {
            f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
            for f in fields
        }
        assert all(p.startswith("col-") for p in phys.values())
        # the independent reader contract: logical names come back
        got = read_delta(spark, t)
        assert sorted(got.columns) == ["cat", "k", "v"]
        assert sorted((r["k"], r["cat"], r["v"]) for r in got.collect()) \
            == [(1, "a", 0.5), (2, "b", 1.5)]
        # and a merge keeps working on the fresh mapped table
        merge_delta(
            spark, t,
            spark.createDataFrame([(2, "b", 9.9)],
                                  "k bigint, cat string, v double"),
            on=["k"], when_matched_update="*",
        )
        assert {
            (r["k"], r["v"]) for r in read_delta(spark, t).collect()
        } == {(1, 0.5), (2, 9.9)}
        if mode == "id":
            # id-mode files must carry parquet field ids (the spec's
            # required resolution for id-mode tables)
            _, _, live, _ = _replay_meta(t)
            rel = sorted(live)[0]
            sch = str(
                pq.ParquetFile(
                    os.path.join(t, urllib.parse.unquote(rel))
                ).schema
            )
            assert "field_id=1" in sch and "field_id=3" in sch, sch


def test_flat_layout_partition_values_come_from_log(spark, tmp_path):
    """r11 review: delta-spark under column mapping writes FLAT files (no
    hive dirs) — partition values must come from add.partitionValues per
    PROTOCOL.md, not from the path (which would silently NULL them)."""
    t = str(tmp_path / "flat")
    os.makedirs(os.path.join(t, "_delta_log"))
    # flat random-prefixed files, partition col NOT in the file
    pq.write_table(
        pa.table({"col-aaa111": pa.array([1, 2], pa.int64()),
                  "col-bbb222": pa.array(
                      [{"col-ccc333": 0.5}, {"col-ccc333": 1.5}],
                      pa.struct([("col-ccc333", pa.float64())]))}),
        os.path.join(t, "Xq-f1.parquet"),
    )
    pq.write_table(
        pa.table({"col-aaa111": pa.array([3], pa.int64()),
                  "col-bbb222": pa.array(
                      [{"col-ccc333": 9.0}],
                      pa.struct([("col-ccc333", pa.float64())]))}),
        os.path.join(t, "Zr-f2.parquet"),
    )
    actions = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps(
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
        ),
        json.dumps(
            {
                "metaData": {
                    "id": "44444444-4444-4444-4444-444444444444",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _MAPPED_SCHEMA,
                    "partitionColumns": ["part"],
                    "configuration": {"delta.columnMapping.mode": "name"},
                    "createdTime": 1,
                }
            }
        ),
        json.dumps(
            {
                "add": {
                    "path": "Xq-f1.parquet",
                    "partitionValues": {"col-ddd444": "x"},
                    "size": 1, "modificationTime": 1, "dataChange": True,
                }
            }
        ),
        json.dumps(
            {
                "add": {
                    "path": "Zr-f2.parquet",
                    "partitionValues": {"col-ddd444": None},
                    "size": 1, "modificationTime": 1, "dataChange": True,
                }
            }
        ),
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(actions) + "\n")
    got = read_delta(spark, t)
    rows = sorted(
        (r["id"], r["payload"]["score"], r["part"]) for r in got.collect()
    )
    assert rows == [(1, 0.5, "x"), (2, 1.5, "x"), (3, 9.0, None)]
    # logical predicate on the partition column still filters exactly
    assert read_delta(
        spark, t, predicate=[("part", "=", "x")]
    ).count() == 2


def test_id_mode_matches_by_field_id(spark, tmp_path):
    """r11 review: id-mode tables resolve parquet columns BY FIELD ID —
    an old file whose column NAME predates the current physicalName must
    still read correctly (by-name matching would silently NULL it)."""
    t = str(tmp_path / "idmode")
    os.makedirs(os.path.join(t, "_delta_log"))
    # the file's column is named 'old_name' but carries field id 1,
    # which the schemaString maps to physicalName col-aaa111
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array([7, 8], pa.int64())],
            schema=pa.schema(
                [
                    pa.field(
                        "old_name",
                        pa.int64(),
                        metadata={b"PARQUET:field_id": b"1"},
                    )
                ]
            ),
        ),
        os.path.join(t, "f.parquet"),
    )
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-aaa111",
                    },
                }
            ],
        }
    )
    actions = [
        json.dumps({"commitInfo": {"timestamp": 1, "operation": "WRITE"}}),
        json.dumps(
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
        ),
        json.dumps(
            {
                "metaData": {
                    "id": "55555555-5555-5555-5555-555555555555",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "id"},
                    "createdTime": 1,
                }
            }
        ),
        json.dumps(
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1, "modificationTime": 1, "dataChange": True,
                }
            }
        ),
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(actions) + "\n")
    got = read_delta(spark, t)
    assert sorted(r["id"] for r in got.collect()) == [7, 8]


def test_checkpoint_preserves_table_features(spark, tmp_path):
    """r11 review: a table-features protocol checkpointed and log-cleaned
    must keep readerFeatures/writerFeatures — reader version 3 REQUIRES
    them, and dropping them loses the declarations forever."""
    from zeta_etl_spark.sinks.delta_log import _replay, cleanup_log

    t = str(tmp_path / "feat")
    _write_golden(t)
    # upgrade the protocol to table features (columnMapping declared but
    # mode stays none, so reads/writes keep working)
    with open(os.path.join(t, "_delta_log", f"{2:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["columnMapping"],
                        "writerFeatures": ["columnMapping"],
                    }
                }
            )
            + "\n"
        )
    v = write_checkpoint(t)
    cleanup_log(t)
    protocol, _meta, _live, _ = _replay(t)
    assert protocol["minReaderVersion"] == 3
    assert protocol["readerFeatures"] == ["columnMapping"]
    assert protocol["writerFeatures"] == ["columnMapping"]
    assert read_delta(spark, t, version=v).count() == 4


def test_reads_hand_authored_v2_checkpoint(spark, tmp_path):
    """V2 checkpoint (UUID-named top file + sidecar parquet under
    _delta_log/_sidecars/) authored from the spec: protocol/metaData and
    a checkpointMetadata row live in the top file, add actions live in
    TWO sidecars, an expired remove tombstone rides along and must NOT
    resurrect or delete anything.  The covered JSON is deleted, so the
    read must reconstruct purely through the v2 path."""
    t = str(tmp_path / "v2ck")
    _write_golden(t)
    log = os.path.join(t, "_delta_log")
    side_dir = os.path.join(log, "_sidecars")
    os.makedirs(side_dir)

    str_map = pa.map_(pa.string(), pa.string())
    add_struct = pa.struct(
        [("path", pa.string()), ("partitionValues", str_map),
         ("size", pa.int64()), ("modificationTime", pa.int64()),
         ("dataChange", pa.bool_()), ("stats", pa.string())]
    )
    remove_struct = pa.struct(
        [("path", pa.string()), ("deletionTimestamp", pa.int64()),
         ("dataChange", pa.bool_())]
    )
    side_schema = pa.schema(
        [pa.field("add", add_struct), pa.field("remove", remove_struct)]
    )

    def _sidecar(name, rows):
        pq.write_table(
            pa.Table.from_pylist(rows, schema=side_schema),
            os.path.join(side_dir, name),
        )

    _sidecar(
        "s1.parquet",
        [
            {"add": {"path": "part=a%20b/f1.parquet",
                     "partitionValues": {"part": "a b"}, "size": 1,
                     "modificationTime": 1, "dataChange": True,
                     "stats": None}},
            # expired tombstone: bookkeeping only, not part of the live set
            {"remove": {"path": "part=__HIVE_DEFAULT_PARTITION__/f2.parquet",
                        "deletionTimestamp": 1, "dataChange": True}},
        ],
    )
    _sidecar(
        "s2.parquet",
        [
            {"add": {"path": "part=plain/f3.parquet",
                     "partitionValues": {"part": "plain"}, "size": 1,
                     "modificationTime": 1, "dataChange": True,
                     "stats": None}},
        ],
    )

    top_schema = pa.schema(
        [
            pa.field("checkpointMetadata", pa.struct(
                [("version", pa.int64()), ("tags", str_map)])),
            pa.field("protocol", pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32()),
                 ("readerFeatures", pa.list_(pa.string())),
                 ("writerFeatures", pa.list_(pa.string()))])),
            pa.field("metaData", pa.struct(
                [("id", pa.string()),
                 ("format", pa.struct(
                     [("provider", pa.string()), ("options", str_map)])),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", str_map),
                 ("createdTime", pa.int64())])),
            pa.field("sidecar", pa.struct(
                [("path", pa.string()), ("sizeInBytes", pa.int64()),
                 ("modificationTime", pa.int64())])),
        ]
    )
    top_rows = [
        {"checkpointMetadata": {"version": 1, "tags": {}}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _GOLDEN_SCHEMA,
            "partitionColumns": ["part"],
            "configuration": {},
            "createdTime": 1,
        }},
        {"sidecar": {"path": "s1.parquet", "sizeInBytes": 1,
                     "modificationTime": 1}},
        {"sidecar": {"path": "s2.parquet", "sizeInBytes": 1,
                     "modificationTime": 1}},
    ]
    pq.write_table(
        pa.Table.from_pylist(top_rows, schema=top_schema),
        os.path.join(
            log,
            f"{1:020d}.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11"
            ".parquet",
        ),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(top_rows)}, fh)
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    got = read_delta(spark, t)
    assert sorted((r["id"], r["part"]) for r in got.collect()) == [
        (1, "a b"), (2, "a b"), (4, "plain"), (5, "plain"),
    ]
    # a missing sidecar is a loud error, never a partial snapshot
    os.unlink(os.path.join(side_dir, "s2.parquet"))
    from zeta_etl_spark.sinks.delta_log import DeltaUnsupported

    with pytest.raises(DeltaUnsupported, match="sidecar"):
        read_delta(spark, t)


# ------------- independent reader vs the r12 write shapes (mapped + DV)


def _independent_snapshot_mapped_dv(table: str):
    """The independent replay extended for the r12 write surface: column
    mapping (physical->logical via the schemaString's physicalName
    metadata) and deletion vectors (positions dropped by parquet row
    order).  Replay reconciles PER COMMIT (a remove of a path re-added
    in the same commit targets the old incarnation).  The replay /
    mapping / row-filter logic is implemented here from the spec; only
    the roaring bitmap codec is borrowed from the module
    (read_dv_rows) — that codec is itself cross-checked against
    test_delta_dv's independent serializer."""
    from zeta_etl_spark.sinks.delta_dv import read_dv_rows

    log = os.path.join(table, "_delta_log")
    meta, live = None, {}
    for name in sorted(os.listdir(log)):
        if not re.fullmatch(r"\d{20}\.json", name):
            continue
        adds_c, removes_c = {}, []
        for line in open(os.path.join(log, name)):
            if not line.strip():
                continue
            a = json.loads(line)
            if "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                adds_c[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                removes_c.append(a["remove"]["path"])
        for p in removes_c:
            if p not in adds_c:
                live.pop(p, None)
        live.update(adds_c)
    fields = json.loads(meta["schemaString"])["fields"]
    names = [f["name"] for f in fields]
    p2l = {
        (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        ): f["name"]
        for f in fields
    }
    rows = []
    for rel, add in live.items():
        tbl = pq.read_table(
            os.path.join(table, urllib.parse.unquote(rel))
        ).to_pylist()
        dv = add.get("deletionVector")
        deleted = set(read_dv_rows(dv, table)) if dv else set()
        for idx, r in enumerate(tbl):
            if idx in deleted:
                continue
            full = {p2l.get(k, k): v for k, v in r.items()}
            for k, v in (add.get("partitionValues") or {}).items():
                full[p2l.get(k, k)] = v
            rows.append(tuple(full[n] for n in names))
    return names, sorted(rows, key=lambda x: str(x))


def test_independent_reader_agrees_on_mapped_dv_writes(spark, tmp_path):
    """Round-trip the FULL r12 write surface (mapped creation, MERGE,
    UPDATE, dv-mode DELETE) through an independent spec-derived reader:
    the physical names, stats keys, descriptors and row indexes this
    engine writes must reconstruct the same logical rows without any of
    the engine's own read machinery."""
    from zeta_etl_spark.sinks.delta_log import delete_delta, update_delta

    t = str(tmp_path / "r12x")
    df = spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(30)],
        "k bigint, cat string, v double",
    )
    write_delta(df, t, partition_by=("cat",), column_mapping="name")
    merge_delta(
        spark, t,
        spark.createDataFrame(
            [(7, "c1", 700.0), (100, "c9", 1.0)],
            "k bigint, cat string, v double",
        ),
        on=["k"], when_matched_update="*", when_not_matched_insert="*",
    )
    update_delta(spark, t, {"v": "v + 0.5"}, [("k", ">=", 28)])
    d = delete_delta(spark, t, [("k", "=", 3)], mode="dv")
    assert d["mode"] == "dv" and d["rows_deleted"] == 1
    names, rows = _independent_snapshot_mapped_dv(t)
    ours = sorted(
        (
            tuple(r[n] for n in names)
            for r in read_delta(spark, t).collect()
        ),
        key=lambda x: str(x),
    )
    assert len(ours) == 30  # 30 - 1 deleted + 1 inserted
    assert [tuple(str(v) for v in r) for r in ours] == [
        tuple(str(v) for v in r) for r in rows
    ]
