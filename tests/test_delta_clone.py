"""Absolute-path add actions + SHALLOW CLONE (PROTOCOL.md: an action's
``path`` is a relative path within the table OR an absolute path/URI —
foreign shallow clones commit absolute ``file:`` URIs).  ``clone_delta``
commits a zero-copy clone whose adds point at the source's files;
'u'-storage deletion vectors re-anchor as 'p' (absolute) descriptors."""

from __future__ import annotations

import json
import os

import pytest

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    _replay,
    clone_delta,
    delete_delta,
    enable_row_tracking,
    optimize,
    read_delta,
    read_delta_row_ids,
    vacuum,
    write_delta,
)


def test_foreign_absolute_uri_adds_read(spark, tmp_path):
    src = str(tmp_path / "src")
    write_delta(
        spark.range(7).selectExpr("id AS k").coalesce(1),
        src, mode="append",
    )
    _, _, live, _ = _replay(src)
    data_file = os.path.join(src, next(iter(live)))
    t = str(tmp_path / "foreign")
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = spark.range(1).selectExpr("id AS k").schema.json()
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "abs", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1700000000000,
        }},
        {"add": {"path": "file://" + data_file, "partitionValues": {},
                 "size": os.path.getsize(data_file),
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({"numRecords": 7})}},
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    assert sorted(
        r["k"] for r in read_delta(spark, t).collect()
    ) == list(range(7))
    # data skipping still works through the same add stats
    assert read_delta(spark, t, predicate=[("k", ">=", 5)]).count() == 2


def test_non_file_scheme_refuses(spark, tmp_path):
    t = str(tmp_path / "s3t")
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = spark.range(1).selectExpr("id AS k").schema.json()
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "s3", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1700000000000,
        }},
        {"add": {"path": "s3://bucket/x.parquet", "partitionValues": {},
                 "size": 10, "modificationTime": 1, "dataChange": True,
                 "stats": json.dumps({"numRecords": 1})}},
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(DeltaUnsupported, match="non-file scheme"):
        read_delta(spark, t).collect()


def test_clone_reads_equal_and_evolves_independently(spark, tmp_path):
    src = str(tmp_path / "src")
    write_delta(
        spark.range(20).selectExpr(
            "id AS k", "CAST(id % 3 AS string) AS g"
        ),
        src, mode="append", partition_by=["g"],
    )
    dst = str(tmp_path / "dst")
    clone_delta(src, dst)
    assert sorted(r["k"] for r in read_delta(spark, dst).collect()) \
        == list(range(20))
    # partition pruning through log-sourced partition values
    assert read_delta(spark, dst, predicate=[("g", "=", "1")]).count() == 7
    # clone evolves independently: append lands under the CLONE root
    write_delta(
        spark.range(100, 101).selectExpr("id AS k", "'9' AS g"),
        dst, mode="append", partition_by=["g"],
    )
    assert read_delta(spark, dst).count() == 21
    assert read_delta(spark, src).count() == 20
    # source deletes do not touch the clone's snapshot
    delete_delta(spark, src, [("k", "<", 5)], mode="rewrite",
                 write_cdf=False)
    assert read_delta(spark, src).count() == 15
    assert read_delta(spark, dst).count() == 21


def test_clone_time_travel_version(spark, tmp_path):
    src = str(tmp_path / "srcv")
    write_delta(spark.range(5).selectExpr("id AS k"), src, mode="append")
    write_delta(
        spark.range(5, 9).selectExpr("id AS k"), src, mode="append"
    )
    dst = str(tmp_path / "dstv")
    clone_delta(src, dst, version=0)
    assert read_delta(spark, dst).count() == 5


def test_clone_reanchors_deletion_vectors(spark, tmp_path):
    src = str(tmp_path / "srcdv")
    write_delta(
        spark.range(30).selectExpr("id AS k").coalesce(1),
        src, mode="append",
    )
    delete_delta(spark, src, [("k", "<", 10)], mode="dv")
    dst = str(tmp_path / "dstdv")
    clone_delta(src, dst)
    _, _, live, _ = _replay(dst)
    desc = next(iter(live.values()))["deletionVector"]
    assert desc["storageType"] == "p"
    assert os.path.isabs(desc["pathOrInlineDv"])
    assert sorted(r["k"] for r in read_delta(spark, dst).collect()) \
        == list(range(10, 30))


def test_clone_preserves_row_tracking_domain(spark, tmp_path):
    src = str(tmp_path / "srcrt")
    write_delta(
        spark.range(8).selectExpr("id AS k").coalesce(1),
        src, mode="append",
    )
    enable_row_tracking(src)
    src_ids = {
        r["k"]: r["row_id"]
        for r in read_delta_row_ids(spark, src).collect()
    }
    dst = str(tmp_path / "dstrt")
    clone_delta(src, dst)
    # cloned rows keep their ids; post-clone appends allocate past the
    # copied high-water mark, never colliding
    assert {
        r["k"]: r["row_id"]
        for r in read_delta_row_ids(spark, dst).collect()
    } == src_ids
    write_delta(
        spark.range(8, 10).selectExpr("id AS k"), dst, mode="append"
    )
    ids = sorted(
        r["row_id"] for r in read_delta_row_ids(spark, dst).collect()
    )
    assert ids == list(range(10))


def test_clone_vacuum_never_touches_source_bytes(spark, tmp_path):
    src = str(tmp_path / "srcvac")
    write_delta(
        spark.range(10).selectExpr("id AS k").coalesce(1),
        src, mode="append",
    )
    dst = str(tmp_path / "dstvac")
    clone_delta(src, dst)
    # clone rewrites (OPTIMIZE) then vacuums: the now-unreferenced
    # SOURCE file must survive (it lives outside the clone's root)
    optimize(spark, dst, target_file_rows=1000)
    victims = vacuum(dst, retention_ms=0)
    assert read_delta(spark, src).count() == 10  # source intact
    assert read_delta(spark, dst).count() == 10
    assert all(not v.startswith("/") and ".." not in v for v in victims)
