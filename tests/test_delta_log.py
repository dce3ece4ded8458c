"""Delta Lake on-disk format (sinks/delta_log.py): spec-shape of the
transaction log, round-trips, append/overwrite, time travel, partitioned
layout with pruning, OCC retry, and the generation-store export bridge."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from zeta_etl_spark.sinks.delta_log import (
    DeltaUnsupported,
    delta_history,
    export_table_to_delta,
    latest_version,
    read_delta,
    write_delta,
)

SCHEMA = "k bigint, cat string, v double, ok boolean"
ROWS1 = [(1, "a", 1.5, True), (2, "b", 2.5, False), (3, "a", None, None)]
ROWS2 = [(4, "c", 4.0, True)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    v = write_delta(_df(spark, ROWS1), t, mode="overwrite")
    assert v == 0
    back = read_delta(spark, t)
    assert back.schema == _df(spark, ROWS1).schema
    assert _rows(back) == _rows(_df(spark, ROWS1))


def test_log_matches_public_protocol_shape(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(line) for line in open(log)]
    protocol = next(a["protocol"] for a in actions if "protocol" in a)
    assert protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    # schemaString is the Spark StructType JSON the spec prescribes
    assert StructType.fromJson(json.loads(meta["schemaString"])) == _df(
        spark, ROWS1
    ).schema
    assert meta["format"] == {"provider": "parquet", "options": {}}
    adds = [a["add"] for a in actions if "add" in a]
    assert adds, "commit 0 must add data files"
    for add in adds:
        assert not add["path"].startswith("/")  # relative, per spec
        assert add["dataChange"] is True
        assert add["size"] > 0
        assert "numRecords" in json.loads(add["stats"])
    assert sum(
        json.loads(a["stats"])["numRecords"] for a in adds
    ) == len(ROWS1)


def test_append_accumulates_and_time_travel_reads_history(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    v1 = write_delta(_df(spark, ROWS2), t, mode="append")
    assert v1 == 1 and latest_version(t) == 1
    assert _rows(read_delta(spark, t)) == _rows(_df(spark, ROWS1 + ROWS2))
    assert _rows(read_delta(spark, t, version=0)) == _rows(_df(spark, ROWS1))


def test_overwrite_replaces_live_set_and_history_survives(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    write_delta(_df(spark, ROWS2), t, mode="overwrite")
    assert _rows(read_delta(spark, t)) == _rows(_df(spark, ROWS2))
    assert _rows(read_delta(spark, t, version=0)) == _rows(_df(spark, ROWS1))
    hist = delta_history(t)
    assert [h["version"] for h in hist] == [1, 0]
    assert hist[0]["operationParameters"]["mode"] == "OVERWRITE"


def test_append_schema_mismatch_rejected(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    other = spark.createDataFrame([(1, "x")], "k bigint, extra string")
    with pytest.raises(DeltaUnsupported, match="schema"):
        write_delta(other, t, mode="append")


def test_partitioned_layout_types_and_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t, partition_by=("cat",))
    # hive layout on disk, partition column stripped from data files
    assert os.path.isdir(os.path.join(t, "cat=a"))
    back = read_delta(spark, t)
    assert back.schema == _df(spark, ROWS1).schema  # cat is string again
    assert _rows(back) == _rows(_df(spark, ROWS1))
    # partition pruning reaches the scan
    plan = (
        back.filter(F.col("cat") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    # partitioning is table identity: a mismatched write is refused
    with pytest.raises(DeltaUnsupported, match="partitioning"):
        write_delta(_df(spark, ROWS2), t, mode="append")


def test_occ_lost_race_retries_to_next_version(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    # another writer takes version 1 between our read and our commit
    squatter = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(squatter, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    v = write_delta(_df(spark, ROWS2), t, mode="append")
    assert v == 2
    assert _rows(read_delta(spark, t)) == _rows(_df(spark, ROWS1 + ROWS2))


def test_time_travel_by_timestamp(spark, tmp_path):
    import time as _time

    from zeta_etl_spark.sinks.delta_log import version_at_timestamp

    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    t0_ms = int(_time.time() * 1000)
    _time.sleep(1.1)  # commitInfo timestamps are millis; separate them
    write_delta(_df(spark, ROWS2), t, mode="overwrite")
    assert version_at_timestamp(t, t0_ms) == 0
    assert _rows(read_delta(spark, t, timestamp_ms=t0_ms)) == _rows(
        _df(spark, ROWS1)
    )
    now = int(_time.time() * 1000)
    assert version_at_timestamp(t, now) == 1
    with pytest.raises(ValueError, match="no commit"):
        version_at_timestamp(t, 1)  # epoch 1970: before the table existed
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, t, version=0, timestamp_ms=now)


def test_txn_action_recorded_and_reconciled(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import last_txn_version

    t = str(tmp_path / "t")
    assert last_txn_version(t, "app1") is None  # not a table yet
    write_delta(_df(spark, ROWS1), t, txn=("app1", 0))
    write_delta(_df(spark, ROWS2), t, mode="append", txn=("app1", 1))
    assert last_txn_version(t, "app1") == 1  # latest per appId wins
    assert last_txn_version(t, "other") is None


def test_streaming_append_is_exactly_once_across_replay(spark, tmp_path):
    import shutil

    from zeta_etl_spark.sinks.delta_log import foreach_batch_delta_append
    from zeta_etl_spark.sources.json_source import read_json

    src = str(tmp_path / "src")
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as fh:
        for k in range(5):
            fh.write(json.dumps({"k": k, "v": float(k)}) + "\n")

    def _drain():
        foreach_batch_delta_append(
            read_json(spark, src, "k bigint, v double", streaming=True),
            t,
            ckpt,
            app_id="stream1",
        )

    _drain()
    assert read_delta(spark, t).count() == 5
    # crash-replay: the stream checkpoint is lost, the SAME batch is
    # re-delivered as batch 0 — the table's own txn log detects it
    shutil.rmtree(ckpt)
    _drain()
    assert read_delta(spark, t).count() == 5  # not 10


def test_export_bridge_from_generation_store(spark, tmp_path):
    from zeta_etl_spark.plans.graph import Pipeline

    p = Pipeline("exp", str(tmp_path / "gen"))

    @p.table(name="gold")
    def gold(pl):
        return _df(spark, ROWS1)

    p.run(spark)
    v = export_table_to_delta(spark, p, "gold", str(tmp_path / "delta"))
    assert v == 0
    assert _rows(read_delta(spark, str(tmp_path / "delta"))) == _rows(
        _df(spark, ROWS1)
    )


def test_vacuum_deletes_only_aged_unreferenced_files(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import vacuum

    t = str(tmp_path / "t")
    write_delta(_df(spark, ROWS1), t)
    write_delta(_df(spark, ROWS2), t, mode="overwrite")  # ROWS1 files dead
    # inside retention: nothing deleted (in-flight reader/writer guard)
    assert vacuum(t, retention_ms=3_600_000) == []
    dry = vacuum(t, retention_ms=0, dry_run=True)
    assert dry and all(p.endswith(".parquet") for p in dry)
    gone = vacuum(t, retention_ms=0)
    assert gone == dry
    # table still reads correctly; time travel to v0 is now impossible
    assert _rows(read_delta(spark, t)) == _rows(_df(spark, ROWS2))
    with pytest.raises(Exception):
        read_delta(spark, t, version=0).collect()


def test_convert_parquet_to_delta_claims_files_in_place(spark, tmp_path):
    from zeta_etl_spark.sinks.delta_log import (
        convert_parquet_to_delta,
        vacuum,
    )

    # plain hive-partitioned parquet written by anyone
    p = str(tmp_path / "plain")
    _df(spark, ROWS1).write.partitionBy("cat").parquet(p)
    before = {
        os.path.join(r, f)
        for r, _, fs in os.walk(p)
        for f in fs
        if f.endswith(".parquet")
    }
    assert convert_parquet_to_delta(spark, p, partition_by=("cat",)) == 0
    after = {
        os.path.join(r, f)
        for r, _, fs in os.walk(p)
        for f in fs
        if f.endswith(".parquet")
    }
    assert before == after  # zero data movement
    back = read_delta(spark, p)
    assert _rows(back.select(*_df(spark, ROWS1).columns)) == _rows(
        _df(spark, ROWS1)
    )
    assert vacuum(p, retention_ms=0) == []  # every file is referenced
    # appends keep working on the converted table
    write_delta(_df(spark, ROWS2), p, mode="append", partition_by=("cat",))
    assert read_delta(spark, p).count() == len(ROWS1) + len(ROWS2)
    with pytest.raises(Exception, match="already a Delta table"):
        convert_parquet_to_delta(spark, p, partition_by=("cat",))
