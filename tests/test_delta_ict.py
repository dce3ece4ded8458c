"""In-Commit Timestamps (PROTOCOL.md, writer feature
``inCommitTimestamp``): enablement provenance, the commitInfo-first +
monotonic-stamp writer obligation on every commit path, inheritance on
foreign tables, and timestamp time travel resolving against the stamps
instead of file mtimes."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from zeta_etl_spark.sinks.delta_log import (
    _replay,
    delete_delta,
    enable_in_commit_timestamps,
    merge_delta,
    read_delta,
    version_at_timestamp,
    write_delta,
)


def _commits(table):
    log = os.path.join(table, "_delta_log")
    out = {}
    for f in sorted(os.listdir(log)):
        if f.endswith(".json") and f[0].isdigit():
            lines = [
                json.loads(ln)
                for ln in open(os.path.join(log, f))
                if ln.strip()
            ]
            out[int(f.split(".")[0])] = lines
    return out


def test_enablement_and_every_commit_stamps(spark, tmp_path):
    t = str(tmp_path / "ict")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k bigint, v double"
        ),
        t,
    )
    v_on = enable_in_commit_timestamps(t)
    assert v_on == 1
    assert enable_in_commit_timestamps(t) == 1  # idempotent
    protocol, meta, _, _ = _replay(t)
    assert protocol["minWriterVersion"] == 7
    assert "inCommitTimestamp" in protocol["writerFeatures"]
    # writer-only feature: reader version untouched
    assert protocol["minReaderVersion"] == 1
    assert "readerFeatures" not in protocol
    cfg = meta["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v_on)
    # every later commit path stamps, commitInfo FIRST, monotonic
    write_delta(
        spark.createDataFrame([(100, 1.0)], "k bigint, v double"),
        t, mode="append",
    )
    merge_delta(
        spark, t,
        spark.createDataFrame([(100, 9.0), (200, 2.0)],
                              "k bigint, v double"),
        on=["k"], when_matched_update="*",
        when_not_matched_insert="*",
    )
    delete_delta(spark, t, [("k", "<", 3)], mode="rewrite")
    commits = _commits(t)
    icts = []
    for v, lines in commits.items():
        if v < v_on + 1:
            continue
        assert "commitInfo" in lines[0], f"commitInfo not first @ {v}"
        ict = lines[0]["commitInfo"]["inCommitTimestamp"]
        assert isinstance(ict, int)
        icts.append(ict)
    assert len(icts) == 3
    assert icts == sorted(icts)
    assert len(set(icts)) == len(icts)  # strictly increasing
    # enablement stamp equals the provenance config
    en_ci = commits[v_on][0]["commitInfo"]
    assert str(en_ci["inCommitTimestamp"]) == cfg[
        "delta.inCommitTimestampEnablementTimestamp"
    ]
    assert read_delta(spark, t).count() == 9


def test_timestamp_time_travel_uses_ict_not_mtime(spark, tmp_path):
    t = str(tmp_path / "tt")
    write_delta(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"), t
    )
    enable_in_commit_timestamps(t)
    write_delta(
        spark.createDataFrame([(2, 2.0)], "k bigint, v double"),
        t, mode="append",
    )
    commits = _commits(t)
    ict2 = commits[2][0]["commitInfo"]["inCommitTimestamp"]
    # corrupt the mtimes (a log copy / clock-skew scenario): resolution
    # must still follow the stamps
    log = os.path.join(t, "_delta_log")
    bogus = time.time() + 10_000
    for f in os.listdir(log):
        if f.endswith(".json"):
            os.utime(os.path.join(log, f), (bogus, bogus))
    assert version_at_timestamp(t, ict2) == 2
    assert version_at_timestamp(t, ict2 - 1) in (0, 1)
    assert read_delta(spark, t, version=2).count() == 2


def test_foreign_ict_table_inherits_stamping(spark, tmp_path):
    """A hand-authored table whose previous commit carries a stamp (the
    feature enabled by a foreign engine): our append must keep
    stamping monotonically even though no metaData rides our commit."""
    t = str(tmp_path / "foreign")
    log = os.path.join(t, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
        ],
    })
    future_ict = int(time.time() * 1000) + 60_000  # skewed clock
    actions = [
        {"commitInfo": {"timestamp": future_ict,
                        "inCommitTimestamp": future_ict,
                        "operation": "CREATE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["inCommitTimestamp"]}},
        {"metaData": {
            "id": "22222222-2222-2222-2222-222222222222",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema,
            "partitionColumns": [],
            "configuration": {
                "delta.enableInCommitTimestamps": "true",
                "delta.inCommitTimestampEnablementVersion": "0",
                "delta.inCommitTimestampEnablementTimestamp":
                    str(future_ict),
            },
            "createdTime": future_ict,
        }},
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    write_delta(
        spark.createDataFrame([(7,)], "k bigint"), t, mode="append"
    )
    commits = _commits(t)
    ci = commits[1][0]["commitInfo"]
    # monotonic PAST the foreign (future-skewed) stamp — never behind it
    assert ci["inCommitTimestamp"] == future_ict + 1
    assert read_delta(spark, t).count() == 1
