"""Driver-memory shape of the DV write path at real deletion cardinality
(r12 verdict ask #2): a dv-mode DELETE that UNIONS with a pre-existing
deletion vector on the same file must never materialize a positions list
driver-side — the old descriptor rides the frame as JSON and both decode
and re-serialize happen in the executor's python worker.

The proof is a poisoned driver: every positions-producing delta_dv entry
point is monkeypatched to raise IN THIS PROCESS before the delete runs.
local-mode executors are separate python workers (pyspark.daemon) that
import the module fresh, so the operation succeeding end-to-end — at
5M+2M deleted rows on one file — means the driver held only compressed
roaring bytes and descriptors, O(touched files), never O(deleted rows)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.sinks import delta_dv
from zeta_etl_spark.sinks.delta_log import (
    delete_delta,
    read_delta,
    table_changes,
)

N = 10_000_000
FIRST = 5_000_000   # first dv delete: k < 5M (fresh DV)
SECOND = 7_000_000  # second dv delete: 5M <= k < 7M (union with the DV)


def _poison(monkeypatch):
    """Make every positions-producing delta_dv entry point raise when
    called in THIS process.  The guard is by pid, not by module
    identity: cloudpickle captures monkeypatched globals by VALUE into
    executor closures (the poisoned function travels to the workers),
    so an unconditional raise would false-positive on legitimate
    executor-side decodes.  Workers are separate processes
    (pyspark.daemon), so pid == driver pid ⇔ driver-side call."""
    driver_pid = os.getpid()

    def _guard(orig, name):
        def guarded(*a, **k):
            if os.getpid() == driver_pid:
                raise AssertionError(
                    f"{name} called in the DRIVER process — the DV "
                    "path must stay executor-side"
                )
            return orig(*a, **k)

        return guarded

    for name in ("read_dv_rows", "deserialize_dv_bitmap",
                 "serialize_dv_bitmap", "dv_positions"):
        monkeypatch.setattr(
            delta_dv, name, _guard(getattr(delta_dv, name), name)
        )


def test_dv_union_5m_rows_stays_executor_side(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "big")
    from zeta_etl_spark.sinks.delta_log import write_delta

    # one data file: coalesce(1) so BOTH deletes touch the same file and
    # the second one exercises the union-with-existing-DV path
    write_delta(
        spark.range(N).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("m")
        ).coalesce(1),
        t,
    )

    _poison(monkeypatch)
    r1 = delete_delta(spark, t, [("k", "<", FIRST)], mode="dv")
    assert r1["rows_deleted"] == FIRST
    r2 = delete_delta(spark, t, [("k", "<", SECOND)], mode="dv")
    assert r2["rows_deleted"] == SECOND - FIRST
    assert r2["files_touched"] == 1

    # the committed descriptor declares the UNIONED cardinality
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{r2['version']:020d}.json")) as fh:
        descs = [
            json.loads(line)["add"]["deletionVector"]
            for line in fh
            if line.strip() and "add" in json.loads(line)
        ]
    assert [d["cardinality"] for d in descs] == [SECOND]

    # the read path (executor-side decode too) sees exactly the survivors
    back = read_delta(spark, t)
    assert back.count() == N - SECOND
    assert back.agg(F.min("k")).first()[0] == SECOND

    # CDF over the union commit derives ONLY the delta (executor-side):
    # the 2M newly-dead rows, not the 5M already dead
    feed = table_changes(spark, t, r2["version"], r2["version"])
    agg = feed.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("lo"),
        F.max("k").alias("hi"),
    ).first()
    assert (agg["n"], agg["lo"], agg["hi"]) == (
        SECOND - FIRST, FIRST, SECOND - 1
    )
