"""Cross-feature interactions on the r13 surface: type widening on
column-mapped tables, widening + CDF, constraints + row tracking, and a
seeded random-DML invariant drill on stable-row-id tables (the id-set
algebra must hold under ANY interleaving of the write paths)."""

from __future__ import annotations

import json
import random

import pytest

from zeta_etl_spark.sinks.delta_log import (
    add_check_constraint,
    delete_delta,
    enable_row_tracking,
    merge_delta,
    optimize,
    read_delta,
    read_delta_row_ids,
    table_changes,
    update_delta,
    widen_column_type,
    write_delta,
)


@pytest.mark.parametrize("mapping", ["name", "id"])
def test_widening_on_mapped_tables(spark, tmp_path, mapping):
    t = str(tmp_path / f"wm_{mapping}")
    write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        t, mode="append", column_mapping=mapping,
    )
    widen_column_type(t, "v", "bigint")
    write_delta(
        spark.createDataFrame([(3, 30_000_000_000)], "k int, v bigint"),
        t, mode="append",
    )
    update_delta(spark, t, {"v": "v + 1"}, [("k", "=", 1)])
    rows = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows == {1: 11, 2: 20, 3: 30_000_000_000}
    assert dict(read_delta(spark, t).dtypes)["v"] == "bigint"


def test_widening_then_cdf_update_pairs_are_wide(spark, tmp_path):
    t = str(tmp_path / "wcdf")
    write_delta(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        t, mode="append",
    )
    widen_column_type(t, "v", "bigint")
    res = update_delta(
        spark, t, {"v": "v + 40000000000"}, [("k", "=", 2)]
    )
    ch = table_changes(spark, t, res["version"], res["version"])
    got = {
        r["_change_type"]: r["v"]
        for r in ch.select("_change_type", "v").collect()
    }
    assert got == {
        "update_preimage": 20,
        "update_postimage": 40_000_000_020,
    }
    assert dict(ch.dtypes)["v"] == "bigint"


def test_constraint_on_row_tracked_table(spark, tmp_path):
    # both write-path obligations compose: id preservation AND row
    # validation on the same UPDATE
    t = str(tmp_path / "ctrt")
    write_delta(
        spark.range(6).selectExpr("id AS k", "CAST(id AS double) AS v"),
        t, mode="append",
    )
    enable_row_tracking(t)
    add_check_constraint(spark, t, "v_small", "v < 100")
    before = {
        r["k"]: r["row_id"]
        for r in read_delta_row_ids(spark, t).collect()
    }
    with pytest.raises(ValueError, match="v_small"):
        update_delta(spark, t, {"v": "v + 1000"}, [("k", "=", 1)])
    update_delta(spark, t, {"v": "v + 10"}, [("k", "=", 1)])
    after = {
        r["k"]: r["row_id"]
        for r in read_delta_row_ids(spark, t).collect()
    }
    assert after == before


def test_random_dml_drill_preserves_id_algebra(spark, tmp_path):
    """Seeded random interleavings of every write path on a stable-id
    table.  Invariants checked after EVERY op: (a) live row ids are
    unique; (b) a key that survived the op and existed before keeps its
    id; (c) fresh keys take ids above every id ever seen (no reuse);
    (d) read_delta and read_delta_row_ids agree on the key set."""
    rng = random.Random(13)
    t = str(tmp_path / "drill")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(12)], "k bigint, v double"
        ).repartition(2),
        t, mode="append",
    )
    enable_row_tracking(t)
    ids = {
        r["k"]: r["row_id"]
        for r in read_delta_row_ids(spark, t).collect()
    }
    next_key = 100
    max_seen = max(ids.values())
    for step in range(8):
        op = rng.choice(
            ["append", "update", "del_rw", "del_dv", "optimize", "merge"]
        )
        keys = sorted(ids)
        if op == "append":
            ks = [next_key, next_key + 1]
            next_key += 2
            write_delta(
                spark.createDataFrame(
                    [(k, float(k)) for k in ks], "k bigint, v double"
                ),
                t, mode="append",
            )
        elif op == "update" and keys:
            pivot = rng.choice(keys)
            update_delta(
                spark, t, {"v": "v + 0.5"}, [("k", "=", pivot)]
            )
        elif op == "del_rw" and len(keys) > 4:
            victim = rng.choice(keys)
            delete_delta(spark, t, [("k", "=", victim)], mode="rewrite")
        elif op == "del_dv" and len(keys) > 4:
            victim = rng.choice(keys)
            delete_delta(spark, t, [("k", "=", victim)], mode="dv")
        elif op == "optimize":
            optimize(spark, t, target_file_rows=1000)
        elif op == "merge" and keys:
            upd, ins = rng.choice(keys), next_key
            next_key += 1
            merge_delta(
                spark, t,
                spark.createDataFrame(
                    [(upd, -1.0), (ins, float(ins))], "k bigint, v double"
                ),
                on=["k"],
                when_matched_update="*",
                when_not_matched_insert="*",
            )
        now = {
            r["k"]: r["row_id"]
            for r in read_delta_row_ids(spark, t).collect()
        }
        rid_list = list(now.values())
        assert len(set(rid_list)) == len(rid_list), (step, op)  # (a)
        for k, rid in now.items():
            if k in ids:
                assert rid == ids[k], (step, op, k)              # (b)
            else:
                assert rid > max_seen, (step, op, k)             # (c)
        assert set(now) == {
            r["k"] for r in read_delta(spark, t).collect()
        }, (step, op)                                            # (d)
        ids = now
        max_seen = max([max_seen] + rid_list)
