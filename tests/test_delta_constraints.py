"""CHECK constraints + column invariants ENFORCED (delta.io PROTOCOL.md
"CHECK Constraints" / "Column Invariants"): every write path validates
rows against the declared predicates with SQL CHECK semantics (NULL
passes, FALSE aborts loudly before any commit);
``add_check_constraint`` scans existing rows before taking the
declaration, exactly like Delta."""

from __future__ import annotations

import json
import os

import pytest

from zeta_etl_spark.sinks.delta_log import (
    _replay,
    add_check_constraint,
    drop_check_constraint,
    merge_delta,
    read_delta,
    update_delta,
    write_delta,
)


def _mk(spark, tmp_path, name="ct"):
    t = str(tmp_path / name)
    write_delta(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b")], "k bigint, v double, s string"
        ),
        t, mode="append",
    )
    return t


def test_add_constraint_then_writes_validate(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = add_check_constraint(spark, t, "v_positive", "v > 0")
    protocol, meta, _, _ = _replay(t)
    assert meta["configuration"]["delta.constraints.v_positive"] == "v > 0"
    assert protocol["minWriterVersion"] >= 3
    with pytest.raises(ValueError, match="v_positive"):
        write_delta(
            spark.createDataFrame([(3, -1.0, "x")],
                                  "k bigint, v double, s string"),
            t, mode="append",
        )
    # NULL passes (SQL CHECK semantics)
    write_delta(
        spark.createDataFrame([(3, None, "x")],
                              "k bigint, v double, s string"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 3
    assert not os.path.exists(
        os.path.join(t, "_delta_log", f"{int(v) + 2:020d}.json")
    )


def test_add_constraint_scans_existing_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="existing row violates"):
        add_check_constraint(spark, t, "v_small", "v < 15")
    # refusal committed nothing
    _, meta, _, _ = _replay(t)
    assert not any(
        k.startswith("delta.constraints.") for k in meta["configuration"]
    )


def test_update_and_merge_validate(spark, tmp_path):
    t = _mk(spark, tmp_path)
    add_check_constraint(spark, t, "v_positive", "v > 0")
    with pytest.raises(ValueError, match="v_positive"):
        update_delta(spark, t, {"v": "v - 100"}, [("k", "=", 1)])
    with pytest.raises(ValueError, match="v_positive"):
        merge_delta(
            spark, t,
            spark.createDataFrame([(2, -5.0, "B")],
                                  "k bigint, v double, s string"),
            on=["k"], when_matched_update="*",
        )
    # nothing committed; valid DML still flows
    assert {r["k"]: r["v"] for r in read_delta(spark, t).collect()} == {
        1: 10.0, 2: 20.0
    }
    update_delta(spark, t, {"v": "v + 1"}, [("k", "=", 1)])
    assert {r["k"]: r["v"] for r in read_delta(spark, t).collect()}[1] == 11.0


def test_multi_constraint_error_names_the_broken_one(spark, tmp_path):
    t = _mk(spark, tmp_path)
    add_check_constraint(spark, t, "v_positive", "v > 0")
    add_check_constraint(spark, t, "s_nonempty", "length(s) > 0")
    try:
        write_delta(
            spark.createDataFrame([(9, -1.0, "ok")],
                                  "k bigint, v double, s string"),
            t, mode="append",
        )
        raise AssertionError("should have refused")
    except ValueError as e:
        assert "v_positive" in str(e) and "s_nonempty" not in str(e)


def test_drop_constraint_reopens_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    add_check_constraint(spark, t, "v_positive", "v > 0")
    drop_check_constraint(t, "v_positive")
    write_delta(
        spark.createDataFrame([(3, -1.0, "x")],
                              "k bigint, v double, s string"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 3
    with pytest.raises(ValueError, match="no constraint"):
        drop_check_constraint(t, "v_positive")


def test_foreign_invariant_json_wrapper_enforced(spark, tmp_path):
    # the historical JSON wrapper form delta-spark writes
    t = str(tmp_path / "inv")
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "long", "nullable": True,
         "metadata": {"delta.invariants":
                      '{"expression":{"expression":"v >= 100"}}'}},
    ]})
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "inv", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 1700000000000,
        }},
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(ValueError, match="invariant"):
        write_delta(
            spark.createDataFrame([(1, 5)], "k bigint, v bigint"),
            t, mode="append",
        )
    write_delta(
        spark.createDataFrame([(1, 500)], "k bigint, v bigint"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 1
