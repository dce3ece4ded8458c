"""schema_mode= publish governance: 'enforce' rejects any drift against
the live generation, 'merge' allows additive columns only, 'none' keeps
the write-defines-schema behavior.  Comparison ignores nullability and
column order."""

from __future__ import annotations

import pytest

from zeta_etl_spark.plans.graph import Pipeline


def _pipe(spark, tmp_path, schema_mode):
    p = Pipeline("sm", str(tmp_path / "t"))

    @p.table(name="tb", schema_mode=schema_mode)
    def tb(pl):
        return spark.createDataFrame([(1, "a")], "k int, g string")

    p.run(spark, targets=["tb"])
    return p


def _write(spark, p, ddl, rows):
    p._write_overwrite_atomic(p.nodes["tb"], spark.createDataFrame(rows, ddl))


def test_enforce_accepts_identical_schema(spark, tmp_path):
    p = _pipe(spark, tmp_path, "enforce")
    _write(spark, p, "g string, k int", [("b", 2)])  # order is irrelevant
    assert p.read_table(spark, "tb").count() == 1


def test_enforce_rejects_added_dropped_retyped(spark, tmp_path):
    p = _pipe(spark, tmp_path, "enforce")
    with pytest.raises(ValueError, match="adds columns"):
        _write(spark, p, "k int, g string, extra int", [(1, "a", 2)])
    with pytest.raises(ValueError, match="drops columns"):
        _write(spark, p, "k int", [(1,)])
    with pytest.raises(ValueError, match="retypes"):
        _write(spark, p, "k bigint, g string", [(1, "a")])


def test_merge_allows_additive_only(spark, tmp_path):
    p = _pipe(spark, tmp_path, "merge")
    _write(spark, p, "k int, g string, extra int", [(1, "a", 2)])
    assert "extra" in p.read_table(spark, "tb").columns
    with pytest.raises(ValueError, match="drops columns"):
        _write(spark, p, "k int, extra int", [(1, 2)])


def test_none_keeps_write_defines_schema(spark, tmp_path):
    p = _pipe(spark, tmp_path, "none")
    _write(spark, p, "totally string", [("different",)])
    assert p.read_table(spark, "tb").columns == ["totally"]


def test_first_publish_defines_schema(spark, tmp_path):
    p = Pipeline("sm2", str(tmp_path / "t"))

    @p.table(name="tb", schema_mode="enforce")
    def tb(pl):
        return spark.createDataFrame([(1,)], "k int")

    # no generation yet: the first write is the schema definition
    p.run(spark, targets=["tb"])
    assert p.read_table(spark, "tb").columns == ["k"]


def test_bad_schema_mode_rejected(spark, tmp_path):
    p = Pipeline("sm3", str(tmp_path / "t"))
    with pytest.raises(ValueError, match="schema_mode"):

        @p.table(name="tb", schema_mode="strict")
        def tb(pl):
            raise AssertionError("unreachable")


def test_schema_mode_rejected_for_non_overwrite_modes(spark, tmp_path):
    p = Pipeline("sm4", str(tmp_path / "t"))
    with pytest.raises(ValueError, match="publish seam"):

        @p.table(name="tb", mode="append", schema_mode="enforce")
        def tb(pl):
            raise AssertionError("unreachable")


def test_enforce_survives_empty_generation(spark, tmp_path):
    """An empty (0-part-file) publish must not break later governed
    writes — the comparison reads the commit record, not file inference."""
    p = _pipe(spark, tmp_path, "enforce")
    empty = spark.createDataFrame([], "k int, g string")
    p._write_overwrite_atomic(p.nodes["tb"], empty)
    _write(spark, p, "k int, g string", [(7, "z")])  # same schema: accepted
    assert p.read_table(spark, "tb").count() == 1
    with pytest.raises(ValueError, match="drops columns"):
        _write(spark, p, "k int", [(1,)])
