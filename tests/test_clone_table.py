"""SHALLOW CLONE: a clone publishes hard links of the source generation
(zero data copy), reads identically, then evolves independently — and
either table's vacuum only drops link references, never shared bytes."""

from __future__ import annotations

import os

import pytest

from zeta_etl_spark.plans.graph import Pipeline


@pytest.fixture()
def pipe(spark, tmp_path):
    p = Pipeline("cl", str(tmp_path / "t"))

    @p.table(name="base")
    def base(pl):
        return spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "b", 30)], "k int, g string, v int"
        )

    p.run(spark, targets=["base"])
    return p


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(root):
    out = []
    for d, _, fs in os.walk(os.path.realpath(root)):
        out += [os.path.join(d, f) for f in fs if f.endswith(".parquet")]
    return sorted(out)


def test_clone_reads_identically_with_zero_copy(spark, pipe):
    m = pipe.clone_table("base", "base_dev")
    assert m["clone_source"] == "base" and m["clone_source_version"] == 1
    src = pipe.read_table(spark, "base")
    dst = pipe.read_table(spark, "base_dev")
    assert _rows(src) == _rows(dst)
    # zero copy: every clone data file is a hard link of a source file
    src_inodes = {os.stat(f).st_ino for f in _data_files(pipe.path("base"))}
    for f in _data_files(pipe.path("base_dev")):
        assert os.stat(f).st_ino in src_inodes, f"{f} was copied, not linked"


def test_clone_evolves_independently(spark, pipe):
    pipe.clone_table("base", "base_dev")
    pipe._write_overwrite_atomic(
        pipe.nodes["base_dev"],
        spark.createDataFrame([(9, "z", 90)], "k int, g string, v int"),
    )
    assert _rows(pipe.read_table(spark, "base")) != _rows(
        pipe.read_table(spark, "base_dev")
    )
    # the source still reads its full original snapshot
    assert len(pipe.read_table(spark, "base").collect()) == 3


def test_source_rewrite_and_vacuum_keep_clone_alive(spark, pipe):
    pipe.clone_table("base", "base_dev")
    # rewrite the source enough times to vacuum the cloned generation
    for i in range(3):
        pipe._write_overwrite_atomic(
            pipe.nodes["base"],
            spark.createDataFrame([(100 + i, "q", i)], "k int, g string, v int"),
        )
    pipe.vacuum("base")
    got = _rows(pipe.read_table(spark, "base_dev"))
    assert got == sorted([(1, "a", 10), (2, "b", 20), (3, "b", 30)])


def test_time_travel_clone(spark, pipe):
    pipe._write_overwrite_atomic(
        pipe.nodes["base"],
        spark.createDataFrame([(9, "z", 90)], "k int, g string, v int"),
    )
    m = pipe.clone_table("base", "base_v1", version=1)
    assert m["clone_source_version"] == 1
    assert len(pipe.read_table(spark, "base_v1").collect()) == 3


def test_clone_rejects_unknown_and_vacuumed(spark, pipe):
    with pytest.raises(KeyError, match="unknown source"):
        pipe.clone_table("ghost", "x")
    with pytest.raises(ValueError, match="not\\b.*on disk|predates"):
        pipe.clone_table("base", "x", version=99)


def test_clone_skipped_by_full_dag_run(spark, pipe):
    pipe.clone_table("base", "base_dev")
    out = pipe.run(spark)  # default all-nodes run must skip the clone
    assert "base_dev" not in out and "base" in out


def test_clone_resolves_live_pointer_with_guard(spark, pipe):
    import os

    # dangle the pointer: the guarded resolver must name the table, not
    # raise an opaque int() ValueError
    p = pipe.path("base")
    real = os.path.realpath(p)
    os.unlink(p)
    os.symlink(real + "_gone", p)
    try:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="pointer"):
            pipe.clone_table("base", "x")
    finally:
        os.unlink(p)
        os.symlink(real, p)


def test_clone_partition_by_follows_source_and_conflicts_raise(
    spark, tmp_path
):
    """ADVICE r8: the clone's declared partition_by must match the
    hard-linked on-disk layout — defaulted from the source, explicit
    conflicts raise (silently ignoring them let a later regular
    overwrite of the clone change layout)."""
    import pytest

    from zeta_etl_spark.plans.graph import Pipeline

    p = Pipeline("clp", str(tmp_path / "t"))

    @p.table(name="src_p", partition_by=("g",))
    def src_p(pl):
        return spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, g string"
        )

    p.run(spark, targets=["src_p"])
    p.clone_table("src_p", "dst_p")
    # inherited layout, not ()
    assert tuple(p.nodes["dst_p"].partition_by) == ("g",)
    # matching explicit layout is fine (re-clone over existing dst)
    p.clone_table("src_p", "dst_p", partition_by=("g",))
    with pytest.raises(ValueError, match="conflicts with the source"):
        p.clone_table("src_p", "dst_other", partition_by=("k",))

    # existing destination with a divergent declaration also raises
    @p.table(name="dst_flat")
    def dst_flat(pl):
        return spark.createDataFrame([(1, "a")], "k int, g string")

    with pytest.raises(ValueError, match="existing destination"):
        p.clone_table("src_p", "dst_flat")
