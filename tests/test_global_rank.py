"""Distributed exact global row_number (operators/windows.global_row_number):
the scale path for ``Window.orderBy(...)``, which plans a single-task sort.
Pins: output equality with the one-task window (including across range
boundaries and with duplicate order keys + tie-breaks), and a plan with no
data-sized SinglePartition exchange."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.operators.windows import global_row_number


def _reference(spark, df, order_cols):
    w = Window.orderBy(*order_cols)
    return {
        (r.k, r.v): r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(w).cast("bigint")
        ).collect()
    }


def test_matches_single_partition_window(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        # many duplicate order values → ties MUST cross range boundaries
        (F.col("id") % 50).alias("v"),
    )
    order = [F.col("v").desc(), F.col("k").asc()]
    got = {
        (r.k, r.v): r.rn
        for r in global_row_number(df, order, num_partitions=16).collect()
    }
    assert got == _reference(spark, df, order)


def test_more_partitions_than_rows(spark):
    df = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        (r.k, r.v): r.rn
        for r in global_row_number(df, order, num_partitions=64).collect()
    }
    assert got == _reference(spark, df, order)


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert global_row_number(df, ["v", "k"]).count() == 0


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-5, max_value=5), min_size=1, max_size=60
    ),
    n_part=st.integers(min_value=1, max_value=7),
)
def test_property_equals_one_task_rank(spark, vals, n_part):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        (r.k, r.v): r.rn
        for r in global_row_number(
            df, order, num_partitions=n_part
        ).collect()
    }
    assert got == _reference(spark, df, order)


def test_plan_has_no_data_sized_single_partition_sort(spark):
    """The only SinglePartition exchange allowed is the one over the
    per-partition COUNT frame (rows = num_partitions, bounded by cluster
    parallelism); the data path goes through rangepartitioning."""
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("v")
    )
    out = global_row_number(
        df, [F.col("v").desc(), F.col("k").asc()], num_partitions=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i:])
            assert "HashAggregate" in below, (
                "SinglePartition exchange must sit above the bounded "
                "count frame, not the data"
            )


# ---- global_last_before (the distributed exclusive IGNORE NULLS fill) ------

from zeta_etl_spark.operators.windows import global_last_before  # noqa: E402


def _fill_reference(spark, df, order_cols, value):
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return {
        r.k: r.out
        for r in df.withColumn(
            "out", F.last(value, ignorenulls=True).over(w)
        ).collect()
    }


def test_last_before_matches_one_task_window(spark):
    # nulls interleaved so carries must cross range boundaries
    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("v"),
    )
    value = F.col("v")
    for order in (
        [F.col("k").asc()],
        [F.col("k").desc()],
    ):
        got = {
            r.k: r.out
            for r in global_last_before(
                df, order, value, "out", num_partitions=16
            ).collect()
        }
        assert got == _fill_reference(spark, df, order, value)


def test_last_before_all_null_and_empty(spark):
    df = spark.range(50).select(
        F.col("id").alias("k"), F.lit(None).cast("long").alias("v")
    )
    got = global_last_before(
        df, ["k"], F.col("v"), "out", num_partitions=8
    )
    assert [r.out for r in got.collect()] == [None] * 50
    empty = df.where("k < 0")
    assert global_last_before(empty, ["k"], F.col("v"), "out").count() == 0


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(), st.integers(min_value=-5, max_value=5)
        ),
        min_size=1,
        max_size=60,
    ),
    n_part=st.integers(min_value=1, max_value=7),
)
def test_property_last_before_equals_one_task(spark, vals, n_part):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("k").asc()]
    got = {
        r.k: r.out
        for r in global_last_before(
            df, order, F.col("v"), "out", num_partitions=n_part
        ).collect()
    }
    assert got == _fill_reference(spark, df, order, F.col("v"))


def test_last_before_plan_no_data_sized_single_partition(spark):
    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("v"),
    )
    out = global_last_before(
        df, ["k"], F.col("v"), "out", num_partitions=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i:])
            assert "HashAggregate" in below, (
                "SinglePartition exchange must sit above the bounded "
                "per-partition summary frame, not the data"
            )
