"""Scale linter: the census checks packaged as a user-facing API."""

# no `from __future__ import annotations`: pandas_udf resolves the pd.Series
# type hints at decoration time and stringified annotations break it
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.plans.lint import (
    PlanScaleError,
    assert_scalable,
    lint_plan,
)


def _codes(findings, severity=None):
    return {
        f.code
        for f in findings
        if severity is None or f.severity == severity
    }


def test_clean_registry_query_passes(spark, sf_dir):
    from zeta_etl_spark.queries import REGISTRY

    df = REGISTRY["pricing_summary"].fn(spark, sf_dir)
    findings = assert_scalable(df)  # no error findings
    assert "exchange-count" in _codes(findings, "info")


def test_cartesian_product_is_error(spark):
    # small frames broadcast into a BNLJ; force the true cartesian by
    # disabling auto-broadcast while the plan is built
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(100)
        b = spark.range(100).withColumnRenamed("id", "id2")
        df = a.crossJoin(b)
        with pytest.raises(PlanScaleError, match="cartesian-product"):
            assert_scalable(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_row_udf_is_error_arrow_seam_is_info(spark):
    from pyspark.sql.types import LongType

    plain = F.udf(lambda x: x + 1, LongType())
    df = spark.range(100).select(plain("id").alias("y"))
    assert "row-python-udf" in _codes(lint_plan(df), "error")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def arrow_inc(s: pd.Series) -> pd.Series:
        return s + 1

    df2 = spark.range(100).select(arrow_inc("id").alias("y"))
    f2 = lint_plan(df2)
    assert "row-python-udf" not in _codes(f2)
    assert "arrow-python-seam" in _codes(f2, "info")


def test_global_window_over_scan_warns_aggregated_grain_does_not(
    spark, sf_dir
):
    from zeta_etl_spark.datasets import load_table

    ev = load_table(spark, sf_dir, "events")
    # global rank directly over the scan: one task over data-sized input
    bad = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("event_id"))
    )
    assert "single-partition-over-scan" in _codes(lint_plan(bad), "warn")

    # the engine pattern: aggregate to the bounded grain FIRST
    good = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("n"))))
    )
    assert "single-partition-over-scan" not in _codes(lint_plan(good))


def test_scalar_frame_crossjoin_not_flagged_unbounded(spark, sf_dir):
    from zeta_etl_spark.datasets import load_table
    from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin

    ev = load_table(spark, sf_dir, "events")
    totals = ev.agg(F.count(F.lit(1)).alias("n_total"))
    df = scalar_frame_crossjoin(ev, totals)
    findings = lint_plan(df)
    assert "unbounded-nested-loop" not in _codes(findings)
    assert "cartesian-product" not in _codes(findings)


def test_full_registry_has_no_lint_errors(spark, sf_dir):
    """The linter agrees with the census: zero error-severity findings
    across every registry query (the census's 0-cartesian invariant plus
    the no-row-UDF rule, now enforced through the public API)."""
    from zeta_etl_spark.queries import REGISTRY

    errors = {}
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        errs = [f for f in lint_plan(df) if f.severity == "error"]
        if errs:
            errors[name] = [f.code for f in errs]
    assert not errors, errors


def test_shrinking_frame_warns_running_frame_does_not(spark):
    # the pre-r8 skyline_orders shape: (1 FOLLOWING, UNBOUNDED FOLLOWING)
    # range frame — Spark recomputes the MAX per row, O(n^2) per partition
    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("d"), F.col("id").alias("v")
    )
    bad = df.withColumn(
        "later_max",
        F.max("v").over(
            Window.partitionBy("k")
            .orderBy("d")
            .rangeBetween(1, Window.unboundedFollowing)
        ),
    )
    assert "unbounded-following-frame" in _codes(lint_plan(bad), "warn")

    # the O(n) rewrite: descending running frame — must NOT warn
    good = df.withColumn(
        "later_max",
        F.max("v").over(
            Window.partitionBy("k")
            .orderBy(F.col("d").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    assert "unbounded-following-frame" not in _codes(lint_plan(good))

    # whole-partition frame is computed once — must NOT warn
    whole = df.withColumn(
        "t",
        F.sum("v").over(
            Window.partitionBy("k").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    assert "unbounded-following-frame" not in _codes(lint_plan(whole))
