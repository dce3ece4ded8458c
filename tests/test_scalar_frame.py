"""Scalar-frame cross-join pin (VERDICT r6 next-7): the bounded broadcast
cross-join is allowed only through ``scalar_frame_crossjoin`` /
``with_scalar_frame``, which verify the boundedness invariant at every call
site instead of only in the global plan census."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.operators.scalar_frame import (
    is_provably_bounded,
    scalar_frame_crossjoin,
    with_scalar_frame,
)

ROOT = os.path.join(os.path.dirname(__file__), "..", "zeta_etl_spark")


def test_no_raw_broadcast_crossjoin_outside_helper():
    """Policy grep: raw ``crossJoin(F.broadcast(...))`` (either operand
    order) must not appear outside the helper module."""
    offenders = []
    for dirpath, _dirs, files in os.walk(ROOT):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            if full.endswith("operators/scalar_frame.py"):
                continue
            src = open(full).read()
            if re.search(r"\.crossJoin\(\s*F\.broadcast\(", src) or re.search(
                r"F\.broadcast\([^)]*\)\s*\.crossJoin\(", src
            ):
                offenders.append(os.path.relpath(full, ROOT))
    assert offenders == []


def test_provable_scalar_frames_accepted(spark):
    df = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 2.0).alias("v"),
    )
    assert is_provably_bounded(df.agg(F.sum("v").alias("s")))
    assert is_provably_bounded(
        df.agg(F.sum("v").alias("s")).select((F.col("s") * 2).alias("t"))
    )
    assert is_provably_bounded(df.limit(5))
    assert is_provably_bounded(df.orderBy("v").limit(5))
    # data-dependent row counts are NOT provable
    assert not is_provably_bounded(df)
    assert not is_provably_bounded(df.select("k").distinct())
    assert not is_provably_bounded(df.filter("k < 10"))
    assert not is_provably_bounded(df.groupBy("k").agg(F.sum("v").alias("s")))


def test_unprovable_requires_bound(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    types = df.select("k").distinct()
    with pytest.raises(ValueError, match="not provably bounded"):
        scalar_frame_crossjoin(df, types)
    out = scalar_frame_crossjoin(df, types, bound=16)
    assert out.count() == 100
    with pytest.raises(ValueError, match="bound must be"):
        scalar_frame_crossjoin(df, types, bound=0)


def test_join_result_and_plan_shape(spark):
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tot = df.agg(F.sum("v").alias("total"))
    out = df.transform(with_scalar_frame(tot)).select(
        "k", (F.col("v") / F.col("total")).alias("share")
    )
    assert abs(sum(r.share for r in out.collect()) - 1.0) < 1e-9
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
