"""Unit tests for the custom temporal operators (SURVEY §5.1): as-of join
visibility/tie rules, range join boundary semantics, shift join, densify."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from zeta_etl_spark.operators.temporal import (
    as_of_join,
    densify,
    range_join,
    shift_join,
    time_spine,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_non_strict_sees_same_timestamp_row(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "exact"),
         (1, _ts("2024-01-01 09:00:00"), "earlier")],
        "k int, rts timestamp_ntz, tag string",
    )
    out = as_of_join(
        left, right, keys=["k"], left_ts="ts", right_ts="rts",
        right_cols=["tag"], strict=False,
    ).collect()
    assert out[0]["tag"] == "exact"


def test_asof_strict_excludes_same_timestamp_row(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "exact"),
         (1, _ts("2024-01-01 09:00:00"), "earlier")],
        "k int, rts timestamp_ntz, tag string",
    )
    out = as_of_join(
        left, right, keys=["k"], left_ts="ts", right_ts="rts",
        right_cols=["tag"], strict=True,
    ).collect()
    assert out[0]["tag"] == "earlier"


def test_asof_no_prior_row_yields_null(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00")), (2, _ts("2024-01-01 12:00:00"))],
        "k int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), "later_only")],
        "k int, rts timestamp_ntz, tag string",
    )
    out = {r["k"]: r for r in as_of_join(
        left, right, keys=["k"], left_ts="ts", right_ts="rts",
        right_cols=["tag"],
    ).collect()}
    assert out[1]["tag"] is None  # right row is in the future
    assert out[2]["tag"] is None  # no right rows for key 2
    assert len(out) == 2  # left rows always survive


def test_range_join_boundaries_inclusive_exclusive(spark):
    events = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 10:59:59")),
         (3, 10, _ts("2024-01-01 11:00:00")),
         (4, 10, _ts("2024-01-01 09:59:59"))],
        "eid int, k int, ts timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid int, k int, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    out = range_join(
        events, intervals, left_ts="ts", start_col="start_ts",
        end_col="end_ts", bucket_seconds=600, keys=["k"],
    )
    matched = sorted(r["eid"] for r in out.collect())
    assert matched == [1, 2]  # start inclusive, end exclusive


def test_range_join_interval_spanning_many_buckets(spark):
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01 13:37:00"))], "eid int, ts timestamp_ntz"
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iid int, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    out = range_join(
        events, intervals, left_ts="ts", start_col="start_ts",
        end_col="end_ts", bucket_seconds=3600,
    ).collect()
    assert len(out) == 1 and out[0]["iid"] == 7


def test_shift_join_prev_period(spark):
    hourly = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 1.0),
         ("a", _ts("2024-01-01 11:00:00"), 2.0),
         ("a", _ts("2024-01-01 13:00:00"), 4.0)],
        "k string, ts timestamp_ntz, v double",
    )
    out = {r["ts"].hour: r["v_prev"] for r in shift_join(
        hourly, hourly, keys=["k"], ts_col="ts", shift="interval 1 hour",
    ).collect()}
    assert out[10] is None
    assert out[11] == 1.0
    assert out[13] is None  # gap hour → no prev


def test_time_spine_and_densify(spark):
    spine = time_spine(
        spark, "timestamp_ntz'2024-01-01 00:00:00'",
        "timestamp_ntz'2024-01-01 03:00:00'",
    )
    assert spine.count() == 4
    facts = spark.createDataFrame(
        [(_ts("2024-01-01 01:00:00"), "x", 5.0)],
        "spine_ts timestamp_ntz, k string, v double",
    )
    dims = [spark.createDataFrame([("x",), ("y",)], "k string")]
    dense = densify(facts, spine, dims, on=["spine_ts", "k"], fill={"v": 0.0})
    assert dense.count() == 8
    assert dense.filter("v != 0").count() == 1


def test_asof_join_rejects_column_collision(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0)], "k int, ts timestamp_ntz, value double"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1.0)],
        "k int, rts timestamp_ntz, value double",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        as_of_join(left, right, keys=["k"], left_ts="ts", right_ts="rts",
                   right_cols=["value"])


def test_range_join_rejects_column_collision(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0)], "k int, ts timestamp_ntz, v double"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"), 1.0)],
        "k int, start_ts timestamp_ntz, end_ts timestamp_ntz, v double",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        range_join(left, right, left_ts="ts", start_col="start_ts",
                   end_col="end_ts", keys=["k"])


def test_cogrouped_asof_matches_union_merge(spark):
    """cogrouped applyInPandas as-of join (pandas merge_asof per key group)
    must equal the codegen union-merge as_of_join, including exact-match
    visibility, keys with no right rows, and duplicate right timestamps
    (greatest right_cols tuple wins)."""
    from zeta_etl_spark.operators.temporal import as_of_join, cogrouped_asof_join

    left = spark.createDataFrame(
        [
            ("a", 10, 1.0),
            ("a", 20, 2.0),
            ("a", 5, 0.5),
            ("b", 15, 3.0),
            ("c", 1, 9.0),  # no right rows for c
        ],
        "k string, lts bigint, lval double",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 100.0),  # exact match visible at lts=10
            ("a", 10, 150.0),  # duplicate ts: greatest rval wins
            ("a", 12, 200.0),
            ("b", 14, 300.0),
            ("b", 16, 400.0),  # after lts=15 → invisible
        ],
        "k string, rts bigint, rval double",
    )
    got = cogrouped_asof_join(
        left, right, keys=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rval"],
    )
    want = as_of_join(
        left, right, keys=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rval"],
    ).select(*got.columns)
    g = {(r["k"], r["lts"]): r["rval"] for r in got.collect()}
    w = {(r["k"], r["lts"]): r["rval"] for r in want.collect()}
    assert g == w
    assert g[("a", 10)] == 150.0
    assert g[("a", 5)] is None
    assert g[("c", 1)] is None
    assert g[("b", 15)] == 300.0


def test_cogrouped_asof_null_tie_and_collision_guard(spark):
    """Null right_cols value in a right-ts tie must LOSE to the real value
    (matching the twin's nulls-first + last(ignorenulls)); colliding column
    names are rejected upfront like the twin."""
    import pytest as _pytest

    from zeta_etl_spark.operators.temporal import as_of_join, cogrouped_asof_join

    left = spark.createDataFrame(
        [("a", 10, 1.0)], "k string, lts bigint, lval double"
    )
    right = spark.createDataFrame(
        [("a", 10, 100.0), ("a", 10, None)],
        "k string, rts bigint, rval double",
    )
    got = cogrouped_asof_join(
        left, right, keys=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rval"],
    ).collect()
    want = as_of_join(
        left, right, keys=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rval"],
    ).collect()
    assert got[0]["rval"] == 100.0
    assert got[0]["rval"] == want[0]["rval"]

    with _pytest.raises(ValueError, match="collide"):
        cogrouped_asof_join(
            left,
            right.withColumnRenamed("rts", "lts"),
            keys=["k"], left_ts="lts", right_ts="lts", right_cols=["rval"],
        )
