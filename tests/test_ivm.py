"""Incremental view maintenance: CDF → signed delta fold → null-safe MERGE.

The contract under test: for any base transition v1 → v2,

    maintain_agg_view(full_agg(v1), table_changes(v1, v2)) == full_agg(v2)

including NULL groups, NULL measures, group-moving updates, emptied groups,
and brand-new groups — plus a seeded random edit-script equivalence sweep.
"""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from zeta_etl_spark.plans.graph import Pipeline
from zeta_etl_spark.plans.ivm import (
    delta_from_changes,
    expose_view,
    full_agg,
    maintain_agg_view,
)

SCHEMA = "k int, grp string, amount decimal(12,2), qty int"

V1 = [
    (1, "a", "10.00", 1),
    (2, "a", "20.00", None),
    (3, "b", "30.00", 3),
    (4, "b", None, 4),
    (5, None, "50.00", 5),   # NULL group is a real group
    (6, "c", "60.00", 6),
]
# edits: upd k=1 amount (same group), move k=3 b→a, delete k=4,
# delete k=6 (empties group c), insert k=7 new group d, insert k=8 null grp
V2 = [
    (1, "a", "11.00", 1),
    (2, "a", "20.00", None),
    (3, "a", "30.00", 3),
    (5, None, "50.00", 5),
    (7, "d", "70.00", None),
    (8, None, None, 8),
]


def _df(spark, rows):
    from decimal import Decimal

    conv = [
        (k, g, Decimal(a) if a is not None else None, q)
        for (k, g, a, q) in rows
    ]
    return spark.createDataFrame(conv, SCHEMA)


def _setup(spark, tmp_path, v1_rows):
    p = Pipeline("ivm", str(tmp_path / "t"))

    @p.table(name="base")
    def base(pl):
        return _df(spark, v1_rows)

    @p.table(name="view")
    def view(pl):
        return full_agg(pl.read("base"), ["grp"], ["amount", "qty"])

    p.run(spark, targets=["base", "view"])
    return p


def _rows(df):
    return sorted(tuple(repr(v) for v in r) for r in df.collect())


def _advance_and_maintain(spark, p, v2_rows):
    p._write_overwrite_atomic(p.nodes["base"], _df(spark, v2_rows))
    cdf = p.table_changes(spark, "base", 1, 2, keys=["k"])
    return maintain_agg_view(
        spark, p, "view", cdf, ["grp"], ["amount", "qty"]
    )


def test_ivm_matches_recompute(spark, tmp_path):
    p = _setup(spark, tmp_path, V1)
    m = _advance_and_maintain(spark, p, V2)
    maintained = spark.read.parquet(os.path.realpath(p.path("view")))
    recomputed = full_agg(_df(spark, V2), ["grp"], ["amount", "qty"])
    assert _rows(maintained) == _rows(recomputed)
    # groups b (move + delete) and c (delete) were emptied → view rows
    # deleted; group d is new → inserted
    assert m["rows_deleted"] == 2
    assert m["rows_inserted"] == 1
    grps = {r.grp for r in maintained.collect()}
    assert "b" not in grps and "c" not in grps
    assert "d" in grps and None in grps


def test_ivm_exposed_sql_semantics(spark, tmp_path):
    p = _setup(spark, tmp_path, V1)
    _advance_and_maintain(spark, p, V2)
    maintained = expose_view(
        spark.read.parquet(os.path.realpath(p.path("view"))),
        ["grp"],
        ["amount", "qty"],
    )
    # avg is derived as exact-sum / count in DOUBLE (expose_view contract)
    # — Spark's AVG(DECIMAL) instead rounds to a decimal scale, which is a
    # different (and less cross-engine-portable) rounding
    direct = _df(spark, V2).groupBy("grp").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("amount").alias("amount_sum"),
        (F.sum("amount").cast("double") / F.count("amount").cast("double"))
        .alias("amount_avg"),
        F.sum("qty").alias("qty_sum"),
        (F.sum("qty").cast("double") / F.count("qty").cast("double"))
        .alias("qty_avg"),
    ).select(
        "grp", "cnt", "amount_sum", "amount_avg", "qty_sum", "qty_avg"
    )
    got = _rows(maintained.select(*direct.columns))
    want = _rows(direct)
    assert got == want
    # the all-NULL-measure exposures really are NULL (k=7's qty, k=8's amount)
    by_grp = {r.grp: r for r in maintained.collect()}
    assert by_grp["d"].qty_sum is None and by_grp["d"].qty_avg is None


def test_ivm_rejects_float_measures(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5)], "k int, grp string, v double")
    with pytest.raises(TypeError, match="exact types"):
        full_agg(df, ["grp"], ["v"])


def test_ivm_rejects_unknown_change_type(spark):
    cdf = spark.createDataFrame(
        [(1, "a", 1, "truncate")], "k int, grp string, qty int, _change_type string"
    )
    # the guard rides inside the fold (no separate validation job), so it
    # surfaces lazily as a Spark runtime error at execution
    with pytest.raises(Exception, match="unknown _change_type"):
        delta_from_changes(cdf, ["grp"], ["qty"]).collect()


def test_ivm_random_edit_scripts(spark, tmp_path):
    """Seeded random transitions: IVM == recompute on every one."""
    rng = random.Random(7)
    groups = ["a", "b", "c", None]

    def rand_rows(keys):
        return [
            (
                k,
                rng.choice(groups),
                f"{rng.randrange(0, 10000)}.{rng.randrange(0, 100):02d}"
                if rng.random() > 0.2
                else None,
                rng.randrange(0, 50) if rng.random() > 0.2 else None,
            )
            for k in keys
        ]

    for trial in range(3):
        v1_keys = sorted(rng.sample(range(30), rng.randrange(5, 20)))
        v1 = rand_rows(v1_keys)
        # v2: drop some, keep-and-maybe-edit some, add some
        kept = [k for k in v1_keys if rng.random() > 0.3]
        new = sorted(set(rng.sample(range(30, 50), rng.randrange(0, 8))))
        v2 = rand_rows(kept) + rand_rows(new)
        p = _setup(spark, tmp_path / f"r{trial}", v1)
        _advance_and_maintain(spark, p, v2)
        maintained = spark.read.parquet(os.path.realpath(p.path("view")))
        recomputed = full_agg(_df(spark, v2), ["grp"], ["amount", "qty"])
        assert _rows(maintained) == _rows(recomputed), f"trial {trial}"
