"""A/B the two item_item_cf_topk shapes (VERDICT r13 #3): the r12
window + self-join pair generation vs the r13 array-collect + expansion.

Both shapes share the adjacency build and the scoring tail; only the
co-occurrence pair generation differs.  Noop-sink timing (guide §1.4),
interleaved reps, min + median reported — run on a gated host.

Usage: python scripts/ab_item_item.py [--sf-dir DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zeta_etl_spark.queries.frontier13_q import _CF_CAP, _CF_K  # noqa: E402
from zeta_etl_spark.queries.registry import T  # noqa: E402
from zeta_etl_spark.session import get_spark  # noqa: E402


def _adjacency(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    e = (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .agg(
            F.sum(
                F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    return e.localCheckpoint()


def _tail(co, deg):
    scored = (
        co.join(
            deg.select(F.col("part").alias("part_a"), F.col("deg").alias("da")),
            "part_a",
        )
        .join(
            deg.select(F.col("part").alias("part_b"), F.col("deg").alias("db")),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "c",
            F.expr(
                "cast(floor(1000000.0 * c"
                " / sqrt(cast(da as double) * cast(db as double)) + 0.5)"
                " as bigint)"
            ).alias("cosine_ppm"),
        )
    )
    wk = Window.partitionBy("part_a").orderBy(
        F.col("cosine_ppm").desc(), "part_b"
    )
    return (
        scored.select(
            "part_a",
            "part_b",
            F.col("c").alias("co_count"),
            "cosine_ppm",
            F.row_number().over(wk).alias("rn"),
        )
        .filter(F.col("rn") <= _CF_K)
        .drop("rn")
    )


def shape_r12(spark, sf_dir):
    e = _adjacency(spark, sf_dir)
    deg = e.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    w = Window.partitionBy("cust").orderBy(F.col("cents").desc(), "part")
    top = (
        e.select("cust", "part", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _CF_CAP)
        .select("cust", "part")
    )
    co = (
        top.alias("a")
        .join(
            top.alias("b"),
            (F.col("b.cust") == F.col("a.cust"))
            & (F.col("a.part") != F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return _tail(co, deg)


def shape_r13(spark, sf_dir):
    from zeta_etl_spark.operators.graph import (
        ordered_pairs_from_arrays,
        topk_items_by_score,
    )

    e = _adjacency(spark, sf_dir)
    deg = e.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    top = topk_items_by_score(e, "cust", "part", "cents", _CF_CAP)
    co = (
        ordered_pairs_from_arrays(top, "part_a", "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return _tail(co, deg)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    spark = get_spark(app_name="ab-item-item")
    spark.sparkContext.setLogLevel("ERROR")
    # warm probe
    T(spark, args.sf_dir, "lineitem").count()
    shapes = {"r12_selfjoin": shape_r12, "r13_arrays": shape_r13}
    times: dict[str, list[float]] = {k: [] for k in shapes}
    for _ in range(args.reps):
        for name, fn in shapes.items():
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(round(time.perf_counter() - t0, 3))
    out = {
        k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
        for k, v in times.items()
    }
    print(json.dumps({"sf_dir": args.sf_dir, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
