"""Interleaved A/B of the r13 global session knobs (VERDICT r13 #1).

The sequential full-bench arms are exposed to host drift (sentinel moved
0.65→0.90 between arms on this host).  All three knobs are runtime SQL
confs, so this runner toggles them PER REP inside one session and
interleaves arms (A,B,A,B,...) over a fixed basket — drift hits every arm
equally, and per-query min/median pairs are directly comparable.

Arms:
  shj  : preferSortMergeJoin=false, SHJ localmap=128m  (r13 default)
  smj  : preferSortMergeJoin=true,  SHJ localmap=0     (stock Spark)
crossed with objectHashAggregate fallback 4096 (r13) vs 128 (stock).

Basket: the r13 driver's slowest-10 (the PERF_r14 comparison set) plus the
join/agg-heavy members of the r1 yardstick basket.

Usage: python scripts/ab_knobs_interleaved.py [--reps 5] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zeta_etl_spark.queries import REGISTRY  # noqa: E402
from zeta_etl_spark.session import get_spark  # noqa: E402

BASKET = [
    # r13 driver slowest-10 (the PERF_r14 per-query comparison set)
    "kcore_peeling",
    "item_item_cf_topk",
    "semantic_dup_clusters",
    "ivf_pq_rerank_top5",
    "prf_rocchio_top10",
    "link_prediction_suppliers",
    "hits_hub_authority",
    "pagerank_sim_graph",
    "langid_cohens_kappa",
    "set_cover_source_picks",
    # join/agg-heavy r1-basket + hot-list members
    "minhash_lsh_pairs",
    "corpus_curation",
    "knn_cosine_top5",
    "sparse_cosine_pairs",
    "sq8_rerank_top5",
    "good_turing_discounts",
    "market_basket_pairs",
    "brand_clustering_coefficient",
    "dedup_clusters_incremental",
    "grid_density_clusters",
]

ARMS = {
    "shj4096": ("false", "128m", "4096"),
    "smj4096": ("true", "0", "4096"),
    "shj128": ("false", "128m", "128"),
    "smj128": ("true", "0", "128"),
}


def set_arm(spark, arm: str) -> None:
    smj, localmap, objagg = ARMS[arm]
    spark.conf.set("spark.sql.join.preferSortMergeJoin", smj)
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", localmap
    )
    spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", objagg
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--arms", nargs="+", default=list(ARMS))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    spark = get_spark(app_name="ab-knobs")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in BASKET if n in REGISTRY]
    # warm probes as in bench.py
    REGISTRY["pricing_summary"].fn(spark, args.sf_dir).count()
    from zeta_etl_spark.queries.registry import T

    T(spark, args.sf_dir, "embeddings").selectExpr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), "
        "cast(0.0 as double), (a, v) -> a + v) AS s"
    ).agg({"s": "sum"}).collect()

    def sentinel() -> float:
        t0 = time.perf_counter()
        n = (
            spark.range(0, 20_000_000)
            .selectExpr("id % 1000 AS k", "xxhash64(id) AS h")
            .groupBy("k")
            .agg({"h": "sum"})
            .count()
        )
        assert n == 1000
        return round(time.perf_counter() - t0, 3)

    times: dict[str, dict[str, list[float]]] = {
        a: {n: [] for n in names} for a in args.arms
    }
    sentinels: list[float] = []
    for rep in range(args.reps):
        sentinels.append(sentinel())
        for arm in args.arms:
            set_arm(spark, arm)
            for name in names:
                spark.sparkContext.setJobDescription(f"{arm}:{name}")
                t0 = time.perf_counter()
                n = REGISTRY[name].fn(spark, args.sf_dir).count()
                assert n >= 0
                times[arm][name].append(
                    round(time.perf_counter() - t0, 3)
                )
    summary = {}
    for arm in args.arms:
        per_q = {
            n: {"min": min(v), "med": sorted(v)[len(v) // 2]}
            for n, v in times[arm].items()
        }
        summary[arm] = {
            "total_min": round(sum(x["min"] for x in per_q.values()), 3),
            "total_med": round(sum(x["med"] for x in per_q.values()), 3),
            "per_query": per_q,
        }
    out = {
        "reps": args.reps,
        "sf_dir": args.sf_dir,
        "sentinels": sentinels,
        "arms": summary,
        "raw": times,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
