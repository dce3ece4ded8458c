"""sf1 (10x gate scale) headline basket — the cross-round perf yardstick
where DATA dominates fixed overhead (r12 verdict ask #4: at sf0.1 the
suite is Catalyst/session-overhead-dominated and round-over-round claims
sat inside host noise).

Basket = the 20 most expensive bench queries at r12 HEAD, PINNED BY NAME
(the r10 lesson: position-pinned baskets silently change membership).
3 interleaved reps, per-query median + max/min spread, and the frozen
sentinel job for host-speed normalization.

Sentinel gating (the committed rule, ROUND_NOTES "judge-facing"): a rep
pass only RECORDS when the sentinel reads < 0.60 s — above that the host
is contended and the numbers are noise.  The script probes the sentinel
before each pass and waits (up to --max-wait) for the host to go idle;
if it never does, the artifact is still written but carries
"sentinel_gated": false so no cross-round claim may rest on it.

Usage:
    python scripts/make_scaled_replica.py --src /root/testdata/sf0.1 \
        --out /root/repo/.scale/sf1 --factor 10   # once
    python scripts/bench_sf1.py [--out BENCH_SF1_rN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SENTINEL_GATE_SEC = 0.60

# pinned at r12 HEAD: the 20 largest medians in bench_out.json (sf0.1)
BASKET_SF1 = [
    "brand_clustering_coefficient",
    "brand_harmonic_centrality",
    "brand_triple_support",
    "dedup_clusters_incremental",
    "degree_assortativity",
    "good_turing_discounts",
    "hits_hub_authority",
    "item_item_cf_topk",
    "ivf_pq_rerank_top5",
    "kcore_peeling",
    "link_prediction_suppliers",
    "market_basket_pairs",
    "negative_sampling_recs",
    "pagerank_sim_graph",
    "pq_rerank_top5",
    "prf_rocchio_top10",
    "semantic_dup_clusters",
    "set_cover_source_picks",
    "sparse_cosine_pairs",
    "zipf_octave_profile",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scale/sf1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--max-wait", type=float, default=600.0,
        help="seconds to wait for an idle host before recording ungated",
    )
    args = ap.parse_args()

    from bench import _sentinel  # the FROZEN host-speed job
    from zeta_etl_spark.queries.registry import REGISTRY, T
    from zeta_etl_spark.session import get_spark

    spark = get_spark(app_name="zeta-etl-bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf_dir

    # warm probes (same two cold paths bench.py warms)
    REGISTRY["pricing_summary"].fn(spark, sf_dir).count()
    T(spark, sf_dir, "embeddings").selectExpr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), "
        "cast(0.0 as double), (a, v) -> a + v) AS s"
    ).agg({"s": "sum"}).collect()

    # dedup_clusters_incremental runs in its production shape: durable
    # label state materialized once (diagnostics), increment job timed
    from zeta_etl_spark.pipelines.dedup import build_cc_state_pipeline
    from zeta_etl_spark.queries.dedup_q import (
        _INCR_SPLIT,
        maintain_cluster_labels,
    )

    diagnostics: dict[str, float] = {}
    mh_dir = tempfile.mkdtemp(prefix="bench_sf1_")
    gated = True
    try:
        docs = T(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        build_cc_state_pipeline(
            spark, mh_dir, docs.filter(f"NOT ({_INCR_SPLIT})")
        ).run(spark, targets=["old_labels"])
        diagnostics["cc_old_labels_materialize"] = round(
            time.perf_counter() - t0, 3
        )
        old_labels = spark.read.parquet(
            os.path.join(mh_dir, "old_labels")
        )
        n_part = spark.sparkContext.defaultParallelism

        names = sorted(n for n in BASKET_SF1 if n in REGISTRY)
        rep_times: dict[str, list[float]] = {n: [] for n in names}
        sentinel_times: list[float] = []
        deadline = time.monotonic() + args.max_wait
        for _rep in range(args.reps):
            # sentinel gate: wait for an idle host before each pass
            while True:
                t0 = time.perf_counter()
                _sentinel(spark)
                s = time.perf_counter() - t0
                if s < SENTINEL_GATE_SEC or time.monotonic() > deadline:
                    if s >= SENTINEL_GATE_SEC:
                        gated = False  # recorded contended — flag it
                    sentinel_times.append(s)
                    break
                time.sleep(15.0)
            for name in names:
                t0 = time.perf_counter()
                if name == "dedup_clusters_incremental":
                    df = maintain_cluster_labels(
                        docs.repartition(n_part, "doc_id"),
                        old_labels,
                        _INCR_SPLIT,
                    )
                else:
                    df = REGISTRY[name].fn(spark, sf_dir)
                assert df.count() >= 0
                rep_times[name].append(time.perf_counter() - t0)
    finally:
        shutil.rmtree(mh_dir, ignore_errors=True)

    timings, spread = {}, {}
    for name, ts in rep_times.items():
        timings[name] = round(sorted(ts)[len(ts) // 2], 3)
        spread[name] = round(max(ts) / max(min(ts), 1e-9), 2)
    total = round(sum(timings.values()), 3)
    sentinel_sec = round(
        sorted(sentinel_times)[len(sentinel_times) // 2], 3
    )
    spread_vals = sorted(spread.values())
    out = {
        "metric": "sf1_basket_wall_time",
        "value": total,
        "unit": "sec",
        "sf": 1.0,
        "queries": timings,
        "diagnostics": diagnostics,
        "n_queries": len(timings),
        "reps": args.reps,
        "sentinel_sec": sentinel_sec,
        "sentinel_gate_sec": SENTINEL_GATE_SEC,
        "sentinel_gated": gated,
        "total_per_sentinel": round(total / sentinel_sec, 2),
        "median_maxmin_ratio": spread_vals[len(spread_vals) // 2],
        "p90_maxmin_ratio": spread_vals[int(len(spread_vals) * 0.9)],
        "per_query_maxmin_ratio": spread,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
