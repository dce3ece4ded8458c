"""Optimization-round measurement harness (guide §1).

For each named registry query:
  - capture ``df.explain("formatted")`` into plans/r13/<name>_<tag>.txt
  - time the computation against the noop sink (guide §1.4) N reps,
    labelled via setJobDescription (guide §1.5), report per-query medians.

Usage:
    python scripts/opt_measure.py --tag before --reps 3 \
        [--sf-dir /root/testdata/sf0.1] name1 name2 ...
    python scripts/opt_measure.py --tag before --plans-only name1 ...

Timing methodology matches bench.py (interleaved full passes, median of
reps) but swaps the action: ``df.write.format("noop")`` computes every
column of every row, where bench.py's ``count()`` lets the optimizer prune
— both are recorded in OPTIMIZATION_r13.md, the bench.py numbers stay the
cross-round artifact.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zeta_etl_spark.queries import REGISTRY  # noqa: E402
from zeta_etl_spark.session import get_spark  # noqa: E402

DEFAULT_PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument(
        "--final-plans",
        action="store_true",
        help="execute each query once (collect) and capture the FINAL "
        "adaptive plan (isFinalPlan=true) instead of the initial one — "
        "AQE join-strategy rewrites (SMJ→SHJ/BHJ) only appear there",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--plans-dir", default=DEFAULT_PLANS_DIR)
    args = ap.parse_args()

    plans_dir = args.plans_dir
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in args.names if n in REGISTRY]
    missing = [n for n in args.names if n not in REGISTRY]
    if missing:
        print(f"WARNING: not in registry: {missing}", file=sys.stderr)

    # warm probes as in bench.py: one relational, one HOF-over-arrays
    REGISTRY["pricing_summary"].fn(spark, args.sf_dir).count()
    from zeta_etl_spark.queries.registry import T

    T(spark, args.sf_dir, "embeddings").selectExpr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), "
        "cast(0.0 as double), (a, v) -> a + v) AS s"
    ).agg({"s": "sum"}).collect()

    for name in names:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        if args.final_plans:
            # Dataset.collect() runs the DataFrame's OWN QueryExecution, so
            # the handle's executedPlan afterwards is the final adaptive
            # plan — a noop write or count() would execute a clone instead.
            df.collect()
        path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(capture_plan(df))
        print(f"plan -> {path}")

    results: dict[str, list[float]] = {n: [] for n in names}
    if not args.plans_only:
        for _rep in range(args.reps):
            for name in names:
                spark.sparkContext.setJobDescription(f"opt:{name}")
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                results[name].append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        med = {
            n: sorted(ts)[len(ts) // 2] for n, ts in results.items()
        }
        summary = {
            "tag": args.tag,
            "sf_dir": args.sf_dir,
            "reps": args.reps,
            "median_sec": med,
            "all_sec": results,
        }
        line = json.dumps(summary)
        print(line)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
