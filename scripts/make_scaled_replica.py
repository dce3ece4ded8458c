"""Build an N× scaled replica of a testdata scale-factor directory.

Usage:
    python scripts/make_scaled_replica.py [--src /root/testdata/sf0.1] \
        [--out /root/repo/.scale/sf1] [--factor 10]

Then:  SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 python bench.py

Construction = the round-5 "uniform" recipe (PERF.md), the one that holds
similarity DENSITY constant while scaling volume — naive replication makes
dedup/ANN corpora adversarially denser (clone-dense) and random fresh
vectors collide quadratically at 64 dims, both of which distort scaling
ratios:

- star schema: each clone shifts every key by clone × (max_key + 1), so
  referential integrity holds clone-locally and join fan-outs stay
  constant per key.
- events: user_id / event_id shifted per clone, ts untouched — user count
  grows 10×, per-user series length (window/sessionization work per key)
  stays constant; hourly buckets get 10× rows (horizontal growth).
- documents: per-clone vocabulary suffix on every whitespace token —
  shingle/minhash structure inside a clone is isomorphic to the original,
  cross-clone Jaccard is exactly 0; near-dup pair count grows linearly
  with the corpus, as in a real corpus ingesting disjoint batches.
- embeddings: per-clone deterministic sign-flip pattern per dimension —
  intra-clone cosines are EXACTLY preserved (same orthogonal transform),
  cross-clone similarities are scrambled; corpus 10×, per-query true
  neighbor structure constant.
- deterministic ids preserved mod 10/1000 (key offsets are multiples of
  10^3-divisible maxima where needed): the registry's literal predicates
  (query vectors ``vec_id < 10``, the increment split ``doc_id % 10 < 2``)
  keep their meaning — queries stay 10 rows, batch splits stay 20%.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zeta_etl_spark.datasets import load_table  # noqa: E402
from zeta_etl_spark.session import get_spark  # noqa: E402


def _offset(max_val: int) -> int:
    """Smallest power-of-10 multiple ≥ max_val + 1 that is divisible by
    1000 — keeps id-mod predicates (doc_id % 10, % 1000 splits) meaningful
    across clones."""
    base = 1000
    while base <= max_val:
        base *= 10
    return base


def build(src: str, out: str, factor: int) -> None:
    spark = get_spark(app_name="make-scaled-replica")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: {spark.read.parquet(os.path.join(out, name + '.parquet')).count()} rows")

    def clones(df, exprs_fn):
        parts = [exprs_fn(df, c) for c in range(factor)]
        outdf = parts[0]
        for p in parts[1:]:
            outdf = outdf.unionByName(p)
        return outdf

    # fixed dimensions: copy
    for name in ("region", "nation"):
        write(load_table(spark, src, name), name)

    maxes = {}
    for name, key in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                      ("part", "p_partkey"), ("orders", "o_orderkey"),
                      ("events", "event_id"), ("documents", "doc_id"),
                      ("embeddings", "vec_id")]:
        maxes[name] = _offset(
            load_table(spark, src, name).agg(F.max(key)).first()[0]
        )
    max_user = _offset(
        load_table(spark, src, "events").agg(F.max("user_id")).first()[0]
    )

    k_cust, k_supp, k_part, k_ord = (
        maxes["customer"], maxes["supplier"], maxes["part"], maxes["orders"]
    )

    write(clones(load_table(spark, src, "customer"), lambda d, c: d.withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(c * k_cust))), "customer")
    write(clones(load_table(spark, src, "supplier"), lambda d, c: d.withColumn(
        "s_suppkey", F.col("s_suppkey") + F.lit(c * k_supp))), "supplier")
    write(clones(load_table(spark, src, "part"), lambda d, c: d.withColumn(
        "p_partkey", F.col("p_partkey") + F.lit(c * k_part))), "part")
    write(clones(load_table(spark, src, "orders"), lambda d, c: (
        d.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(c * k_ord))
         .withColumn("o_custkey", F.col("o_custkey") + F.lit(c * k_cust))
    )), "orders")
    write(clones(load_table(spark, src, "lineitem"), lambda d, c: (
        d.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(c * k_ord))
         .withColumn("l_partkey", F.col("l_partkey") + F.lit(c * k_part))
         .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(c * k_supp))
    )), "lineitem")
    write(clones(load_table(spark, src, "events"), lambda d, c: (
        d.withColumn("event_id", F.col("event_id") + F.lit(c * maxes["events"]))
         .withColumn("user_id", F.col("user_id") + F.lit(c * max_user))
    )), "events")

    # function words stay UNSUFFIXED: quality gates score stopword
    # evidence (gopher rules, doc_quality, the corpus pipeline), so a
    # replica that renames them flags every clone as low-quality and the
    # downstream dedup/pack stages silently shrink back to 1× — found
    # live on the first sf1 corpus-pipeline run.  Content words carry the
    # clone suffix, which still drives cross-clone shingle Jaccard to ~0
    # (a 5-shingle matches only if all 5 tokens are function words).
    keep_words = "'the','a','of','to','and','in','is','it'"

    def doc_clone(d, c):
        d = d.withColumn("doc_id", F.col("doc_id") + F.lit(c * maxes["documents"]))
        if c == 0:
            return d
        d = d.withColumn(
            "text",
            F.expr(
                f"concat_ws(' ', transform(split(text, ' '), "
                f"t -> if(t in ({keep_words}), t, concat(t, '_c{c}'))))"
            ),
        )
        return d.withColumn("n_chars", F.length("text").cast("bigint"))

    write(clones(load_table(spark, src, "documents"), doc_clone), "documents")

    def emb_clone(d, c):
        d = d.withColumn("vec_id", F.col("vec_id") + F.lit(c * maxes["embeddings"]))
        if c == 0:
            return d
        # deterministic per-(clone, dim) sign flip: an orthogonal transform
        # shared by the whole clone, so intra-clone cosines are unchanged
        return d.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> "
                f"if(pmod(hash({c}, i), 2) = 0, x, -x))"
            ),
        )

    write(clones(load_table(spark, src, "embeddings"), emb_clone), "embeddings")
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    build(args.src, args.out, args.factor)
