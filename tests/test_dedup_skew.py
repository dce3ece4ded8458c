"""Adversarial-skew hardening for the LSH band join (VERDICT r6 next-4).

A pathological corpus — one piece of boilerplate duplicated 10⁵× — puts
10⁵ members into a single band bucket; the uncapped self-join would emit
~5·10⁹ candidate pairs from that one key (quadratic in the bucket, all on
one shuffle task).  ``max_bucket_size`` skips such buckets before the join.

Recall contract pinned here: a capped run loses only pairs whose EVERY
shared bucket is hot; after an exact-dup pre-pass (which collapses an
identical-text cluster to one representative) the cap costs no recall.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from zeta_etl_spark.operators.dedup import (
    exact_dedup,
    incremental_lsh_candidate_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)

BOILERPLATE = (
    "terms of service apply to all users of this site please read "
    "carefully before proceeding all rights reserved by the operator "
    "of this site and its affiliates worldwide"
)
DOC_A = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the late afternoon sun of a quiet day"
)
DOC_B = (
    "completely different content about distributed query engines and "
    "columnar storage formats for large scale analytical processing of "
    "event data streams in modern warehouses"
)


def _hot_corpus(spark, n_hot: int):
    """n_hot identical boilerplate docs + two genuine near-dup pairs with
    distinct texts (each pair shares all its band buckets; bucket size 2)."""
    hot = spark.range(n_hot).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.lit(BOILERPLATE).alias("text"),
    )
    base = 10_000_000
    genuine = spark.createDataFrame(
        [
            (base + 1, DOC_A),
            (base + 2, DOC_A),
            (base + 3, DOC_B),
            (base + 4, DOC_B),
        ],
        "doc_id bigint, text string",
    )
    return hot.unionByName(genuine)


def test_planted_hot_cluster_completes_with_bounded_candidates(spark):
    """10⁵-doc identical cluster: the capped join completes (uncapped would
    attempt ~5·10⁹ pairs per band) and still finds every pair that shares
    an under-cap bucket."""
    docs = _hot_corpus(spark, 100_000).repartition(8, "doc_id")
    sigs = minhash_signatures(docs).cache()
    t0 = time.perf_counter()
    pairs = lsh_candidate_pairs(sigs, max_bucket_size=1000)
    got = sorted((r.doc_a, r.doc_b) for r in pairs.collect())
    wall = time.perf_counter() - t0
    sigs.unpersist()
    base = 10_000_000
    assert got == [(base + 1, base + 2), (base + 3, base + 4)]
    # bounded: the hot bucket contributed ZERO candidates, and the job
    # finished in join-two-small-buckets time, not 5e9-pair time
    assert wall < 300


def test_exact_dedup_prepass_absorbs_hot_cluster(spark):
    """The sanctioned composition: exact dedup first — the identical-text
    cluster collapses to ONE representative, after which the capped LSH
    pass loses no recall at all (cap semantics documented in
    _cap_hot_buckets)."""
    docs = _hot_corpus(spark, 50_000)
    reps = exact_dedup(docs, "text", "doc_id").select("doc_id")
    deduped = docs.join(reps, "doc_id").repartition(8, "doc_id")
    assert deduped.count() == 3  # boilerplate rep + one rep per genuine text
    sigs = minhash_signatures(deduped).cache()
    capped = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, max_bucket_size=1000).collect()
    )
    uncapped = sorted(
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()
    )
    sigs.unpersist()
    assert capped == uncapped  # zero recall cost post-pre-pass


def test_cap_is_identity_when_no_bucket_is_hot(spark):
    """On a benign corpus every bucket is under the cap → identical output
    to exact LSH (the oracle-compared default)."""
    docs = spark.createDataFrame(
        [
            (1, DOC_A),
            (2, DOC_A),
            (3, DOC_B),
            (4, DOC_B),
            (5, BOILERPLATE),
        ],
        "doc_id bigint, text string",
    )
    sigs = minhash_signatures(docs).cache()
    capped = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, max_bucket_size=100).collect()
    )
    uncapped = sorted(
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()
    )
    sigs.unpersist()
    assert capped == uncapped and capped  # non-vacuous


def test_incremental_cap_bounds_combined_bucket(spark):
    """Incremental form: the batch×corpus fan-out for a bucket is the
    PRODUCT of the two sides, so the cap applies to the combined
    population — a small batch colliding with a 10⁴-doc hot corpus bucket
    is still skipped."""
    corpus = spark.range(10_000).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.lit(BOILERPLATE).alias("text"),
    )
    base = 10_000_000
    batch = spark.createDataFrame(
        [
            (base + 1, BOILERPLATE),  # collides with the hot corpus bucket
            (base + 2, DOC_A),
            (base + 3, DOC_A),
        ],
        "doc_id bigint, text string",
    )
    c_sigs = minhash_signatures(corpus).cache()
    b_sigs = minhash_signatures(batch).cache()
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in incremental_lsh_candidate_pairs(
            c_sigs, b_sigs, max_bucket_size=1000
        ).collect()
    )
    c_sigs.unpersist()
    b_sigs.unpersist()
    # hot-bucket contact dropped; the within-batch genuine pair survives
    assert got == [(base + 2, base + 3)]


def test_cap_validation(spark):
    docs = spark.createDataFrame(
        [(1, DOC_A)], "doc_id bigint, text string"
    )
    sigs = minhash_signatures(docs)
    with pytest.raises(ValueError, match="max_bucket_size"):
        lsh_candidate_pairs(sigs, max_bucket_size=1).collect()
