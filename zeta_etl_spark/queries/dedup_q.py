"""Deduplication queries over `documents`: exact content-hash dedup, direct
n-gram (shingle) Jaccard near-dup pairs, MinHash+LSH with exact verification,
SimHash fingerprints and near-pairs.

Beyond-reference scale operators (BASELINE.json north star).  All hashing is
md5-based so the DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import (
    duck_hex2long,
    duck_shingles,
    spark_hex2long,
)
from zeta_etl_spark.operators.dedup import (
    MAX_LONG,
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_jaccard_pairs,
    simhash,
)
from zeta_etl_spark.queries.registry import T, query

# --- exact_dedup_docs -------------------------------------------------------

_EXACT_ORACLE = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


@query("exact_dedup_docs", oracle=_EXACT_ORACLE, tags=("dedup", "exact"))
def exact_dedup_docs(spark, sf_dir):
    return exact_dedup(T(spark, sf_dir, "documents"), "text", "doc_id")


# --- ngram_jaccard_pairs: inverted-index shingle join -----------------------
# Pairs sharing ≥1 5-shingle with exact Jaccard ≥ 0.2.  The inverted index
# bounds the join to shingle collisions (no |docs|² blowup); at 100 TB the
# LSH variant below replaces this when shingle collisions are too dense.

_NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {duck_shingles()} AS shingles FROM documents
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), sizes AS (
  SELECT doc_id, len(shingles) AS n_shingles FROM sh
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
  CAST(c.n_common AS BIGINT) AS n_common,
  CAST(c.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - c.n_common)
    AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - c.n_common)
      >= 0.2
"""


@query("ngram_jaccard_pairs", oracle=_NGRAM_ORACLE, tags=("dedup", "jaccard"))
def ngram_jaccard_pairs(spark, sf_dir):
    from zeta_etl_spark.operators.dedup import shingle_jaccard_pairs

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return shingle_jaccard_pairs(d, min_jaccard=0.2)


# --- minhash_lsh_pairs: MinHash signatures → banded LSH → exact verify ------

_NUM_PERM = 16
_BANDS = 4
_ROWS = 4


def _minhash_oracle() -> str:
    from zeta_etl_spark.operators.dedup import MINHASH_PRIME, minhash_params

    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for a, b in minhash_params(_NUM_PERM)
    )
    band_selects = []
    for b in range(_BANDS):
        cols = " || ',' || ".join(
            f"CAST(signature[{b * _ROWS + r + 1}] AS VARCHAR)" for r in range(_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    est = (
        "CAST(list_sum(list_transform(range(1, "
        + str(_NUM_PERM + 1)
        + "), i -> CASE WHEN sa.signature[i] = sb.signature[i] THEN 1 ELSE 0 END)) "
        + f"AS DOUBLE) / {_NUM_PERM}"
    )
    shingle_hash = duck_hex2long("s", digits=8)
    # r9 sf10 sweep: DuckDB re-evaluates a CTE per reference — ``sig``
    # (16 minhash perms over every shingle list) is referenced by all
    # 16 band selects plus two scoring joins; MATERIALIZED pins one
    # evaluation per CTE, values unchanged.
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, {duck_shingles()} AS shingles FROM documents
), sigsrc AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {shingle_hash}) AS hs FROM sh
), sig AS MATERIALIZED (
  SELECT doc_id, len(shingles) AS n_shingles, [{sig_items}] AS signature
  FROM sigsrc
), bands AS MATERIALIZED (
  {bands_sql}
), cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
), common AS (
  SELECT c.doc_a, c.doc_b,
    CAST(len(list_intersect(sha.shingles, shb.shingles)) AS BIGINT) AS n_common
  FROM cand c
  JOIN sh sha ON sha.doc_id = c.doc_a
  JOIN sh shb ON shb.doc_id = c.doc_b
)
SELECT c.doc_a, c.doc_b,
  cm.n_common,
  CAST(cm.n_common AS DOUBLE)
    / (sa.n_shingles + sb.n_shingles - cm.n_common) AS jaccard,
  {est} AS est_sim
FROM cand c
JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
"""


def score_candidate_pairs(pairs, sigs, docs):
    """Exact-Jaccard verification + signature est_sim for a candidate pair
    frame — the scoring tail shared by the full self-join path
    (:func:`lsh_verified_pairs`) and the incremental batch path
    (:func:`minhash_incremental_pairs`)."""
    verified = jaccard_verify(pairs, docs)
    sig_a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a")
    )
    sig_b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b")
    )
    est = (
        F.expr(
            "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, "
            "(acc, v) -> acc + v)"
        ).cast("double")
        / _NUM_PERM
    )
    return (
        verified.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select("doc_a", "doc_b", "n_common", "jaccard", est.alias("est_sim"))
    )


def lsh_verified_pairs(sigs, docs, max_bucket_size=None):
    """Band-bucket candidate pairs + exact-Jaccard verification + est_sim,
    given a signature frame (``minhash_signatures`` output — live, cached,
    or read back from a materialized silver table) and the raw docs.

    This is the seam the production pipeline materializes at: signatures are
    a 16-bigint-per-doc silver table feeding band join, est_sim join (×2)
    and verification (`pipelines/dedup.py`).

    ``max_bucket_size`` passes the adversarial-skew hot-bucket cap through
    to :func:`lsh_candidate_pairs` (None = exact LSH semantics, the
    oracle-compared default)."""
    pairs = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS,
        max_bucket_size=max_bucket_size,
    )
    return score_candidate_pairs(pairs, sigs, docs)


@query("minhash_lsh_pairs", oracle=_minhash_oracle(), tags=("dedup", "minhash", "lsh"))
def minhash_lsh_pairs(spark, sf_dir):
    # documents arrive as a single parquet file → 1 input partition; the md5
    # signature chain is CPU-bound, so spread it across the cluster first
    # (at 100 TB the source is naturally multi-file and this is a no-op cost)
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # signatures feed the band join, est_sim join (×2) and verification —
    # persist so the shingle+md5 chain runs once (at cluster scale this is a
    # materialized silver table, exactly like the reference's medallion
    # nodes — see pipelines/dedup.py for that production shape).  Measured
    # note: caching the raw SHINGLE arrays instead (to share one text pass
    # with verification) regressed ~30% at sf0.1 — materializing wide string
    # arrays costs more than recomputing the md5 chain; signatures (16
    # bigints/doc) are the right cache grain.
    sigs = minhash_signatures(d, num_perm=_NUM_PERM).cache()
    return lsh_verified_pairs(sigs, d)


# --- minhash_incremental_pairs: new-batch-vs-corpus dedup -------------------
# Production dedup is INCREMENTAL: the corpus signature silver is durable and
# each arriving batch compares only against it (batch×corpus ∪ batch×batch);
# the quadratic corpus×corpus term was emitted by previous runs and is
# structurally excluded from the join.  The batch here is the deterministic
# 20% slice doc_id % 10 < 2 (stands in for "today's increment"); the oracle
# is the FULL recompute restricted to pairs touching the batch — proving the
# incremental join finds exactly the pairs a from-scratch run would.

_NEW_BATCH_PRED = "doc_id % 10 < 2"

_INCR_ORACLE = f"""
SELECT * FROM ({_minhash_oracle()}) _full
WHERE (doc_a % 10 < 2) OR (doc_b % 10 < 2)
"""


@query(
    "minhash_incremental_pairs",
    oracle=_INCR_ORACLE,
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def minhash_incremental_pairs(spark, sf_dir):
    from zeta_etl_spark.operators.dedup import incremental_lsh_candidate_pairs

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    corpus = d.filter(f"NOT ({_NEW_BATCH_PRED})")
    batch = d.filter(_NEW_BATCH_PRED)
    # corpus signatures stand in for the materialized silver
    # (pipelines/dedup.build_incremental_minhash_pipeline reads them from
    # durable parquet); batch signatures are the only fresh corpus text pass
    corpus_sigs = minhash_signatures(corpus, num_perm=_NUM_PERM).cache()
    batch_sigs = minhash_signatures(batch, num_perm=_NUM_PERM).cache()
    pairs = incremental_lsh_candidate_pairs(
        corpus_sigs, batch_sigs, bands=_BANDS, rows_per_band=_ROWS
    )
    all_sigs = corpus_sigs.unionByName(batch_sigs)
    return score_candidate_pairs(pairs, all_sigs, d)


# --- simhash_docs + near-pairs ----------------------------------------------


def _simhash_duck_expr() -> str:
    th = (
        "list_transform(list_distinct(string_split(text, ' ')), t -> "
        + duck_hex2long("t", digits=8)
        + ")"
    )
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(th, h -> ((h >> {j}) & 1) * 2 - 1)) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(32)
    )
    return f"WITH t AS (SELECT doc_id, {th} AS th FROM documents)\nSELECT doc_id, {terms} AS simhash FROM t"


_SIMHASH_ORACLE = _simhash_duck_expr()


@query("simhash_docs", oracle=_SIMHASH_ORACLE, tags=("dedup", "simhash"))
def simhash_docs(spark, sf_dir):
    return simhash(T(spark, sf_dir, "documents"))


_SIMHASH_PAIRS_ORACLE = f"""
WITH base AS ({_SIMHASH_ORACLE}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM base a
  JOIN base b ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6
"""


@query("simhash_near_pairs", oracle=_SIMHASH_PAIRS_ORACLE, tags=("dedup", "simhash"))
def simhash_near_pairs(spark, sf_dir):
    base = simhash(T(spark, sf_dir, "documents"))
    a = base.alias("a")
    b = base.alias("b")
    # bucket on the high 16 bits (LSH-style prefix blocking), verify hamming
    pairs = a.join(
        b,
        (F.shiftright(F.col("a.simhash"), 16) == F.shiftright(F.col("b.simhash"), 16))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(
            F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
        ).cast("bigint").alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= 6)


# --- dedup_clusters: connected components over the near-dup pair graph ------
# Pair detection (MinHash/n-gram Jaccard) yields EDGES; production dedup
# needs the transitive closure — each document labeled with its component's
# minimum doc_id (the canonical copy).  Spark side:
# operators.dedup.connected_components — iterative min-label propagation
# with per-round localCheckpoint + unpersist so lineage and executor storage
# stay bounded regardless of component diameter (VERDICT r2 wrong-1).
# Oracle: a recursive CTE computing reachability-minimum per node.  Edges
# are the exact-Jaccard near-dup pairs (same threshold as
# ngram_jaccard_pairs), a deterministic non-empty graph on the test corpus.

_CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) _np
), edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS doc_id FROM edges
), reach AS (
  SELECT doc_id, doc_id AS peer FROM nodes
  UNION
  SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON r.peer = e.src
)
SELECT doc_id, MIN(peer) AS cluster_id,
  COUNT(*) AS cluster_size
FROM reach GROUP BY doc_id
"""


@query(
    "dedup_clusters",
    oracle=_CLUSTER_ORACLE,
    tags=("dedup", "graph", "iterative"),
)
def dedup_clusters(spark, sf_dir):
    # star contraction (O(log n) rounds); operators.dedup.connected_components
    # (min-label) is the operator-level twin asserted equal in
    # tests/test_scale_ops.py
    from zeta_etl_spark.operators.dedup import connected_components_star

    # cache: CC's symmetrizing union would re-execute the inverted-index
    # shingle join once per branch (same fix as semantic_dup_clusters)
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").cache()
    labels = connected_components_star(pairs, src="doc_a", dst="doc_b")
    pairs.unpersist()  # CC checkpointed its labels eagerly; pairs is dead
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


# --- dedup_clusters_incremental: absorb a new batch into existing clusters --
# The label-maintenance half of incremental dedup: old docs' clusters are
# already labeled (previous runs); a new batch contributes only the pairs
# touching it (exactly what minhash_incremental_pairs emits), and labels are
# updated by contracting old components to their labels and running CC on
# the tiny label graph — the old corpus edge set is never re-read.  The
# oracle is the FULL from-scratch recompute (same recursive CTE as
# dedup_clusters): incremental maintenance must be invisible in the result.

_INCR_SPLIT = "doc_id % 10 < 2"  # same deterministic batch as minhash_incr


@query(
    "dedup_clusters_incremental",
    oracle=_CLUSTER_ORACLE,
    tags=("dedup", "graph", "iterative", "incremental"),
)
def dedup_clusters_incremental(spark, sf_dir):
    from zeta_etl_spark.operators.dedup import (
        connected_components_star,
        shingle_jaccard_pairs,
    )

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    old_docs = d.filter(f"NOT ({_INCR_SPLIT})")
    # cache: CC's symmetrizing union would run the shingle join per branch
    old_pairs = shingle_jaccard_pairs(old_docs, min_jaccard=0.2).select(
        "doc_a", "doc_b"
    ).cache()
    old_labels = connected_components_star(
        old_pairs, src="doc_a", dst="doc_b"
    )
    old_pairs.unpersist()  # labels are eagerly checkpointed
    return maintain_cluster_labels(d, old_labels, _INCR_SPLIT)


def maintain_cluster_labels(docs, old_labels, batch_pred: str):
    """The INCREMENT job shared by the registry query and the pipeline
    gold (`pipelines/dedup.build_incremental_cc_pipeline`): batch-bounded
    pair generation + label-graph CC maintenance + sizes.  The registry
    query recomputes ``old_labels`` inline so the oracle comparison stays
    self-contained; the pipeline reads them from the durable state silver,
    so production (and the bench) pays ONLY this function's cost per
    increment — VERDICT r5 next-3."""
    from zeta_etl_spark.operators.dedup import (
        incremental_connected_components,
        shingle_jaccard_pairs,
    )

    # cache: the pair frame is consumed 4× downstream (label-edge build,
    # the new-node union's two branches, and the sizes join re-walking
    # labels) — without it the whole inverted-index pair join re-executes
    # per consumer (measured 57.9 s vs 7.5 s intrinsic at sf1).  Bounded:
    # only pairs touching the batch.
    new_pairs = shingle_jaccard_pairs(
        docs, min_jaccard=0.2, touching=batch_pred
    ).select("doc_a", "doc_b").cache()
    labels = incremental_connected_components(
        old_labels, new_pairs, src="doc_a", dst="doc_b"
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


# --- edit_distance_pairs: character-level verification of near-dup pairs ----
# A second verification lens for the LSH candidates: Levenshtein distance on
# the raw text plus a normalized similarity.  Classic DP edit distance is
# integer-exact and both engines implement it identically — a rare
# cross-engine-safe string metric.  Cost is bounded by the candidate set
# (jaccard pairs), never |docs|².

_EDIT_ORACLE = f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) _np
)
SELECT p.doc_a, p.doc_b,
  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
  1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
      / GREATEST(len(a.text), len(b.text)) AS edit_sim
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
"""


@query(
    "edit_distance_pairs",
    oracle=_EDIT_ORACLE,
    tags=("dedup", "levenshtein", "verify"),
)
def edit_distance_pairs(spark, sf_dir):
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    d = T(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein("text_a", "text_b")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.cast("bigint").alias("edit_dist"),
            (
                F.lit(1.0)
                - lev.cast("double")
                / F.greatest(F.length("text_a"), F.length("text_b"))
            ).alias("edit_sim"),
        )
    )


# --- near_dup_triangles: triangle census of the near-dup graph ---------------
# Graph-analytics lens on dedup quality: a triangle (a,b,c) means three
# documents that are pairwise near-duplicates — dense triangle counts around
# a node indicate a template/boilerplate cluster rather than a one-off copy.
# Spark side: two self-joins over the (a < b) edge list with the a < b < c
# orientation, then a per-node participation count.  The edge basis is the
# candidate-restricted jaccard graph, so the join input is |near-dup pairs|,
# not |docs|²; at larger scale the standard degree-ordered orientation
# applies unchanged (edges already flow low→high doc_id).

_TRIANGLE_ORACLE = f"""
WITH pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) _np
), tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.doc_a = e1.doc_b
  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
), nodes AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, COUNT(*) AS n_triangles
FROM nodes GROUP BY doc_id
"""


@query("near_dup_triangles", oracle=_TRIANGLE_ORACLE, tags=("dedup", "graph"))
def near_dup_triangles(spark, sf_dir):
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").cache()
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    nodes = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return nodes.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))


# --- normalized_exact_dedup: canonicalized-text exact dedup ------------------
# Exact dedup on the RAW text misses trivially-reformatted copies (case,
# punctuation, whitespace).  The standard fix is a canonicalization key:
# lower → strip non-alphanumerics → collapse runs of spaces → trim, then
# hash.  Same one-shuffle map-side-combined shape as exact_dedup_docs; the
# regex subset ([^a-z0-9 ], ' +') is identical in Java and RE2 flavors.
# NOTE the cross-engine trap: DuckDB regexp_replace replaces the FIRST
# match unless the 'g' flag is passed; Spark always replaces all.

_NORM_SPARK = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), "
    "' +', ' '))"
)
_NORM_DUCK = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
    "' +', ' ', 'g'))"
)

_NORM_DEDUP_ORACLE = f"""
SELECT md5({_NORM_DUCK}) AS norm_hash, MIN(doc_id) AS doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY md5({_NORM_DUCK})
"""


@query(
    "normalized_exact_dedup",
    oracle=_NORM_DEDUP_ORACLE,
    tags=("dedup", "exact", "normalize"),
)
def normalized_exact_dedup(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    h = F.md5(F.expr(_NORM_SPARK))
    return d.groupBy(h.alias("norm_hash")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --- lsh_eval_metrics: self-evaluating dedup quality -------------------------
# Precision/recall of the banded-LSH candidate generator against exact
# ground truth at Jaccard >= 0.2, in ONE report row — the measurement a
# production dedup pipeline publishes with every corpus build so LSH
# parameter drift (bands x rows vs corpus density) is caught by a gate,
# not by eyeballing.  Truth comes from the bounded inverted-index exact
# path (shingle_jaccard_pairs — candidates only, never all-pairs); hits
# are simply the LSH-verified pairs above the threshold, since both paths
# share the same exact-Jaccard verifier.

_EVAL_TAU = 0.2

# Oracle scale note (r9, sf10 sweep): the previous form used five scalar
# subqueries over the lsh/tru CTEs, and DuckDB re-evaluates a CTE per
# scalar-subquery reference EVEN UNDER AS MATERIALIZED (the r8 session-5
# finding) — five evaluations of the minhash/ngram pair joins ground past
# the watchdog.  One aggregate per CTE + a one-row cross join computes
# the identical values with one evaluation each.
_EVAL_ORACLE = f"""
WITH lsh AS (
  SELECT jaccard FROM ({_minhash_oracle()}) _l
), tru AS (
  SELECT doc_a FROM ({_NGRAM_ORACLE.replace(">= 0.2", f">= {_EVAL_TAU}")}) _t
), l AS (
  SELECT COUNT(*) AS n_candidates,
    COUNT(*) FILTER (WHERE jaccard >= {_EVAL_TAU}) AS n_hits
  FROM lsh
), t AS (
  SELECT COUNT(*) AS n_true_pairs FROM tru
)
SELECT
  l.n_candidates,
  t.n_true_pairs,
  l.n_hits,
  CAST(l.n_hits AS DOUBLE)
    / NULLIF(CAST(l.n_candidates AS DOUBLE), 0) AS precision_at_tau,
  CAST(l.n_hits AS DOUBLE)
    / NULLIF(CAST(t.n_true_pairs AS DOUBLE), 0) AS recall_at_tau
FROM l CROSS JOIN t
"""


@query("lsh_eval_metrics", oracle=_EVAL_ORACLE, tags=("dedup", "eval", "lsh"))
def lsh_eval_metrics(spark, sf_dir):
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sigs = minhash_signatures(d, num_perm=_NUM_PERM).cache()
    lsh = lsh_verified_pairs(sigs, d).select("jaccard")
    tru = shingle_jaccard_pairs(d, min_jaccard=_EVAL_TAU).select("doc_a")
    # one pass over the expensive LSH-verify lineage produces BOTH counts
    # (a separate filtered aggregate would re-execute the candidate join +
    # exact-Jaccard verification — review finding)
    lsh_counts = lsh.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count(F.when(F.col("jaccard") >= _EVAL_TAU, 1)).alias("n_hits"),
    )
    n_true = tru.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    out = lsh_counts.crossJoin(n_true)
    return out.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        (
            F.col("n_hits").cast("double")
            / F.nullif(F.col("n_candidates").cast("double"), F.lit(0.0))
        ).alias("precision_at_tau"),
        (
            F.col("n_hits").cast("double")
            / F.nullif(F.col("n_true_pairs").cast("double"), F.lit(0.0))
        ).alias("recall_at_tau"),
    )


# --- cross_source_dup_matrix: inter-source contamination ---------------------
# Near-dup pairs rolled up by SOURCE pair — the crawl-overlap /
# cross-feed-contamination matrix a corpus owner reads before blending
# sources.  Reuses the bounded inverted-index exact-Jaccard pair
# generator; the source lookup joins the (small) pair frame back to the
# doc→source projection, and the (source_a, source_b) key is canonically
# ordered so the matrix is upper-triangular.

_XSRC_ORACLE = f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) _p
), lab AS (
  SELECT p.doc_a, p.doc_b, da.source AS src_a, db.source AS src_b
  FROM pairs p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b
)
SELECT LEAST(src_a, src_b) AS source_a,
  GREATEST(src_a, src_b) AS source_b,
  CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
FROM lab GROUP BY 1, 2
"""


@query(
    "cross_source_dup_matrix", oracle=_XSRC_ORACLE, tags=("dedup", "audit")
)
def cross_source_dup_matrix(spark, sf_dir):
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = shingle_jaccard_pairs(d, min_jaccard=0.2).select("doc_a", "doc_b")
    src = d.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
            ),
            "doc_a",
        ).join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
            ),
            "doc_b",
        )
    )
    return lab.groupBy(
        F.least("src_a", "src_b").alias("source_a"),
        F.greatest("src_a", "src_b").alias("source_b"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"))
