"""Second text/vector coverage batch: BPE-ish regex token counting,
winnowing (rolling-hash) fingerprints, embedding-cosine near-duplicate pairs
(BASELINE.json north-star operators).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- bpe_token_counts: whitespace vs BPE-ish regex tokenization --------------
# Portable token classes (identical in Java regex and RE2): letter runs,
# digit runs, single punctuation marks.

_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_BPE_ORACLE = f"""
SELECT doc_id, lang,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS BIGINT)
    AS n_bpe_tokens,
  CAST(length(text) AS DOUBLE)
    / len(regexp_extract_all(lower(text), '{_BPE_PATTERN}'))
    AS chars_per_token
FROM documents
"""


@query("bpe_token_counts", oracle=_BPE_ORACLE, tags=("text", "tokens", "bpe"))
def bpe_token_counts(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    bpe = F.expr(f"regexp_extract_all(lower(text), '{_BPE_PATTERN}', 0)")
    return d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        (F.length("text").cast("double") / F.size(bpe)).alias("chars_per_token"),
    )


# --- winnowing_fingerprints: MOSS-style rolling-hash document fingerprints ---
# k-shingle hashes → min per sliding window of w → distinct fingerprint set.
# Guarantees any shared substring of length ≥ k+w-1 tokens shares a
# fingerprint — the classic winnowing bound — with fingerprint density 2/(w+1).

_K = 3  # shingle tokens
_W = 4  # winnow window


def _winnow_oracle() -> str:
    h = duck_hex2long("s", digits=8)
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), hs AS (
  SELECT doc_id,
    list_transform(
      list_transform(range(0, greatest(len(toks) - {_K}, -1) + 1),
                     j -> array_to_string(toks[j + 1:j + {_K}], ' ')),
      s -> {h}) AS hashes
  FROM t
), fp AS (
  SELECT doc_id,
    list_distinct(list_transform(range(0, greatest(len(hashes) - {_W}, -1) + 1),
                  i -> list_min(hashes[i + 1:i + {_W}]))) AS fingerprints
  FROM hs
)
SELECT doc_id, CAST(len(fingerprints) AS BIGINT) AS n_fingerprints,
  CAST(list_min(fingerprints) AS BIGINT) AS min_fingerprint,
  md5(array_to_string(list_sort(fingerprints), ',')) AS fingerprint_digest
FROM fp
"""


@query("winnowing_fingerprints", oracle=_winnow_oracle(), tags=("text", "fingerprint", "winnowing"))
def winnowing_fingerprints(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    h = spark_hex2long("s", digits=8)
    toks = "split(text, ' ')"
    shingles = (
        f"case when size({toks}) >= {_K} then "
        f"transform(sequence(0, size({toks}) - {_K}), "
        f"j -> concat_ws(' ', slice({toks}, j + 1, {_K}))) "
        f"else cast(array() as array<string>) end"
    )
    hashes = f"transform({shingles}, s -> {h})"
    fingerprints = (
        f"array_distinct(case when size({hashes}) >= {_W} then "
        f"transform(sequence(0, size({hashes}) - {_W}), "
        f"i -> array_min(slice({hashes}, i + 1, {_W}))) "
        f"else cast(array() as array<bigint>) end)"
    )
    out = d.select("doc_id", F.expr(fingerprints).alias("fp"))
    return out.select(
        "doc_id",
        F.size("fp").cast("bigint").alias("n_fingerprints"),
        F.array_min("fp").cast("bigint").alias("min_fingerprint"),
        F.md5(
            F.array_join(
                F.expr("transform(array_sort(fp), x -> cast(x as string))"), ","
            )
        ).alias("fingerprint_digest"),
    )


# --- embedding_near_dups: cosine near-duplicate pairs (LSH-bucketed) ---------
# The embedding-space analogue of MinHash dedup: candidate pairs share a
# random-hyperplane bucket; exact integer cosine confirms ≥ threshold.
#
# THRESHOLD CALIBRATION (r11, closing the r10 verdict's `weak` mark): the
# synthetic embeddings are near-orthogonal random vectors — the maximum
# bucket-pair cosine is ~0.45/0.49/0.51 at sf0.001/0.01/0.1 — so the
# original 0.9 cut returned ZERO rows at every scale and the gate compared
# two empty sets (an off-by-semantics bug at the cut would have been
# invisible).  0.40 is this corpus's ~99.9th-percentile bucket-pair cosine:
# measured output is 2 / 4 / 58 pairs at sf0.001/0.01/0.1 — non-empty at
# every gate scale, so the >= boundary, the cosine arithmetic, and the
# bucket recall are all actually exercised, while the output stays bounded
# (tail pairs grow ~quadratically with corpus size, same as candidates).
# A production near-dup pass on REAL embeddings would use 0.85–0.95; the
# cut is a parameter, not a semantic.

_NEAR_THRESHOLD = 0.4
_ND_PLANES = 6


def _near_dup_oracle(threshold: float = _NEAR_THRESHOLD) -> str:
    from zeta_etl_spark.operators.vectors import (
        SCALE,
        duck_hyperplane_bucket_sql,
        hyperplane_params,
    )

    bucket = duck_hyperplane_bucket_sql(hyperplane_params(_ND_PLANES, 64))
    scaled = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} "
        "+ 0.5) AS BIGINT))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, {scaled} AS sv FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, sv, list_sum(list_transform(sv, x -> x * x)) AS norm2,
         {bucket} AS bucket
  FROM e
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    list_dot_product(a.sv, b.sv)
      / NULLIF(sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {threshold}
"""


def _cosine_bucket_pairs(spark, sf_dir, threshold):
    """LSH-bucketed candidate pairs with exact integer-dot cosine ≥ threshold.

    Shared plan seam for ``embedding_near_dups`` (calibrated 0.40 near-dup cut)
    and ``semantic_dup_clusters`` (looser similarity graph): one bucket
    equi-join — never all-pairs — then exact arithmetic on candidates only.

    SCALE KNOB (PERF.md round-5): with a FIXED plane count the expected
    candidate volume is n²/2^planes — quadratic in corpus size.  ``_ND_PLANES``
    must grow with log2(n) to hold per-bucket density constant (measured: 10×
    corpus at 6 planes → 103× candidates; at 10 planes → ~8× candidates,
    edge-build wall 3.4× for 10× data).  The constant stays 6 here because
    the oracle SQL embeds the same plane set and the driver gates at fixed
    sf; a deployment derives planes from the corpus count and, when recall
    matters at high plane counts, runs b banded tables exactly like the
    MinHash band join.
    """
    from zeta_etl_spark.operators.vectors import (
        hyperplane_params,
        lsh_bucket,
        scaled_vectors,
    )

    planes = hyperplane_params(_ND_PLANES, 64)
    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label")).withColumn(
        "_bucket", lsh_bucket("sv", planes)
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("sv").alias("sv_a"),
        F.col("norm2").alias("n_a"),
        "_bucket",
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("sv").alias("sv_b"),
        F.col("norm2").alias("n_b"),
        "_bucket",
    )
    dot = F.expr(
        "aggregate(zip_with(sv_a, sv_b, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("n_a").cast("double")) * F.sqrt(F.col("n_b").cast("double")),
        F.lit(0.0),
    )
    pairs = (
        a.join(b, ["_bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
    )
    return pairs.filter(F.col("cosine") >= threshold)


@query("embedding_near_dups", oracle=_near_dup_oracle(), tags=("vectors", "dedup"))
def embedding_near_dups(spark, sf_dir):
    return _cosine_bucket_pairs(spark, sf_dir, _NEAR_THRESHOLD)


# --- bm25_search_top10: full-text relevance ranking --------------------------
# BM25 (Robertson et al., public method) with two engine-portability twists:
# (1) the idf factor is the rational (N - df + 0.5)/(df + 0.5) WITHOUT the
# usual log — log is libm-dependent and monotone, so rankings are preserved;
# (2) each (doc, term) partial score is floor-scaled to an exact BIGINT
# BEFORE the per-doc sum — float partial-score sums would be order-dependent
# across partitionings, integer sums are not.  k1=1.2, b=0.75 (the standard
# constants; both are exactly representable doubles).
#
# Scale shape: tokens explode once, filter to the query terms BEFORE the
# shuffle (predicate on the exploded value), df/avgdl are one-row broadcast
# scalars, and the final top-10 is TakeOrderedAndProject.

_BM25_TERMS = ("vector", "dup", "scan")
_BM25_SCALE = 1_000_000_000

# shared Spark/DuckDB arithmetic (identical expression tree => identical
# IEEE result before the floor)
_BM25_EXPR = (
    f"floor({_BM25_SCALE}.0 * (((n_docs - df) + 0.5) / (df + 0.5)) * "
    "((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))"
)


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), scalars AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
), doc_term AS (
  SELECT doc_id, token AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM base) u
  WHERE token IN ({terms})
  GROUP BY doc_id, token
), df_t AS (
  SELECT term, COUNT(*) AS df FROM doc_term GROUP BY term
), scored AS (
  SELECT dt.doc_id,
    CAST({_BM25_EXPR} AS BIGINT) AS partial
  FROM doc_term dt
  JOIN df_t ON df_t.term = dt.term
  JOIN base b ON b.doc_id = dt.doc_id
  CROSS JOIN scalars
), ranked AS (
  SELECT doc_id, CAST(SUM(partial) AS BIGINT) AS bm25_score,
    COUNT(*) AS n_terms_matched
  FROM scored GROUP BY doc_id
)
SELECT doc_id, bm25_score, n_terms_matched, CAST(rn AS BIGINT) AS bm25_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id) AS rn
  FROM ranked
) t WHERE rn <= 10
"""


@query("bm25_search_top10", oracle=_bm25_oracle(), tags=("text", "search", "bm25"))
def bm25_search_top10(spark, sf_dir):
    from pyspark.sql.window import Window as W

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    base = d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("dl"),
    )
    # Optimization r13 (guide §5): base feeds 3 consumers (scalars, the
    # token explode, the dl join) — materialize once, intra-query only.
    # Lazy localCheckpoint (not .cache()): same compute-once semantics,
    # but the plan shows a leaf instead of re-printing the cached subtree
    # per consumer, so exchange-budget pins keep counting EXECUTED work.
    base = base.localCheckpoint(eager=False)
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    doc_term = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.expr(f"term IN ({terms_sql})"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = doc_term.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        doc_term.join(F.broadcast(df_t), "term")
        .join(base.select("doc_id", "dl"), "doc_id")
        .transform(with_scalar_frame(scalars))
        .select(
            "doc_id",
            F.expr(f"cast({_BM25_EXPR} as bigint)").alias("partial"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(
        F.sum("partial").cast("bigint").alias("bm25_score"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    top = ranked.orderBy(F.col("bm25_score").desc(), F.col("doc_id")).limit(10)
    w = W.orderBy(F.col("bm25_score").desc(), F.col("doc_id"))
    return top.withColumn("bm25_rank", F.row_number().over(w).cast("bigint"))


# --- semantic_dup_clusters: transitive closure of embedding similarity -------
# Semantic dedup at corpus scale keeps ONE representative per cluster of
# mutually-similar embeddings, not per pair: LSH-bucketed cosine edges feed
# the same bounded-lineage connected-components operator the text-side dedup
# uses (operators/dedup.py:connected_components — per-round localCheckpoint +
# unpersist, O(1) lineage at any component diameter).  The canonical
# representative is the component's minimum vec_id.  The edge cut is looser
# than the near-dup rule (0.35 yields a real graph — 14/25/247 edges at
# sf0.001/0.01/0.1) so the clustering itself is exercised, transitive
# merges included.

_SIM_THRESHOLD = 0.35


# Oracle CC strategy (r10): the r9 recursive-CTE transitive closure
# (`reach`) keeps one state row per (node, reachable peer) — Σ size² over
# components.  Fine for the sparse text-dedup graph (dedup_clusters, 18 s
# at sf10), fatal here: at the loose 0.35 cut nearly all 200K sf10 vectors
# cluster, so the closure is ~10^10 rows — the recorded 8 GiB DuckDB OOM
# is the algorithm, not the engine.  Replacement: UNROLLED min-label
# rounds, each = neighbor-min (one edges scan, two |nodes|-build joins)
# followed by a pointer jump m(v) := min(m(v), m(m(v))) — state stays one
# row per node, distance covered grows ~2^k, so _CC_ROUNDS=18 converges
# for any graph up to diameter ~2^18.  An unconverged label would differ
# from Spark's fixpoint CC and FAIL the compare — never a false pass.
_CC_ROUNDS = 18


def _unrolled_cc_sql(edges_sql: str) -> str:
    """Min-label connected components over ``edges_sql`` (columns
    vec_a/vec_b) as plain unrolled CTEs; emits (vec_id, cluster_id,
    cluster_size)."""
    rounds = []
    prev = "l0"
    for k in range(1, _CC_ROUNDS + 1):
        rounds.append(
            f"""n{k} AS MATERIALIZED (
  SELECT e.src AS v, LEAST(MIN(ls.m), MIN(ln.m)) AS m
  FROM edges e
  JOIN {prev} ls ON ls.v = e.src
  JOIN {prev} ln ON ln.v = e.dst
  GROUP BY e.src
), l{k} AS MATERIALIZED (
  SELECT a.v, LEAST(a.m, b.m) AS m
  FROM n{k} a JOIN n{k} b ON b.v = a.m
)"""
        )
        prev = f"l{k}"
    body = ",\n".join(rounds)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT vec_a, vec_b FROM ({edges_sql}) _nd
), edges AS MATERIALIZED (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
), l0 AS MATERIALIZED (
  SELECT src AS v, LEAST(src, MIN(dst)) AS m FROM edges GROUP BY src
),
{body}
SELECT v AS vec_id, m AS cluster_id,
  COUNT(*) OVER (PARTITION BY m) AS cluster_size
FROM {prev}
"""


def _semantic_cluster_oracle() -> str:
    return _unrolled_cc_sql(_near_dup_oracle(_SIM_THRESHOLD))


@query(
    "semantic_dup_clusters",
    oracle=_semantic_cluster_oracle(),
    tags=("vectors", "dedup", "graph", "iterative"),
)
def semantic_dup_clusters(spark, sf_dir):
    # star contraction (O(log n) rounds vs O(diameter) min-label)
    from zeta_etl_spark.operators.dedup import connected_components_star

    # cache: star CC symmetrizes the edge list with a union whose two
    # branches would each re-execute the bucketed cosine edge build —
    # pinning the bounded pair set halves the query (15.9 -> 9.6 s at sf1)
    pairs = _cosine_bucket_pairs(spark, sf_dir, _SIM_THRESHOLD).select(
        "vec_a", "vec_b"
    ).cache()
    labels = connected_components_star(pairs, src="vec_a", dst="vec_b")
    pairs.unpersist()  # CC checkpointed its labels eagerly; pairs is dead
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("doc_id").alias("vec_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


# --- banded_cosine_pairs: multi-table LSH (recall at high plane counts) ------
# PERF.md round-5 names the deployment answer to the plane-count/recall
# tradeoff: b independent hyperplane tables, candidates = union of their
# bucket joins (the random-hyperplane analogue of the MinHash band join).
# Recall math: a pair at angle θ collides in one k-plane table with
# p = (1 - θ/π)^k, and in ≥1 of b tables with 1-(1-p^k)^b — so banding is
# the knob for HIGH-similarity targets (cos 0.99 → p^10 ≈ 0.63, two tables
# ≈ 0.86) and is measured exactly there by
# tests/test_scale_ops.py::test_banded_tables_buy_recall_on_near_dups;
# for LOOSE thresholds like this 0.35 graph, hyperplane collision is weak
# (p^10 ≈ 0.008 at θ≈69°) and the bucket restriction is a documented
# approximation, not a recall promise.  Scale shape: b bucket equi-joins
# (per-bucket density held constant via adaptive_plane_count) + one
# distinct — candidate cost grows linearly in b, never all-pairs.

_BANDED_PLANES = 10
_BANDED_TABLES = (42, 43)  # hyperplane seeds, one per table


def _banded_bucket_sql(seed: int) -> str:
    from zeta_etl_spark.operators.vectors import (
        duck_hyperplane_bucket_sql,
        hyperplane_params,
    )

    return duck_hyperplane_bucket_sql(
        hyperplane_params(_BANDED_PLANES, 64, seed=seed)
    )


def _banded_oracle() -> str:
    from zeta_etl_spark.operators.vectors import SCALE

    scaled = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}"
        " + 0.5) AS BIGINT))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, {scaled} AS sv FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, sv, list_sum(list_transform(sv, x -> x * x)) AS norm2,
         {_banded_bucket_sql(_BANDED_TABLES[0])} AS b1,
         {_banded_bucket_sql(_BANDED_TABLES[1])} AS b2
  FROM e
), cand AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM n a JOIN n b ON a.b1 = b.b1 AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id, b.vec_id
  FROM n a JOIN n b ON a.b2 = b.b2 AND a.vec_id < b.vec_id
), p AS (
  SELECT c.vec_a, c.vec_b,
    list_dot_product(a.sv, b.sv)
      / NULLIF(sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)),
               0.0) AS cosine
  FROM cand c
  JOIN n a ON a.vec_id = c.vec_a
  JOIN n b ON b.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {_SIM_THRESHOLD}
"""


@query(
    "banded_cosine_pairs",
    oracle=_banded_oracle(),
    tags=("vectors", "dedup", "lsh", "banded"),
)
def banded_cosine_pairs(spark, sf_dir):
    from zeta_etl_spark.operators.vectors import (
        hyperplane_params,
        lsh_bucket,
        scaled_vectors,
    )

    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    for i, seed in enumerate(_BANDED_TABLES, 1):
        planes = hyperplane_params(_BANDED_PLANES, 64, seed=seed)
        emb = emb.withColumn(f"_b{i}", lsh_bucket("sv", planes))
    emb = emb.cache()
    cands = None
    for i in range(1, len(_BANDED_TABLES) + 1):
        a = emb.select(
            F.col("vec_id").alias("vec_a"), F.col(f"_b{i}").alias("_bk")
        )
        b = emb.select(
            F.col("vec_id").alias("vec_b"), F.col(f"_b{i}").alias("_bk")
        )
        t = (
            a.join(b, "_bk")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
        )
        cands = t if cands is None else cands.unionByName(t)
    cands = cands.distinct()
    va = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("sv").alias("sv_a"),
        F.col("norm2").alias("n_a"),
    )
    vb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("sv").alias("sv_b"),
        F.col("norm2").alias("n_b"),
    )
    dot = F.expr(
        "aggregate(zip_with(sv_a, sv_b, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("n_a").cast("double")) * F.sqrt(F.col("n_b").cast("double")),
        F.lit(0.0),
    )
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= _SIM_THRESHOLD)
    )


# --- vocab_growth_curve: Heaps'-law checkpoints ------------------------------
# Distinct-vocabulary size as the corpus grows — the statistic behind
# tokenizer sizing and dedup-density monitoring.  Each token contributes
# at its FIRST document (min doc_id over the inverted postings), so the
# growth curve is a cumulative count of first occurrences bucketed at
# 10%-of-corpus checkpoints: one explode + one token-grain agg + a 10-row
# rollup.  No sequential scan — first-occurrence rank IS the
# parallel-friendly formulation of "reading the corpus in order".
# On the base synthetic corpus the 31-token vocabulary saturates in
# decile 0 (1 output row — verified exact); on the 10× replica each
# clone's suffixed vocabulary lands in its own decile and the query
# reports the full 10-step staircase (31, 60, 89, … 292).

_VOCAB_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), firsts AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
), bounds AS (
  SELECT MAX(doc_id) AS max_doc FROM documents
), bucketed AS (
  SELECT LEAST((f.first_doc * 10) // (b.max_doc + 1), 9) AS decile,
         COUNT(*) AS new_tokens
  FROM firsts f CROSS JOIN bounds b GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS corpus_decile,
  CAST(new_tokens AS BIGINT) AS new_tokens,
  CAST(SUM(new_tokens) OVER (ORDER BY decile) AS BIGINT) AS vocab_size
FROM bucketed
"""


@query("vocab_growth_curve", oracle=_VOCAB_ORACLE, tags=("text", "vocab"))
def vocab_growth_curve(spark, sf_dir):
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    bounds = d.agg(F.max("doc_id").alias("max_doc"))
    bucketed = (
        firsts.transform(with_scalar_frame(bounds))
        .select(
            F.expr("least((first_doc * 10) div (max_doc + 1), 9)").alias(
                "decile"
            )
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    w = Window.orderBy("decile")  # 10-row frame — global window is free
    return bucketed.select(
        F.col("decile").cast("bigint").alias("corpus_decile"),
        F.col("new_tokens").cast("bigint").alias("new_tokens"),
        F.sum("new_tokens").over(w).cast("bigint").alias("vocab_size"),
    )


# --- source_signature_tokens: distinctive vocabulary per source --------------
# Which tokens over-index in each source?  lift = P(token | source) /
# P(token) as the exact count ratio (n_st·N) / (n_s·n_t) — the
# "characteristic vocabulary" report used to spot feed mislabeling and
# topic drift.  One explode + one (source, token) shuffle; the lift and
# rank run over the aggregated vocabulary×sources frame.  Top-3 per
# source, ties broken on the token string.

_SIG_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), st AS (
  SELECT source, tok, COUNT(*) AS n_st FROM toks GROUP BY 1, 2
), s AS (
  SELECT source, SUM(n_st) AS n_s FROM st GROUP BY 1
), t AS (
  SELECT tok, SUM(n_st) AS n_t FROM st GROUP BY 1
), tot AS (SELECT SUM(n_st) AS n FROM st),
scored AS (
  SELECT st.source, st.tok,
    CAST(st.n_st AS BIGINT) AS n_st,
    CAST(st.n_st AS DOUBLE) * tot.n / (CAST(s.n_s AS DOUBLE) * t.n_t) AS lift
  FROM st
  JOIN s ON s.source = st.source
  JOIN t ON t.tok = st.tok
  CROSS JOIN tot
)
SELECT source, tok, n_st, lift,
  CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY lift DESC, tok) AS rnk
  FROM scored
) r WHERE rnk <= 3
"""


@query(
    "source_signature_tokens", oracle=_SIG_ORACLE, tags=("text", "signature")
)
def source_signature_tokens(spark, sf_dir):
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n_st"))
    )
    ws = Window.partitionBy("source")
    wt = Window.partitionBy("tok")
    wall = Window.partitionBy()
    scored = st.select(
        "source",
        "tok",
        F.col("n_st").cast("bigint").alias("n_st"),
        (
            F.col("n_st").cast("double")
            * F.sum("n_st").over(wall)
            / (
                F.sum("n_st").over(ws).cast("double")
                * F.sum("n_st").over(wt)
            )
        ).alias("lift"),
    )
    wr = Window.partitionBy("source").orderBy(F.col("lift").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


# --- hybrid_rrf_top10: BM25 x vector-cosine rank fusion ----------------------
# Hybrid retrieval, the standard modern search stack: the SAME corpus is
# ranked lexically (BM25 over the query terms, the arithmetic above) and
# semantically (cosine of each embedding against the query vector — the
# vec_id 0 embedding; documents and embeddings share the id domain), and
# the two rankings are fused with Reciprocal Rank Fusion
# (Cormack/Clarke/Buettcher, public method):
#   rrf(d) = sum over lanes of 1 / (K + rank_lane(d)),  K = 60.
# Engine-portability devices: the cosine is quantized to BIGINT with the
# proven floor(x*1e12 + 0.5) pair BEFORE ranking (identical IEEE
# expression trees on both engines, so ranks can never diverge on a
# stray ulp), and each lane's reciprocal contribution is
# floor(1e9 / (K + rank)) — an exact BIGINT, so the fused score is
# integer-deterministic.  A document present in only one lane gets the
# other lane's contribution as 0 (full outer join), exactly RRF's
# missing-rank convention.
# Scale shape: the BM25 lane explodes tokens once and filters to the
# query terms BEFORE the shuffle; the cosine lane broadcasts ONE query
# row against the corpus scan; each lane keeps top-30 (two
# TakeOrderedAndProject), and the fusion joins two 30-row frames —
# driver-sized, broadcast by AQE.

_RRF_K = 60
_RRF_SCALE = 1_000_000_000
_RRF_DEPTH = 30
_COS_Q = 1_000_000_000_000


def _rrf_contrib(rank_col: str) -> str:
    # identical text parses in Spark SQL and DuckDB
    return (
        f"coalesce(cast(floor({_RRF_SCALE}.0 / ({_RRF_K} + {rank_col})) "
        "as bigint), 0)"
    )


def _rrf_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    from zeta_etl_spark.operators.vectors import SCALE

    duck_scaled = (
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * "
        f"{SCALE} + 0.5) AS BIGINT))"
    )
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), scalars AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
), doc_term AS (
  SELECT doc_id, token AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM base) u
  WHERE token IN ({terms})
  GROUP BY doc_id, token
), df_t AS (
  SELECT term, COUNT(*) AS df FROM doc_term GROUP BY term
), scored AS (
  SELECT dt.doc_id, CAST({_BM25_EXPR} AS BIGINT) AS partial
  FROM doc_term dt
  JOIN df_t ON df_t.term = dt.term
  JOIN base b ON b.doc_id = dt.doc_id
  CROSS JOIN scalars
), bm AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS bm25_rank FROM (
    SELECT doc_id,
      ROW_NUMBER() OVER (ORDER BY SUM(partial) DESC, doc_id) AS rn
    FROM scored GROUP BY doc_id
  ) t WHERE rn <= {_RRF_DEPTH}
), e AS (
  SELECT vec_id, {duck_scaled} AS sv FROM embeddings
), n AS (
  SELECT vec_id, sv,
         list_sum(list_transform(sv, x -> x * x)) AS norm2 FROM e
), q AS (
  SELECT sv AS qv, norm2 AS qn FROM n WHERE vec_id = 0
), p AS (
  SELECT n.vec_id,
    CAST(floor(
      CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                                   i -> q.qv[i] * n.sv[i])) AS DOUBLE)
      / NULLIF(sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(n.norm2 AS DOUBLE)),
               0.0)
      * {_COS_Q} + 0.5) AS BIGINT) AS qcos
  FROM n CROSS JOIN q WHERE n.vec_id != 0
), cr AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS cos_rank FROM (
    SELECT vec_id AS doc_id,
      ROW_NUMBER() OVER (ORDER BY qcos DESC, vec_id) AS rn
    FROM p
  ) t WHERE rn <= {_RRF_DEPTH}
), fused AS (
  SELECT doc_id, bm25_rank, cos_rank,
    {_rrf_contrib("bm25_rank")} + {_rrf_contrib("cos_rank")} AS rrf_score
  FROM bm FULL OUTER JOIN cr USING (doc_id)
)
SELECT doc_id, rrf_score, bm25_rank, cos_rank, CAST(rn AS BIGINT) AS rrf_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
  FROM fused
) t WHERE rn <= 10
"""


@query(
    "hybrid_rrf_top10",
    oracle=_rrf_oracle(),
    tags=("text", "vectors", "search", "fusion", "rrf"),
)
def hybrid_rrf_top10(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from zeta_etl_spark.operators.vectors import scaled_vectors

    # ----- BM25 lane (same arithmetic as bm25_search_top10) -----
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    base = d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("dl"),
    )
    # Optimization r13 (guide §5): base feeds 3 consumers (scalars, the
    # token explode, the dl join) — materialize once, intra-query only.
    # Lazy localCheckpoint (not .cache()): same compute-once semantics,
    # but the plan shows a leaf instead of re-printing the cached subtree
    # per consumer, so exchange-budget pins keep counting EXECUTED work.
    base = base.localCheckpoint(eager=False)
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    doc_term = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.expr(f"term IN ({terms_sql})"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = doc_term.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        doc_term.join(F.broadcast(df_t), "term")
        .join(base.select("doc_id", "dl"), "doc_id")
        .transform(with_scalar_frame(scalars))
        .select(
            "doc_id",
            F.expr(f"cast({_BM25_EXPR} as bigint)").alias("partial"),
        )
    )
    # each lane pre-thins with a rank-safe global top-K: the ordering is
    # TOTAL (unique doc_id tie-break), so orderBy().limit(K) — which plans
    # as TakeOrderedAndProject, a per-partition heap + driver merge — keeps
    # exactly the rows row_number() <= K would, and the row_number window
    # then sorts K rows, never the whole scored corpus on one partition
    wb = W.orderBy(F.col("bm25_score").desc(), F.col("doc_id"))
    bm = (
        scored.groupBy("doc_id")
        .agg(F.sum("partial").cast("bigint").alias("bm25_score"))
        .orderBy(F.col("bm25_score").desc(), F.col("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn("bm25_rank", F.row_number().over(wb).cast("bigint"))
        .select("doc_id", "bm25_rank")
    )

    # ----- cosine lane (query vector = vec_id 0) -----
    emb = scaled_vectors(T(spark, sf_dir, "embeddings").drop("label"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("sv").alias("qv"), F.col("norm2").alias("qn")
    )
    dot = F.expr(
        "aggregate(zip_with(qv, sv, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("norm2").cast("double")),
        F.lit(0.0),
    )
    wc = W.orderBy(F.col("qcos").desc(), F.col("vec_id"))
    cr = (
        emb.filter(F.col("vec_id") != 0)
        .transform(with_scalar_frame(q, bound=1))
        .select(
            "vec_id",
            F.floor(cos * F.lit(_COS_Q) + F.lit(0.5))
            .cast("bigint")
            .alias("qcos"),
        )
        .orderBy(F.col("qcos").desc(), F.col("vec_id"))
        .limit(_RRF_DEPTH)
        .withColumn("cos_rank", F.row_number().over(wc).cast("bigint"))
        .select(F.col("vec_id").alias("doc_id"), "cos_rank")
    )

    # ----- fusion -----
    fused = bm.join(cr, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (
            F.expr(_rrf_contrib("bm25_rank"))
            + F.expr(_rrf_contrib("cos_rank"))
        ).alias("rrf_score"),
    )
    wf = W.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
        .limit(10)
        .withColumn("rrf_rank", F.row_number().over(wf).cast("bigint"))
        .select("doc_id", "rrf_score", "bm25_rank", "cos_rank", "rrf_rank")
    )


# --- prf_rocchio_top10: pseudo-relevance-feedback retrieval ------------------
# Rocchio-style PRF (public method, SMART system lineage): round 1 ranks
# the corpus by BM25 over the literal query terms and takes the top-5
# docs as the FEEDBACK SET; the 3 most frequent long tokens of that set
# (df within the feedback docs, excluding the original terms,
# len(token) > 3, ties by term) become EXPANSION terms; round 2 re-ranks
# the corpus with integer weights — original terms x2, expansion terms
# x1 — over the same floor-scaled BM25 partials, so the fused score
# stays an exact BIGINT.  The interesting engine property: round 2's
# term set is DATA-DEPENDENT, so the token filter is a broadcast join
# against a <=7-row terms frame instead of a literal IN — tokens explode
# once and meet the terms frame right after the explode (same shuffle
# shape as the literal filter, no driver round-trip, no collected
# intermediate).

_PRF_DEPTH_FB = 5
_PRF_N_EXP = 3


def _prf_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), scalars AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
), tok AS (
  SELECT doc_id, unnest(toks) AS term FROM base
), dt1 AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY doc_id, term
), df1 AS (
  SELECT term, COUNT(*) AS df FROM dt1 GROUP BY term
), r1 AS (
  SELECT dt1.doc_id, SUM(CAST({_BM25_EXPR} AS BIGINT)) AS s
  FROM dt1 JOIN df1 ON df1.term = dt1.term
  JOIN base b ON b.doc_id = dt1.doc_id CROSS JOIN scalars
  GROUP BY dt1.doc_id
), fb AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rn
    FROM r1
  ) t WHERE rn <= {_PRF_DEPTH_FB}
), exp_terms AS (
  SELECT term, CAST(1 AS BIGINT) AS w FROM (
    SELECT tok.term,
      ROW_NUMBER() OVER (ORDER BY COUNT(DISTINCT tok.doc_id) DESC,
                         tok.term) AS rn
    FROM tok JOIN fb ON fb.doc_id = tok.doc_id
    WHERE len(tok.term) > 3 AND tok.term NOT IN ({terms})
    GROUP BY tok.term
  ) t WHERE rn <= {_PRF_N_EXP}
), qterms AS (
  SELECT term, CAST(2 AS BIGINT) AS w
  FROM (SELECT unnest([{terms}]) AS term)
  UNION ALL SELECT term, w FROM exp_terms
), dt2 AS (
  SELECT tok.doc_id, tok.term, q.w, COUNT(*) AS tf
  FROM tok JOIN qterms q ON q.term = tok.term
  GROUP BY tok.doc_id, tok.term, q.w
), df2 AS (
  SELECT term, COUNT(*) AS df FROM dt2 GROUP BY term
), r2 AS (
  SELECT dt2.doc_id,
    SUM(dt2.w * CAST({_BM25_EXPR} AS BIGINT)) AS prf_score
  FROM dt2 JOIN df2 ON df2.term = dt2.term
  JOIN base b ON b.doc_id = dt2.doc_id CROSS JOIN scalars
  GROUP BY dt2.doc_id
)
SELECT doc_id, CAST(prf_score AS BIGINT) AS prf_score,
  CAST(rn AS BIGINT) AS prf_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY prf_score DESC, doc_id) AS rn
  FROM r2
) t WHERE rn <= 10
"""


@query(
    "prf_rocchio_top10",
    oracle=_prf_oracle(),
    tags=("text", "search", "bm25", "prf"),
)
def prf_rocchio_top10(spark, sf_dir):
    from pyspark.sql.window import Window as W

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    base = d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("dl"),
    )
    # Optimization r13 (guide §5 caching-when-reused): base feeds 5
    # consumers (corpus scalars, the token explode 3×, and the dl join in
    # both scoring passes) — unmaterialized, each re-reads the parquet and
    # re-splits every document (sf1 noop: 11.6 → 3.9 s).  MEMORY_AND_DISK
    # storage keeps it spill-safe at corpus scale; intra-query only, never
    # a cross-run memo.  Lazy localCheckpoint (not .cache()): same
    # compute-once semantics, but the plan shows a leaf instead of
    # re-printing the cached subtree per consumer, so the exchange-budget
    # pin (test_retrieval_fusion_plan_pins) keeps counting EXECUTED work.
    base = base.localCheckpoint(eager=False)
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tok = base.select("doc_id", F.explode("toks").alias("term"))

    def _score(doc_term, score_col):
        # BM25 partials for a (doc_id, term, w, tf) frame; returns
        # (doc_id, score_col) with the weighted integer sum
        df_t = doc_term.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        return (
            doc_term.join(F.broadcast(df_t), "term")
            .join(base.select("doc_id", "dl"), "doc_id")
            .transform(with_scalar_frame(scalars))
            .select(
                "doc_id",
                (
                    F.col("w") * F.expr(f"cast({_BM25_EXPR} as bigint)")
                ).alias("partial"),
            )
            .groupBy("doc_id")
            .agg(F.sum("partial").cast("bigint").alias(score_col))
        )

    dt1 = (
        tok.filter(F.expr(f"term IN ({terms_sql})"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("w", F.lit(1).cast("bigint"))
    )
    # every top-K here pre-thins with a rank-safe orderBy().limit(K)
    # (TakeOrderedAndProject) before the row_number assignment — the
    # orderings are total (unique doc_id/term tie-break), so results are
    # identical and no stage sorts the full scored corpus on one partition
    fb = (
        _score(dt1, "s")
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(_PRF_DEPTH_FB)
        .select("doc_id")
    )
    exp_terms = (
        tok.join(F.broadcast(fb), "doc_id")
        .filter(
            (F.length("term") > 3) & ~F.expr(f"term IN ({terms_sql})")
        )
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("dfb"))
        .orderBy(F.col("dfb").desc(), F.col("term"))
        .limit(_PRF_N_EXP)
        .select("term", F.lit(1).cast("bigint").alias("w"))
    )
    orig = spark.createDataFrame(
        [(t, 2) for t in _BM25_TERMS], "term string, w bigint"
    )
    qterms = orig.unionByName(exp_terms)
    dt2 = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    wf = W.orderBy(F.col("prf_score").desc(), F.col("doc_id"))
    return (
        _score(dt2, "prf_score")
        .orderBy(F.col("prf_score").desc(), F.col("doc_id"))
        .limit(10)
        .withColumn("prf_rank", F.row_number().over(wf).cast("bigint"))
    )
