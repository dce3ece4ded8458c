"""Second wave of corpus-curation queries: Gopher-style per-doc rule
battery, source-level reputation profiling, LSH band diagnostics, corpus
n-gram statistics, and corpus-hapax fractions.

These are the remaining steps a production LLM training-data pipeline runs
beyond pair detection (beyond-reference scale operators, BASELINE.json
north star).  Determinism rules (ROUND_NOTES.md): every computed integer is
BIGINT in both engines; ratios are ONE final division of exact integer
numerator/denominator (never averaged doubles); ranking ties break on a
total order.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

# --- gopher_quality_rules ----------------------------------------------------
# The published Gopher/MassiveText document-filter battery (Rae et al. 2021,
# public knowledge) adapted to the synthetic corpus: token-count bounds,
# mean-word-length bounds, alpha-word fraction, stopword evidence.  Each
# rule is its own flag so downstream audits can attribute drops.

_GOPHER_STOPWORDS = "'the','a','of','to','and','in','is','it'"
_MIN_TOKENS, _MAX_TOKENS = 50, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MIN_ALPHA = 0.8

_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS BIGINT)
      AS n_alpha_words,
    CAST(len(list_filter(toks, w -> w IN ({_GOPHER_STOPWORDS})))
      AS BIGINT) AS stopword_hits,
    CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT)
      AS total_word_chars
  FROM t
)
SELECT doc_id, n_tokens, n_alpha_words, stopword_hits,
  CAST(total_word_chars AS DOUBLE) / n_tokens AS mean_word_len,
  CAST(n_alpha_words AS DOUBLE) / n_tokens AS alpha_word_ratio,
  CAST(CASE WHEN n_tokens >= {_MIN_TOKENS} AND n_tokens <= {_MAX_TOKENS}
       THEN 1 ELSE 0 END AS BIGINT) AS rule_token_count,
  CAST(CASE WHEN CAST(total_word_chars AS DOUBLE) / n_tokens >= {_MIN_MWL}
            AND CAST(total_word_chars AS DOUBLE) / n_tokens <= {_MAX_MWL}
       THEN 1 ELSE 0 END AS BIGINT) AS rule_mean_word_len,
  CAST(CASE WHEN CAST(n_alpha_words AS DOUBLE) / n_tokens >= {_MIN_ALPHA}
       THEN 1 ELSE 0 END AS BIGINT) AS rule_alpha_words,
  CAST(CASE WHEN stopword_hits >= 2 THEN 1 ELSE 0 END AS BIGINT)
    AS rule_stopwords,
  CAST(CASE WHEN n_tokens >= {_MIN_TOKENS} AND n_tokens <= {_MAX_TOKENS}
            AND CAST(total_word_chars AS DOUBLE) / n_tokens >= {_MIN_MWL}
            AND CAST(total_word_chars AS DOUBLE) / n_tokens <= {_MAX_MWL}
            AND CAST(n_alpha_words AS DOUBLE) / n_tokens >= {_MIN_ALPHA}
            AND stopword_hits >= 2
       THEN 1 ELSE 0 END AS BIGINT) AS passes_gopher
FROM m
"""


@query("gopher_quality_rules", oracle=_GOPHER_ORACLE, tags=("curation", "quality"))
def gopher_quality_rules(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    base = d.select(
        "doc_id",
        F.expr(f"cast(size({toks}) as bigint)").alias("n_tokens"),
        F.expr(
            f"cast(size(filter({toks}, w -> w rlike '[a-z]')) as bigint)"
        ).alias("n_alpha_words"),
        F.expr(
            f"cast(size(filter({toks}, w -> w in ({_GOPHER_STOPWORDS}))) "
            "as bigint)"
        ).alias("stopword_hits"),
        F.expr(
            f"cast(aggregate({toks}, 0L, (a, w) -> a + length(w)) as bigint)"
        ).alias("total_word_chars"),
    )
    mwl = F.col("total_word_chars").cast("double") / F.col("n_tokens")
    alpha = F.col("n_alpha_words").cast("double") / F.col("n_tokens")
    r_tok = (F.col("n_tokens") >= _MIN_TOKENS) & (F.col("n_tokens") <= _MAX_TOKENS)
    r_mwl = (mwl >= _MIN_MWL) & (mwl <= _MAX_MWL)
    r_alpha = alpha >= _MIN_ALPHA
    r_stop = F.col("stopword_hits") >= 2
    as_flag = lambda c: F.when(c, 1).otherwise(0).cast("bigint")  # noqa: E731
    return base.select(
        "doc_id",
        "n_tokens",
        "n_alpha_words",
        "stopword_hits",
        mwl.alias("mean_word_len"),
        alpha.alias("alpha_word_ratio"),
        as_flag(r_tok).alias("rule_token_count"),
        as_flag(r_mwl).alias("rule_mean_word_len"),
        as_flag(r_alpha).alias("rule_alpha_words"),
        as_flag(r_stop).alias("rule_stopwords"),
        as_flag(r_tok & r_mwl & r_alpha & r_stop).alias("passes_gopher"),
    )


# --- source_reputation -------------------------------------------------------
# Domain/source-level curation: a source whose documents are mostly
# duplicates or low-uniqueness is dropped wholesale (the Common Crawl
# domain-blocklist step).  All ratios are exact-integer sums divided ONCE —
# never averages of per-doc doubles (summation order would diverge).

_SOURCE_ORACLE = """
WITH base AS (
  SELECT doc_id, source, md5(text) AS content_hash,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id)
    AS copy_rank
  FROM base
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN copy_rank > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN copy_rank > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS dup_rate,
  CAST(SUM(n_uniq) AS DOUBLE) / SUM(n_tokens) AS uniq_token_ratio,
  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc
FROM ranked GROUP BY source
"""


@query("source_reputation", oracle=_SOURCE_ORACLE, tags=("curation", "source"))
def source_reputation(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    base = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("content_hash"),
        F.expr(f"cast(size({toks}) as bigint)").alias("n_tokens"),
        F.expr(f"cast(size(array_distinct({toks})) as bigint)").alias("n_uniq"),
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    ranked = base.withColumn("copy_rank", F.row_number().over(w))
    dup = F.when(F.col("copy_rank") > 1, 1).otherwise(0)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dup).cast("bigint").alias("n_dups"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_rate"),
        (F.sum("n_uniq").cast("double") / F.sum("n_tokens")).alias(
            "uniq_token_ratio"
        ),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
            "avg_tokens_per_doc"
        ),
    )


# --- lsh_band_stats ----------------------------------------------------------
# Production LSH tuning diagnostic: per band, how many buckets exist, how
# large the worst bucket is, how many docs collide at all, and how many
# candidate pairs the band generates (sum over buckets of C(size, 2)).
# This is what decides bands x rows_per_band before a 100 TB run — bucket
# blowup means quadratic verify cost.

_BAND_STATS_ORACLE = None  # assembled below from dedup_q's band CTEs


def _band_stats_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_hex2long, duck_shingles
    from zeta_etl_spark.operators.dedup import MINHASH_PRIME, minhash_params
    from zeta_etl_spark.queries.dedup_q import _BANDS, _NUM_PERM, _ROWS

    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for a, b in minhash_params(_NUM_PERM)
    )
    band_selects = []
    for b in range(_BANDS):
        cols = " || ',' || ".join(
            f"CAST(signature[{b * _ROWS + r + 1}] AS VARCHAR)"
            for r in range(_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    shingle_hash = duck_hex2long("s", digits=8)
    return f"""
WITH sh AS (
  SELECT doc_id, {duck_shingles()} AS shingles FROM documents
), sigsrc AS (
  SELECT doc_id, list_transform(shingles, s -> {shingle_hash}) AS hs FROM sh
), sig AS (
  SELECT doc_id, [{sig_items}] AS signature FROM sigsrc
), bands AS (
  {bands_sql}
), buckets AS (
  SELECT band_id, band_hash, COUNT(*) AS bucket_size
  FROM bands GROUP BY band_id, band_hash
)
SELECT CAST(band_id AS BIGINT) AS band_id,
  COUNT(*) AS n_buckets,
  CAST(MAX(bucket_size) AS BIGINT) AS max_bucket_size,
  CAST(SUM(CASE WHEN bucket_size > 1 THEN bucket_size ELSE 0 END) AS BIGINT)
    AS n_colliding_docs,
  CAST(SUM((bucket_size * (bucket_size - 1)) // 2) AS BIGINT)
    AS n_candidate_pairs
FROM buckets GROUP BY band_id
"""


@query("lsh_band_stats", oracle=_band_stats_oracle(), tags=("dedup", "lsh", "diagnostic"))
def lsh_band_stats(spark, sf_dir):
    from zeta_etl_spark.operators.dedup import minhash_signatures
    from zeta_etl_spark.queries.dedup_q import _BANDS, _NUM_PERM, _ROWS

    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sigs = minhash_signatures(d, num_perm=_NUM_PERM)
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col("signature")[b * _ROWS + r]
                        for r in range(_ROWS)
                    ],
                )
            )
            for b in range(_BANDS)
        ]
    )
    exploded = sigs.select(
        F.posexplode(band_hashes).alias("band_id", "band_hash")
    )
    buckets = exploded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    return buckets.groupBy(F.col("band_id").cast("bigint").alias("band_id")).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("bucket_size").cast("bigint").alias("max_bucket_size"),
        F.sum(
            F.when(F.col("bucket_size") > 1, F.col("bucket_size")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_colliding_docs"),
        F.sum(F.expr("(bucket_size * (bucket_size - 1)) div 2"))
        .cast("bigint")
        .alias("n_candidate_pairs"),
    )


# --- bigram_top_terms --------------------------------------------------------
# Corpus n-gram statistics: top-10 bigrams per language by frequency (ties
# broken lexicographically).  Map-side combined token-grain aggregation —
# the shape scales to corpus-level n-gram tables at 100 TB.

_BIGRAM_ORACLE = """
WITH t AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT lang, unnest(list_transform(range(0, greatest(len(toks) - 2, -1) + 1),
    j -> array_to_string(toks[j + 1:j + 2], ' '))) AS bigram
  FROM t
), counted AS (
  SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram
)
SELECT lang, bigram, n, CAST(rn AS BIGINT) AS bigram_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram)
    AS rn
  FROM counted
) t WHERE rn <= 10
"""


@query("bigram_top_terms", oracle=_BIGRAM_ORACLE, tags=("text", "ngram"))
def bigram_top_terms(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    bigrams = (
        f"case when size({toks}) >= 2 then "
        f"transform(sequence(0, size({toks}) - 2), "
        f"j -> concat_ws(' ', slice({toks}, j + 1, 2))) "
        f"else cast(array() as array<string>) end"
    )
    bg = d.select("lang", F.explode(F.expr(bigrams)).alias("bigram"))
    counted = bg.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counted.withColumn("bigram_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("bigram_rank") <= 10)
    )


# --- hapax_fraction ----------------------------------------------------------
# Per-doc fraction of DISTINCT tokens that are corpus hapax legomena
# (appear exactly once in the whole corpus) — a classic contamination /
# noisiness signal.  Two token-grain shuffles (corpus counts + doc join),
# both map-side combined; integers until the final division.

_HAPAX_ORACLE = """
WITH t AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), tot AS (
  SELECT token, COUNT(*) AS n_occurrences
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents) u
  GROUP BY token
)
SELECT t.doc_id,
  COUNT(*) AS n_distinct_tokens,
  CAST(SUM(CASE WHEN tot.n_occurrences = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hapax,
  CAST(SUM(CASE WHEN tot.n_occurrences = 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS hapax_fraction
FROM t JOIN tot ON tot.token = t.token
GROUP BY t.doc_id
"""


@query("hapax_fraction", oracle=_HAPAX_ORACLE, tags=("text", "hapax"))
def hapax_fraction(spark, sf_dir):
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = "split(text, ' ')"
    all_tokens = d.select(F.explode(F.expr(toks)).alias("token"))
    tot = all_tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    doc_tokens = d.select(
        "doc_id", F.explode(F.expr(f"array_distinct({toks})")).alias("token")
    )
    joined = doc_tokens.join(tot, "token")
    hapax = F.when(F.col("n_occurrences") == 1, 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.sum(hapax).cast("bigint").alias("n_hapax"),
        (F.sum(hapax).cast("double") / F.count(F.lit(1))).alias(
            "hapax_fraction"
        ),
    )


# --- token_quantiles_per_source ----------------------------------------------
# Exact distributed quantiles WITHOUT percentile interpolation: the q-th
# quantile is the value at 1-indexed position ceil(q*n) of the
# (n_tokens, doc_id)-sorted shard — pure integer arithmetic
# ((q*100*n + 99) div 100), so Spark and DuckDB agree bit-for-bit where
# interpolating percentile functions diverge.  One window per shard +
# map-side-combinable conditional max; scales like any rank window.

_QUANT_POSITIONS = [25, 50, 75, 90]


def _quant_oracle() -> str:
    sel = ",\n  ".join(
        f"MAX(CASE WHEN rn = ({q} * n + 99) // 100 THEN n_tokens END) AS p{q}"
        for q in _QUANT_POSITIONS
    )
    return f"""
WITH t AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY source) AS n
  FROM t
)
SELECT source, COUNT(*) AS n_docs,
  {sel}
FROM r GROUP BY source
"""


@query(
    "token_quantiles_per_source",
    oracle=_quant_oracle(),
    tags=("curation", "quantiles"),
)
def token_quantiles_per_source(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    wn = Window.partitionBy("source")
    r = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({q} * n + 99) div 100"),
                F.col("n_tokens"),
            )
        ).alias(f"p{q}")
        for q in _QUANT_POSITIONS
    ]
    return r.groupBy("source").agg(*aggs)
