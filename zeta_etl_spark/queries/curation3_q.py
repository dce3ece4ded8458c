"""Training-data curation batch 3: chunking, PII redaction, stratified
sampling, per-source caps, and a Bloom membership sketch — the remaining
web-scale corpus-preparation operators.

All arithmetic follows the repo determinism rules: integer math via BIGINT
(``div``/``%``), single trailing double divisions, md5 as the only
cross-engine hash, no libm transcendentals in compared output.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

# --- chunk_docs: sliding token-window chunking -------------------------------
# Every context-length-bounded training pipeline chunks documents into
# overlapping token windows (size 64, stride 48 here).  The offset grid is
# computed JVM-side with sequence()+explode — chunk count is pure integer
# math, the slice is a built-in, and the only shuffle is none at all: this
# is a narrow map over the corpus, which is exactly what you want at 100 TB.
# Chunk identity is md5 of the joined window for cross-engine comparison.

_CHUNK, _STRIDE = 64, 48

_CHUNK_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
    len(string_split(text, ' ')) AS n
  FROM documents
), grid AS (
  SELECT doc_id, toks, n,
    CAST(UNNEST(range(CASE WHEN n <= {_CHUNK} THEN 1
      ELSE 1 + (n - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE} END)) AS BIGINT)
      AS chunk_idx
  FROM base
)
SELECT doc_id, chunk_idx,
  CAST(len(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                      chunk_idx * {_STRIDE} + {_CHUNK})) AS BIGINT)
    AS n_chunk_tokens,
  md5(array_to_string(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                                 chunk_idx * {_STRIDE} + {_CHUNK}), ' '))
    AS chunk_hash
FROM grid
"""


@query("chunk_docs", oracle=_CHUNK_ORACLE, tags=("text", "chunking", "curation"))
def chunk_docs(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    # integer ceil-div via `div` to match DuckDB's `//` exactly
    grid = base.withColumn(
        "chunk_idx",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(
                    f"CASE WHEN n <= {_CHUNK} THEN CAST(0 AS BIGINT) "
                    f"ELSE (n - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE} END"
                ),
            )
        ),
    )
    window = F.slice(
        F.col("toks"), F.col("chunk_idx") * _STRIDE + 1, F.lit(_CHUNK)
    )
    return grid.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(window).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_hash"),
    )


# --- pii_redaction_stats: regex scrub with audited counts --------------------
# The synthetic corpus carries no digits, so the query first stamps each doc
# with deterministic doc_id-derived PII tokens (an email and a 7-digit
# number), then runs the production scrub: extract-count + global
# regexp_replace.  Patterns stay inside the Java∩RE2 common subset (char
# classes + bounded quantifiers) so both engines agree byte-for-byte.

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_DIGITS_RE = "[0-9]{7,}"

_PII_ORACLE = f"""
WITH enriched AS (
  SELECT doc_id, source,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or call '
         || lpad(CAST((doc_id * 7919) % 10000000 AS VARCHAR), 7, '0')
         || ' now' AS body
  FROM documents
), scrubbed AS (
  SELECT doc_id, source, body,
    len(regexp_extract_all(body, '{_EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(body, '{_DIGITS_RE}')) AS n_digit_runs,
    regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_DIGITS_RE}', '<NUM>', 'g') AS redacted
  FROM enriched
)
SELECT doc_id, source,
  CAST(n_emails AS BIGINT) AS n_emails,
  CAST(n_digit_runs AS BIGINT) AS n_digit_runs,
  CAST(len(body) - len(redacted) AS BIGINT) AS chars_removed,
  md5(redacted) AS redacted_hash
FROM scrubbed
"""


@query("pii_redaction_stats", oracle=_PII_ORACLE, tags=("text", "pii", "curation"))
def pii_redaction_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call "),
        F.lpad(((F.col("doc_id") * 7919) % 10000000).cast("string"), 7, "0"),
        F.lit(" now"),
    )
    enriched = d.select("doc_id", "source", body.alias("body"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("body"), _EMAIL_RE, "<EMAIL>"),
        _DIGITS_RE,
        "<NUM>",
    )
    return enriched.select(
        "doc_id",
        "source",
        F.size(F.regexp_extract_all(F.col("body"), F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("body"), F.lit(_DIGITS_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_digit_runs"),
        (F.length("body") - F.length(redacted)).cast("bigint").alias(
            "chars_removed"
        ),
        F.md5(redacted).alias("redacted_hash"),
    )


# --- stratified_sample_docs: per-stratum deterministic rates -----------------
# Domain-balanced sampling: each source gets its own keep rate (20–65% here,
# derived from the source number so the fixture exercises 10 distinct rates),
# membership decided by an md5 bucket of doc_id — reproducible across runs,
# engines, partitionings, and cluster sizes, unlike rand()-based sampling.

_STRAT_ORACLE = """
WITH rated AS (
  SELECT doc_id, source,
    20 + 5 * (CAST(substr(source, 4) AS INTEGER) % 10) AS rate_pct,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      AS bucket
  FROM documents
)
SELECT source, CAST(rate_pct AS BIGINT) AS rate_pct,
  COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
    AS n_sampled
FROM rated
GROUP BY source, rate_pct
"""


@query(
    "stratified_sample_docs", oracle=_STRAT_ORACLE, tags=("sampling", "curation")
)
def stratified_sample_docs(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    rate = 20 + 5 * (F.expr("CAST(substring(source, 4) AS INT)") % 10)
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
    ) % 100
    rated = d.select(
        "source",
        rate.alias("rate_pct"),
        bucket.alias("bucket"),
    )
    return rated.groupBy("source", F.col("rate_pct").cast("bigint").alias("rate_pct")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("bucket") < F.col("rate_pct"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
    )


# --- per_source_cap: keep only the k best docs per domain --------------------
# Web-scale curation caps any one domain's contribution.  Quality is the
# unique-token ratio (exact integer counts, ONE double division); the cap is
# a row_number window per source — one shuffle on the source key, and at
# 100 TB the heavy-domain skew this creates is exactly what AQE skew-join
# splitting and the two-integer sort key keep tractable.

_CAP_K = 10

_CAP_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / len(string_split(text, ' ')) AS uniq_ratio
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY uniq_ratio DESC, doc_id) AS qrank
  FROM scored
)
SELECT doc_id, source, uniq_ratio, CAST(qrank AS BIGINT) AS qrank
FROM ranked WHERE qrank <= {_CAP_K}
"""


@query("per_source_cap", oracle=_CAP_ORACLE, tags=("curation", "topk", "window"))
def per_source_cap(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("uniq_ratio").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("qrank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("qrank") <= _CAP_K)
    )


# --- bloom_bits: per-source Bloom membership sketch --------------------------
# A k=4, m=1024 Bloom filter over each source's exact content hashes: the 4
# positions are independent 32-bit slices of one md5 (hash once, slice four
# times — the same codegen-size rule as MinHash), the filter itself is the
# DISTINCT count of set positions per source.  Fill ratio is one trailing
# division; no ln() in compared output (cardinality back-estimation is
# driver-side math, not part of the sketch).

_BLOOM_M = 1024

_BLOOM_ORACLE = f"""
WITH hashed AS (
  SELECT source, md5(text) AS h FROM documents
), pos AS (
  SELECT source,
    UNNEST([
      ('0x' || substr(h, 1, 8))::BIGINT % {_BLOOM_M},
      ('0x' || substr(h, 9, 8))::BIGINT % {_BLOOM_M},
      ('0x' || substr(h, 17, 8))::BIGINT % {_BLOOM_M},
      ('0x' || substr(h, 25, 8))::BIGINT % {_BLOOM_M}
    ]) AS p
  FROM hashed
)
SELECT source,
  CAST(COUNT(DISTINCT p) AS BIGINT) AS n_bits_set,
  COUNT(*) AS n_inserts,
  CAST(COUNT(DISTINCT p) AS DOUBLE) / {_BLOOM_M}.0 AS fill_ratio
FROM pos
GROUP BY source
"""


@query("bloom_bits", oracle=_BLOOM_ORACLE, tags=("sketch", "dedup"))
def bloom_bits(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    slices = F.array(
        *[
            F.expr(
                f"cast(conv(substr(md5(text), {start}, 8), 16, 10) as bigint)"
            )
            % _BLOOM_M
            for start in (1, 9, 17, 25)
        ]
    )
    pos = d.select("source", F.explode(slices).alias("p"))
    return pos.groupBy("source").agg(
        F.count_distinct("p").cast("bigint").alias("n_bits_set"),
        F.count(F.lit(1)).alias("n_inserts"),
        (F.count_distinct("p").cast("double") / F.lit(float(_BLOOM_M))).alias(
            "fill_ratio"
        ),
    )
