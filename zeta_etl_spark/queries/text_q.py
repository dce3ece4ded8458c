"""Text-analysis queries over the `documents` table: token statistics,
quality scoring, n-gram language ID, md5 fingerprinting.

These are the training-data-pipeline operators the engine adds beyond the
reference surface (BASELINE.json north star).  Everything is built-in column
expressions / higher-order functions — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions.text import (
    duck_hex2long,
    duck_tokens,
    spark_hex2long,
    spark_tokens,
)
from zeta_etl_spark.queries.registry import T, query

_STOPWORDS = ("the", "a")

# --- doc_token_stats: token counting (whitespace tokenizer) -----------------

_TOKSTATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars, text, {duck_tokens()} AS toks
  FROM documents
)
SELECT doc_id, lang, source, n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS avg_token_len,
  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
FROM t
"""


@query("doc_token_stats", oracle=_TOKSTATS_ORACLE, tags=("text", "tokens"))
def doc_token_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = F.expr(spark_tokens())
    nchars_ns = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq_tokens"),
        nchars_ns.cast("bigint").alias("n_chars_nospace"),
        (nchars_ns.cast("double") / F.size(toks)).alias("avg_token_len"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )


# --- doc_quality: stopword/uniqueness/length heuristic quality score --------

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, {duck_tokens()} AS toks, n_chars FROM documents
), m AS (
  SELECT doc_id, lang, n_chars,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks)
      AS stopword_ratio,
    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
  FROM t
)
SELECT doc_id, lang, n_tokens, stopword_ratio, uniq_ratio,
  CASE WHEN n_tokens < 30 THEN 'too_short'
       WHEN stopword_ratio > 0.2 THEN 'boilerplate'
       WHEN uniq_ratio < 0.15 THEN 'repetitive'
       ELSE 'ok' END AS quality_flag
FROM m
"""


@query("doc_quality", oracle=_QUALITY_ORACLE, tags=("text", "quality"))
def doc_quality(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = F.expr(spark_tokens())
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    d = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (
            F.size(F.expr(f"filter({spark_tokens()}, x -> x in ({stop_list}))")).cast(
                "double"
            )
            / F.size(toks)
        ).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )
    flag = (
        F.when(F.col("n_tokens") < 30, "too_short")
        .when(F.col("stopword_ratio") > 0.2, "boilerplate")
        .when(F.col("uniq_ratio") < 0.15, "repetitive")
        .otherwise("ok")
    )
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        "stopword_ratio",
        "uniq_ratio",
        flag.alias("quality_flag"),
    )


# --- doc_language_id: corpus-profile language identification ----------------
# Build a top-10 characteristic-token profile per language from the corpus,
# score each document by integer token overlap, argmax with deterministic
# tie-break.  Integer scoring keeps the query bit-exact across engines.

_LANGID_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
), profile AS (
  SELECT lang, token FROM (
    SELECT lang, token, COUNT(*) AS cnt,
      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rn
    FROM tok GROUP BY lang, token
  ) WHERE rn <= 10
), doc_tok AS (
  SELECT DISTINCT doc_id, token FROM tok
), scores AS (
  SELECT d.doc_id, p.lang AS cand_lang, COUNT(*) AS score
  FROM doc_tok d JOIN profile p ON d.token = p.token
  GROUP BY d.doc_id, p.lang
), best AS (
  SELECT doc_id, cand_lang, CAST(score AS BIGINT) AS score,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, cand_lang) AS rn
  FROM scores
)
SELECT doc.doc_id, doc.lang,
       COALESCE(b.cand_lang, 'unknown') AS predicted_lang,
       COALESCE(b.score, 0) AS score,
       CAST(CASE WHEN doc.lang = b.cand_lang THEN 1 ELSE 0 END AS BIGINT)
         AS is_correct
FROM documents doc
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON doc.doc_id = b.doc_id
"""


@query("doc_language_id", oracle=_LANGID_ORACLE, tags=("text", "langid"))
def doc_language_id(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.expr(spark_tokens())).alias("token")
    )
    profile = (
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.col("cnt").desc(), F.col("token")
                )
            ),
        )
        .filter(F.col("rn") <= 10)
        .select(F.col("lang").alias("cand_lang"), "token")
    )
    doc_tok = tok.select("doc_id", "token").distinct()
    scores = (
        doc_tok.join(F.broadcast(profile), "token")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("score"))
    )
    best = (
        scores.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("cand_lang")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        d.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("cand_lang", F.lit("unknown")).alias("predicted_lang"),
            F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
            F.when(F.col("lang") == F.col("cand_lang"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_correct"),
        )
    )


# --- doc_fingerprint: md5 content fingerprint + 60-bit numeric form ---------

_FPRINT_ORACLE = f"""
SELECT doc_id,
  md5(text) AS fingerprint,
  {duck_hex2long('text')} AS fingerprint64,
  CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_same_content
FROM documents
"""


@query("doc_fingerprint", oracle=_FPRINT_ORACLE, tags=("text", "fingerprint"))
def doc_fingerprint(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.expr(spark_hex2long("text")).alias("fingerprint64"),
        F.count(F.lit(1))
        .over(Window.partitionBy(F.md5("text")))
        .cast("bigint")
        .alias("n_same_content"),
    )
