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
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
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


def _langid_predictions(spark, sf_dir):
    """Shared prediction frame (doc_id, lang, predicted_lang, score,
    is_correct) — the lang-ID query itself plus the r10 eval queries
    (confusion PRF, Cohen's kappa) all read this one plan."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.expr(spark_tokens())).alias("token")
    )
    # Optimization r14 (guide §2.3/§2.4): the r13 shape consumed `tok`
    # twice — the (lang, token) profile counts and the DISTINCT
    # (doc_id, token) presence each re-scanned + re-exploded the corpus
    # and paid their own full-data exchange.  Both consumers derive from
    # ONE aggregation at the (doc_id, token) grain (lang is functionally
    # dependent on doc_id): profile counts are the per-doc counts summed
    # (a second, much smaller exchange over distinct doc-token rows), and
    # presence is the grain itself.  The lazy localCheckpoint makes the
    # shared frame compute once inside the same job (the bm25 device).
    dtc = (
        tok.groupBy("doc_id", "lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    profile = (
        dtc.groupBy("lang", "token")
        .agg(F.sum("cnt").alias("cnt"))
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
    # dtc rows are unique per (doc_id, token), so a plain count after the
    # profile join IS the distinct-token match count the r13 shape computed
    scores = (
        dtc.join(F.broadcast(profile), "token")
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


@query("doc_language_id", oracle=_LANGID_ORACLE, tags=("text", "langid"))
def doc_language_id(spark, sf_dir):
    return _langid_predictions(spark, sf_dir)


# --- langid_confusion_prf / langid_cohens_kappa: classifier evaluation -------
# The eval half of any model-in-the-loop curation step: per-class
# precision/recall/F1 and chance-corrected agreement (Cohen's kappa) of
# the engine's language-ID predictions against the labeled lang column.
# All metrics are integer ppm (p = tp*1e6 // (tp+fp), f1 = 2pr // (p+r),
# kappa = (po-pe)*1e6 // (1e6-pe)) — bit-exact cross-engine, no doubles.
# Scale shape: both ride the lang-ID prediction plan (one explode + two
# bounded-profile joins) and collapse to the bounded class grain; kappa's
# pe is a |classes|² product join.  BIGINT headroom: Σ row·col ≤ N², and
# N²·1e6 < 2^63 up to N ≈ 3B docs.

_PRED_CTE = f"pred AS MATERIALIZED (SELECT * FROM ({_LANGID_ORACLE}) _p)"

_CONFUSION_ORACLE = f"""
WITH {_PRED_CTE},
classes AS (SELECT DISTINCT lang FROM pred),
tp AS (
  SELECT lang, CAST(COUNT(*) FILTER (WHERE predicted_lang = lang) AS BIGINT)
    AS tp,
    CAST(COUNT(*) FILTER (WHERE predicted_lang <> lang) AS BIGINT) AS fn
  FROM pred GROUP BY lang
), fp AS (
  SELECT predicted_lang AS lang, CAST(COUNT(*) AS BIGINT) AS fp
  FROM pred WHERE predicted_lang <> lang GROUP BY predicted_lang
), m AS (
  SELECT c.lang, COALESCE(t.tp, 0) AS tp, COALESCE(t.fn, 0) AS fn,
    COALESCE(f.fp, 0) AS fp
  FROM classes c
  LEFT JOIN tp t ON t.lang = c.lang
  LEFT JOIN fp f ON f.lang = c.lang
), prf AS (
  SELECT lang, tp, fp, fn,
    CASE WHEN tp + fp = 0 THEN 0
         ELSE (tp * 1000000) // (tp + fp) END AS precision_ppm,
    CASE WHEN tp + fn = 0 THEN 0
         ELSE (tp * 1000000) // (tp + fn) END AS recall_ppm
  FROM m
)
SELECT lang, tp, fp, fn, precision_ppm, recall_ppm,
  CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
       ELSE (2 * precision_ppm * recall_ppm)
         // (precision_ppm + recall_ppm) END AS f1_ppm
FROM prf
"""

_KAPPA_ORACLE = f"""
WITH {_PRED_CTE},
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) FILTER (WHERE predicted_lang = lang) AS BIGINT) AS agree
  FROM pred),
rowsum AS (SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS r
  FROM pred GROUP BY lang),
colsum AS (SELECT predicted_lang AS cls, CAST(COUNT(*) AS BIGINT) AS c
  FROM pred GROUP BY predicted_lang),
pe AS (SELECT CAST(SUM(r.r * c.c) AS BIGINT) AS rc
  FROM rowsum r JOIN colsum c ON r.cls = c.cls)
SELECT n.n, (n.agree * 1000000) // n.n AS po_ppm,
  (pe.rc * 1000000) // (n.n * n.n) AS pe_ppm,
  (((n.agree * 1000000) // n.n - (pe.rc * 1000000) // (n.n * n.n))
    * 1000000)
    // (1000000 - (pe.rc * 1000000) // (n.n * n.n)) AS kappa_ppm
FROM n, pe
"""


def _confusion_matrix(spark, sf_dir):
    """ONE data-sized aggregation of the prediction frame to the bounded
    (lang, predicted_lang) confusion-matrix grain (≤ |classes|·(|classes|+1)
    rows) — every eval metric derives from this tiny frame.  The
    localCheckpoint pins the bounded result so downstream metric branches
    (tp/fn vs fp, rowsums vs colsums) read 36 rows instead of each
    re-executing the explode + profile-join lineage (the same
    bounded-frame checkpoint device as the CC operator)."""
    return (
        _langid_predictions(spark, sf_dir)
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()
    )


@query(
    "langid_confusion_prf",
    oracle=_CONFUSION_ORACLE,
    tags=("text", "langid", "eval"),
)
def langid_confusion_prf(spark, sf_dir):
    cm = _confusion_matrix(spark, sf_dir)
    tp_fn = cm.groupBy("lang").agg(
        F.sum(
            F.when(F.col("predicted_lang") == F.col("lang"), F.col("cnt"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("tp"),
        F.sum(
            F.when(F.col("predicted_lang") != F.col("lang"), F.col("cnt"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("fn"),
    )
    fp = (
        cm.filter(F.col("predicted_lang") != F.col("lang"))
        .groupBy(F.col("predicted_lang").alias("lang"))
        .agg(F.sum("cnt").cast("bigint").alias("fp"))
    )
    m = (
        tp_fn.join(F.broadcast(fp), "lang", "left")
        .fillna(0, subset=["fp"])
        .select(
            "lang",
            "tp",
            F.col("fp").cast("bigint").alias("fp"),
            "fn",
        )
    )
    p = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0)).otherwise(
        F.expr("(tp * 1000000) div (tp + fp)")
    )
    r = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0)).otherwise(
        F.expr("(tp * 1000000) div (tp + fn)")
    )
    prf = m.select(
        "lang",
        "tp",
        "fp",
        "fn",
        p.cast("bigint").alias("precision_ppm"),
        r.cast("bigint").alias("recall_ppm"),
    )
    f1 = F.when(
        F.col("precision_ppm") + F.col("recall_ppm") == 0, F.lit(0)
    ).otherwise(
        F.expr(
            "(2 * precision_ppm * recall_ppm) "
            "div (precision_ppm + recall_ppm)"
        )
    )
    return prf.withColumn("f1_ppm", f1.cast("bigint"))


@query(
    "langid_cohens_kappa",
    oracle=_KAPPA_ORACLE,
    tags=("text", "langid", "eval"),
)
def langid_cohens_kappa(spark, sf_dir):
    # all four scalars (n, agree, pe's row·col product sum) fold from the
    # one checkpointed confusion matrix: its lineage runs once, the rest
    # is algebra on ≤36 rows
    cm = _confusion_matrix(spark, sf_dir)
    n = cm.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("predicted_lang") == F.col("lang"), F.col("cnt"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("agree"),
    )
    rowsum = cm.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("cnt").cast("bigint").alias("r")
    )
    colsum = cm.groupBy(F.col("predicted_lang").alias("cls")).agg(
        F.sum("cnt").cast("bigint").alias("c")
    )
    pe = (
        rowsum.join(F.broadcast(colsum), "cls")
        .agg(F.sum(F.col("r") * F.col("c")).cast("bigint").alias("rc"))
    )
    return (
        n.transform(with_scalar_frame(pe))
        .selectExpr(
            "n",
            "(agree * 1000000) div n AS po_ppm",
            "(rc * 1000000) div (n * n) AS pe_ppm",
            "(((agree * 1000000) div n - (rc * 1000000) div (n * n)) "
            "* 1000000) div (1000000 - (rc * 1000000) div (n * n)) "
            "AS kappa_ppm",
        )
        .selectExpr(
            "cast(n as bigint) AS n",
            "cast(po_ppm as bigint) AS po_ppm",
            "cast(pe_ppm as bigint) AS pe_ppm",
            "cast(kappa_ppm as bigint) AS kappa_ppm",
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
