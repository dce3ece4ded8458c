"""Corpus-curation queries: the end-to-end LLM-training-data path composing
the engine's text operators — exact dedup → quality gate → language filter →
deterministic train/val/test split — plus the per-doc decision audit.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions.text import duck_hex2long, spark_hex2long
from zeta_etl_spark.operators.sampling import hash_split
from zeta_etl_spark.queries.registry import T, query

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]

# --- corpus_curation: keep/drop decision per document ------------------------
# Rules (each deterministic + engine-portable):
#   dup      — not the lowest doc_id for its exact content hash
#   too_short— fewer than 30 tokens
#   low_qual — unique-token ratio < 0.15 (repetitive)
#   keep     — everything else, assigned an md5-bucket split

_CURATION_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, md5(text) AS content_hash,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS uniq_ratio
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id)
    AS copy_rank
  FROM base
), decided AS (
  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
    CASE WHEN copy_rank > 1 THEN 'drop:duplicate'
         WHEN n_tokens < 30 THEN 'drop:too_short'
         WHEN uniq_ratio < 0.15 THEN 'drop:low_quality'
         ELSE 'keep' END AS decision
  FROM ranked
)
SELECT doc_id, lang, n_tokens, decision,
  CASE WHEN decision = 'keep' THEN (
    CASE WHEN ({duck_hex2long('CAST(doc_id AS VARCHAR)', digits=8)} % 10000)
              < 8000 THEN 'train'
         WHEN ({duck_hex2long('CAST(doc_id AS VARCHAR)', digits=8)} % 10000)
              < 9000 THEN 'val'
         ELSE 'test' END
  ) ELSE NULL END AS split
FROM decided
"""


@query("corpus_curation", oracle=_CURATION_ORACLE, tags=("text", "curation", "sampling"))
def corpus_curation(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("content_hash"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )
    ranked = base.withColumn(
        "copy_rank",
        F.row_number().over(
            Window.partitionBy("content_hash").orderBy("doc_id")
        ),
    )
    decision = (
        F.when(F.col("copy_rank") > 1, "drop:duplicate")
        .when(F.col("n_tokens") < 30, "drop:too_short")
        .when(F.col("uniq_ratio") < 0.15, "drop:low_quality")
        .otherwise("keep")
    )
    decided = ranked.select(
        "doc_id", "lang", "n_tokens", decision.alias("decision")
    )
    split_assigned = hash_split(decided, "doc_id", _SPLITS)
    return split_assigned.withColumn(
        "split",
        F.when(F.col("decision") == "keep", F.col("split")).otherwise(
            F.lit(None).cast("string")
        ),
    )


# --- split_balance: audit of the deterministic splitter ----------------------

_SPLIT_BALANCE_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id,
    CASE WHEN ({duck_hex2long('CAST(doc_id AS VARCHAR)', digits=8)} % 10000)
              < 8000 THEN 'train'
         WHEN ({duck_hex2long('CAST(doc_id AS VARCHAR)', digits=8)} % 10000)
              < 9000 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM assigned GROUP BY split
"""


@query("split_balance", oracle=_SPLIT_BALANCE_ORACLE, tags=("sampling",))
def split_balance(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id")
    assigned = hash_split(d, "doc_id", _SPLITS)
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )
