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


# --- contamination_check: train/test n-gram containment ---------------------
# The benchmark-decontamination pass every LLM data pipeline needs: for each
# eval-split document, the fraction of its shingles that appear anywhere in
# the train split.  Split assignment reuses the deterministic md5-bucket
# rule (operators/sampling.py); containment joins the eval docs' shingle
# arrays against the DISTINCT train shingle set — the join is a semi-join on
# the exploded eval side only, so cost scales with eval size (small), never
# train size × eval size.

_CONTAM_ORACLE = f"""
WITH splits AS (
  SELECT doc_id, text,
    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 10 < 8 THEN 'train' ELSE 'eval' END AS split
  FROM documents
), train_shingles AS (
  SELECT DISTINCT s.sh FROM splits,
    UNNEST({{dsh}}) AS s(sh) WHERE split = 'train'
), eval_docs AS (
  SELECT doc_id, {{dsh}} AS sh FROM splits WHERE split = 'eval'
), ex AS (
  SELECT doc_id, s.sh FROM eval_docs, UNNEST(sh) AS s(sh)
), hits AS (
  SELECT e.doc_id,
    COUNT(*) AS n_shingles,
    COUNT(t.sh) AS n_contaminated
  FROM ex e LEFT JOIN train_shingles t ON e.sh = t.sh
  GROUP BY 1
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
  CAST(n_contaminated AS BIGINT) AS n_contaminated,
  CAST(n_contaminated AS DOUBLE) / n_shingles AS contamination
FROM hits WHERE n_shingles > 0
"""


def _contam_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_shingles

    return _CONTAM_ORACLE.format(dsh=duck_shingles("text", 5))


@query(
    "contamination_check",
    oracle=_contam_oracle(),
    tags=("curation", "dedup", "contamination"),
)
def contamination_check(spark, sf_dir):
    from zeta_etl_spark.functions.text import spark_shingles

    d = T(spark, sf_dir, "documents")
    split = F.when(
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) "
            "as bigint) % 10 < 8"
        ),
        "train",
    ).otherwise("eval")
    splits = d.select("doc_id", "text", split.alias("split"))
    sh = F.expr(spark_shingles("text", 5))
    train_shingles = (
        splits.filter("split = 'train'")
        .select(F.explode(sh).alias("sh"))
        .distinct()
    )
    ex = splits.filter("split = 'eval'").select(
        "doc_id", F.explode(sh).alias("sh")
    )
    hits = (
        ex.join(train_shingles.withColumn("_hit", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    return hits.filter(F.col("n_shingles") > 0).select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        (
            F.col("n_contaminated").cast("double") / F.col("n_shingles")
        ).alias("contamination"),
    )


# --- doc_repetition: repetition-ratio quality signal ------------------------
# Boilerplate/templated text shows up as a high most-frequent-token share and
# a low distinct-token ratio — the standard cheap repetition filters.

_REPEAT_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.tok FROM documents,
    UNNEST(string_split(text, ' ')) AS t(tok)
), counts AS (
  SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2
), stats AS (
  SELECT doc_id,
    SUM(n) AS n_tokens,
    COUNT(*) AS n_distinct,
    MAX(n) AS top_count
  FROM counts GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  CAST(top_count AS BIGINT) AS top_count,
  CAST(top_count AS DOUBLE) / n_tokens AS top_token_share,
  CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio
FROM stats
"""


@query("doc_repetition", oracle=_REPEAT_ORACLE, tags=("curation", "quality"))
def doc_repetition(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    stats = counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top_count"),
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_count",
        (F.col("top_count").cast("double") / F.col("n_tokens")).alias(
            "top_token_share"
        ),
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "distinct_ratio"
        ),
    )


# --- corpus_pack_docs: token-budget sequence packing -------------------------
# The pretraining packing step (VERDICT r2 next-7): documents are
# concatenated per shard (source, doc_id order) into a token stream and cut
# into fixed-budget packs of 256 tokens; each doc's span is its
# [start_pack, end_pack] range plus the offset of its first token inside
# start_pack.  No pack exceeds the budget BY CONSTRUCTION (packs are exact
# 256-token windows of the stream) and every doc is packed exactly once —
# both invariants property-tested in tests/test_properties.py.
#
# Scale design: ONE cumulative-sum window per shard (W1 primitive), integer
# `div`/`%` arithmetic only — no joins, no iteration; shards (source) bound
# the window partitions, so 100 TB packs as |shards| independent sorted
# scans.  Integer division keeps the math exact far beyond double precision
# (cumulative sums at 100 TB exceed 2^53 tokens).

_PACK_BUDGET = 256

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
  CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS start_pack,
  CAST(GREATEST((cum - 1) // {_PACK_BUDGET},
                (cum - n_tokens) // {_PACK_BUDGET}) AS BIGINT) AS end_pack,
  CAST((cum - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS start_offset,
  CAST(CASE WHEN GREATEST((cum - 1) // {_PACK_BUDGET},
                          (cum - n_tokens) // {_PACK_BUDGET})
                 > (cum - n_tokens) // {_PACK_BUDGET}
            THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
FROM c
"""


@query("corpus_pack_docs", oracle=_PACK_ORACLE, tags=("curation", "packing"))
def corpus_pack_docs(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = base.withColumn("cum", F.sum("n_tokens").over(w))
    b = _PACK_BUDGET
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {b}").alias("start_pack"),
        F.expr(
            f"greatest((cum - 1) div {b}, (cum - n_tokens) div {b})"
        ).alias("end_pack"),
        F.expr(f"(cum - n_tokens) % {b}").alias("start_offset"),
        F.expr(
            f"cast(if(greatest((cum - 1) div {b}, (cum - n_tokens) div {b})"
            f" > (cum - n_tokens) div {b}, 1, 0) as bigint)"
        ).alias("spans_boundary"),
    )
