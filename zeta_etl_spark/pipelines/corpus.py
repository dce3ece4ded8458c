"""End-to-end LLM training-data pipeline as a materialized medallion DAG:

    documents (bronze)
      → doc_stats        (silver: token stats + quality signals, 1 text pass)
      → quality_gate     (silver: Gopher rule battery + exact-dup rank)
      → kept_docs        (gold: survivors with split assignment)
      → packed_sequences (gold: token-budget packing of the kept stream)
      → corpus_report    (gold: per-split/per-source accounting)

This composes the registry's individually-verified operators (exact dedup,
gopher_quality_rules' battery, hash_split, corpus_pack_docs' cumsum packing)
into the durable pipeline shape a production run would deploy — each node
materializes to parquet, so reruns resume from silver and downstream
consumers (tokenizer shards, trainers) read columnar pruned scans.

Scale notes: one text pass computes every per-doc signal (doc_stats);
the dup rank is the only content-hash shuffle; packing is one cumsum
window per (split, source) shard; the report is a map-side-combinable
rollup.  No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.operators.sampling import hash_split
from zeta_etl_spark.plans.graph import Pipeline

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_PACK_BUDGET = 256
_MIN_TOKENS = 30
_MIN_STOPWORD_HITS = 2
_STOPWORDS = "'the','a','of','to','and','in','is','it'"


def build_corpus_pipeline(
    spark: SparkSession, base_path: str, docs: DataFrame
) -> Pipeline:
    p = Pipeline("corpus", base_path)
    n_part = spark.sparkContext.defaultParallelism

    @p.table(name="doc_stats", quality="silver",
             comment="per-doc token stats + quality signals, one text pass")
    def doc_stats(pl):
        toks = "split(text, ' ')"
        return docs.repartition(n_part, "doc_id").select(
            "doc_id",
            "source",
            "lang",
            F.md5("text").alias("content_hash"),
            F.expr(f"cast(size({toks}) as bigint)").alias("n_tokens"),
            F.expr(
                f"cast(size(array_distinct({toks})) as bigint)"
            ).alias("n_uniq_tokens"),
            F.expr(
                f"cast(size(filter({toks}, w -> w in ({_STOPWORDS}))) "
                "as bigint)"
            ).alias("stopword_hits"),
        )

    @p.table(name="quality_gate", quality="silver",
             comment="keep/drop decision with attributable reason")
    def quality_gate(pl):
        s = pl.read("doc_stats")
        w = Window.partitionBy("content_hash").orderBy("doc_id")
        ranked = s.withColumn("copy_rank", F.row_number().over(w))
        return ranked.withColumn(
            "decision",
            F.when(F.col("copy_rank") > 1, "drop:duplicate")
            .when(F.col("n_tokens") < _MIN_TOKENS, "drop:too_short")
            .when(
                F.col("stopword_hits") < _MIN_STOPWORD_HITS,
                "drop:low_quality",
            )
            .otherwise("keep"),
        )

    @p.table(name="kept_docs", quality="gold", partition_by=("split",),
             comment="curation survivors with deterministic split")
    def kept_docs(pl):
        kept = pl.read("quality_gate").filter(F.col("decision") == "keep")
        return hash_split(kept, "doc_id", _SPLITS).select(
            "doc_id", "source", "lang", "n_tokens", "split"
        )

    @p.table(name="packed_sequences", quality="gold", partition_by=("split",),
             comment="token-budget packing per (split, source) shard")
    def packed_sequences(pl):
        k = pl.read("kept_docs")
        w = (
            Window.partitionBy("split", "source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = k.withColumn("cum", F.sum("n_tokens").over(w))
        b = _PACK_BUDGET
        return c.select(
            "doc_id",
            "split",
            "source",
            "n_tokens",
            F.expr(f"(cum - n_tokens) div {b}").alias("start_pack"),
            F.expr(
                f"greatest((cum - 1) div {b}, (cum - n_tokens) div {b})"
            ).alias("end_pack"),
            F.expr(f"(cum - n_tokens) % {b}").alias("start_offset"),
        )

    @p.table(name="corpus_report", quality="gold",
             comment="per-split accounting: docs, tokens, packs")
    def corpus_report(pl):
        packed = pl.read("packed_sequences")
        return packed.groupBy("split").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.max(F.col("end_pack")) + 1).alias("max_packs_in_shard"),
            F.countDistinct("source").alias("n_sources"),
        )

    return p
