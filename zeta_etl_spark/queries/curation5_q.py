"""Curation batch 5: actionable span-level dedup (removal, not just the
fraction signal) and the tokenizer-shard export manifest.

- ``span_dedup_removal`` upgrades `duplicated_span_fraction` from a signal
  to an ACTION: tokens covered by any cross-document duplicated window are
  dropped and the cleaned text is reconstructed — the Lee et al. exact-
  substring dedup as the pipeline would actually apply it.
- ``tokenizer_shard_manifest`` is the export step after `corpus_pack_docs`:
  packs group into fixed-size shards and the manifest records per-shard
  doc/token accounting — what a training loader consumes instead of
  listing parquet files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query

# --- span_dedup_removal ------------------------------------------------------
# Token t of a doc is dropped iff some 8-token window that covers t also
# occurs verbatim in ANOTHER document.  Output is per-doc accounting plus
# the md5 of the reconstructed cleaned text (narrow result; the text
# itself stays in the engine).  Scale shape: windows hash to 60-bit
# BIGINTs before the explode (8 bytes per window on the shuffle); the
# shared-gram set is one groupBy + semi-join back; the per-token coverage
# test is a bounded HOF scan over the doc's own shared-window starts —
# no token-grain join ever leaves the doc.

_SPAN_K = 8


def _rm_oracle() -> str:
    from zeta_etl_spark.queries.curation4_q import _duck_window_hashes

    return f"""
WITH sh AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         {_duck_window_hashes()} AS whs
  FROM documents
), w AS (
  SELECT doc_id, unnest(whs) AS g,
         generate_subscripts(whs, 1) - 1 AS j
  FROM sh
), shared AS (
  SELECT g FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), starts AS (
  SELECT w.doc_id, list(w.j) AS js
  FROM w JOIN shared USING (g) GROUP BY w.doc_id
), toks AS (
  SELECT sh.doc_id, unnest(sh.toks) AS token,
         generate_subscripts(sh.toks, 1) - 1 AS t,
         COALESCE(st.js, []) AS js
  FROM sh LEFT JOIN starts st ON st.doc_id = sh.doc_id
), marked AS (
  SELECT doc_id, token, t,
    len(list_filter(js, j -> j <= t AND t <= j + {_SPAN_K} - 1)) > 0
      AS dropped
  FROM toks
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) FILTER (WHERE dropped) AS BIGINT) AS n_dropped,
  md5(COALESCE(
    string_agg(CASE WHEN NOT dropped THEN token END, ' ' ORDER BY t), ''))
    AS cleaned_md5
FROM marked GROUP BY doc_id
"""


def _spark_window_hash_structs() -> str:
    from zeta_etl_spark.queries.curation4_q import _spark_window_hashes

    # (hash, start) structs so shared-window starts survive the explode
    return (
        f"transform({_spark_window_hashes()}, (g, j) -> struct(g AS g, j AS j))"
    )


@query(
    "span_dedup_removal",
    oracle=_rm_oracle(),
    tags=("dedup", "spans", "curation", "action"),
)
def span_dedup_removal(spark, sf_dir):
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    win = d.select(
        "doc_id",
        F.explode(F.expr(_spark_window_hash_structs())).alias("w"),
    ).select("doc_id", F.col("w.g").alias("g"), F.col("w.j").alias("j"))
    win = win.cache()  # feeds the shared-gram groupBy AND the starts join
    shared = (
        win.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter("nd >= 2")
        .select("g")
    )
    starts = (
        win.join(shared, "g")
        .groupBy("doc_id")
        .agg(F.collect_list("j").alias("js"))
    )
    toks = d.join(starts, "doc_id", "left").select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.coalesce("js", F.expr("cast(array() as array<int>)")).alias("js"),
    )
    k = _SPAN_K
    marked = toks.select(
        "doc_id",
        F.expr(
            "transform(toks, (x, t) -> struct(x AS token, "
            f"exists(js, j -> j <= t AND t <= j + {k} - 1) AS dropped))"
        ).alias("m"),
    )
    return marked.select(
        "doc_id",
        F.expr("cast(size(m) as bigint)").alias("n_tokens"),
        F.expr(
            "cast(size(filter(m, s -> s.dropped)) as bigint)"
        ).alias("n_dropped"),
        F.md5(
            F.expr(
                "array_join(transform(filter(m, s -> NOT s.dropped), "
                "s -> s.token), ' ')"
            )
        ).alias("cleaned_md5"),
    )


# --- tokenizer_shard_manifest ------------------------------------------------
# Packs (fixed 256-token windows of each source's doc stream,
# `corpus_pack_docs`) group into shards of 4 packs; the manifest records,
# per (source, shard): docs STARTING there, token mass starting there,
# the pack span, and how many docs spill over the shard's right edge
# (loader prefetch hint).  Pure integer arithmetic over the packing
# query's output — one extra groupBy, no new text pass.

_PACKS_PER_SHARD = 4


def _manifest_oracle() -> str:
    from zeta_etl_spark.queries.curation_q import _PACK_ORACLE

    p = _PACKS_PER_SHARD
    return f"""
WITH packed AS ({_PACK_ORACLE})
SELECT source,
  CAST(start_pack // {p} AS BIGINT) AS shard_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(MIN(start_pack) AS BIGINT) AS first_pack,
  CAST(MAX(end_pack) AS BIGINT) AS last_pack,
  CAST(COUNT(*) FILTER (WHERE end_pack // {p} > start_pack // {p}) AS BIGINT)
    AS n_spill_docs
FROM packed
GROUP BY source, start_pack // {p}
"""


@query(
    "tokenizer_shard_manifest",
    oracle=_manifest_oracle(),
    tags=("curation", "packing", "export"),
)
def tokenizer_shard_manifest(spark, sf_dir):
    from zeta_etl_spark.queries.curation_q import corpus_pack_docs

    packed = corpus_pack_docs(spark, sf_dir)
    p = _PACKS_PER_SHARD
    return packed.groupBy(
        "source", F.expr(f"start_pack div {p}").alias("shard_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("start_pack").cast("bigint").alias("first_pack"),
        F.max("end_pack").cast("bigint").alias("last_pack"),
        F.count(
            F.when(
                F.expr(f"end_pack div {p} > start_pack div {p}"), F.lit(1)
            )
        )
        .cast("bigint")
        .alias("n_spill_docs"),
    )


# --- corpus_shuffle_shards: deterministic global training-order shuffle ------
# The step between curation and shard export a training loader depends on:
# a SEEDED pseudorandom global permutation of the corpus (md5 order — the
# repo's engine-portable randomness), realized as exact global positions
# via operators/windows.global_row_number (no single-task sort of the
# corpus), then cut into fixed-size shards.  Output is the per-shard
# manifest: doc count, position range, boundary docs, and a pmod-reduced
# order checksum that pins the ENTIRE permutation (any transposition
# changes it) while keeping the compared result one row per shard at any
# scale.

_SHARD_SIZE = 100
_CKP = 2147483647  # 2^31 - 1: pmod(a,P)*pmod(b,P) < P^2 < BIGINT max

_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents
), p AS (
  SELECT doc_id,
    CAST(ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS BIGINT) AS pos
  FROM h
), s AS (
  SELECT doc_id, pos, (pos - 1) // {_SHARD_SIZE} AS shard FROM p
)
SELECT CAST(shard AS BIGINT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MIN(pos) AS BIGINT) AS first_pos,
  CAST(MAX(pos) AS BIGINT) AS last_pos,
  CAST(MIN(CASE WHEN pos = first_pos_w THEN doc_id END) AS BIGINT)
    AS first_doc,
  CAST(SUM((doc_id % {_CKP}) * (pos % {_CKP}) % {_CKP}) AS BIGINT)
    AS order_checksum
FROM (
  SELECT *, MIN(pos) OVER (PARTITION BY shard) AS first_pos_w FROM s
)
GROUP BY shard
"""


@query(
    "corpus_shuffle_shards",
    oracle=_SHUFFLE_ORACLE,
    tags=("curation", "shuffle", "scale"),
)
def corpus_shuffle_shards(spark, sf_dir):
    from zeta_etl_spark.operators.windows import global_row_number
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    pos = global_row_number(
        d, [F.col("hk").asc(), F.col("doc_id").asc()], out_col="pos"
    ).select("doc_id", "pos")
    s = pos.withColumn("shard", F.expr(f"(pos - 1) div {_SHARD_SIZE}"))
    w = Window.partitionBy("shard")
    s = s.withColumn("first_pos_w", F.min("pos").over(w))
    return s.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("pos").cast("bigint").alias("first_pos"),
        F.max("pos").cast("bigint").alias("last_pos"),
        F.min(F.when(F.col("pos") == F.col("first_pos_w"), F.col("doc_id")))
        .cast("bigint")
        .alias("first_doc"),
        F.sum(
            F.expr(f"pmod(pmod(doc_id, {_CKP}) * pmod(pos, {_CKP}), {_CKP})")
        )
        .cast("bigint")
        .alias("order_checksum"),
    )


# --- exact_stratified_split: floor-exact per-stratum val/test carve-out ------
# hash_split gives split sizes correct IN EXPECTATION (each doc rolls an
# independent md5 bucket); evaluation protocols often require EXACT counts
# per stratum — floor(p·n) val and test docs from every source, no
# variance.  Realized as a per-stratum md5 rank (plain partitioned window,
# distributed by source) cut at exact thresholds.  Output per (source,
# split): exact count + membership checksum, bounded rows at any scale.

_STRAT_ORACLE = f"""
WITH r AS (
  SELECT source, doc_id,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn,
    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM documents
), lab AS (
  SELECT source, doc_id,
    CASE WHEN rn <= n // 10 THEN 'val'
         WHEN rn <= 2 * (n // 10) THEN 'test'
         ELSE 'train' END AS split
  FROM r
)
SELECT source, split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(doc_id % {_CKP}) AS BIGINT) AS member_checksum
FROM lab GROUP BY source, split
"""


@query(
    "exact_stratified_split",
    oracle=_STRAT_ORACLE,
    tags=("curation", "split", "sampling"),
)
def exact_stratified_split(spark, sf_dir):
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents").select(
        "source", "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
    )
    wr = Window.partitionBy("source").orderBy("hk", "doc_id")
    wn = Window.partitionBy("source")
    r = d.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    lab = r.withColumn(
        "split",
        F.when(F.expr("rn <= n div 10"), "val")
        .when(F.expr("rn <= 2 * (n div 10)"), "test")
        .otherwise("train"),
    )
    return lab.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr(f"doc_id % {_CKP}")).cast("bigint").alias(
            "member_checksum"
        ),
    )


# --- pii_scrub_audit: the pre-release PII sweep over a text corpus ----------
# Training-data pipelines audit (and then scrub) personally-identifiable
# spans before release; the operator is regex extraction + per-source
# accounting.  The synthetic corpus contains no natural PII, so a
# deterministic augmentation (doc_id-derived emails / IPv4s / phone
# numbers on residue classes 7/11/13) is applied IDENTICALLY on both
# engines — the graded artifact is the audit machinery (pattern
# extraction counts, per-source rollup, at-risk ppm), exercised with
# guaranteed-nonzero matches at every scale factor.  Patterns stay in
# the Java-regex ∩ RE2 common subset (no lookarounds, non-capturing
# groups, explicit group 0) so Spark and DuckDB agree byte-for-byte.
# Scale shape: one projection + one hash agg on the bounded source
# grain; the regex runs inside whole-stage codegen, never in Python.

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_IPV4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
_PII_PHONE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT source,
    text
      || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
           || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
         ELSE '' END
      || CASE WHEN doc_id % 11 = 0 THEN ' from 10.'
           || CAST(doc_id % 256 AS VARCHAR) || '.0.'
           || CAST(doc_id % 200 AS VARCHAR) || ' logged'
         ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' call '
           || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
           || CAST(100 + doc_id % 890 AS VARCHAR) || '-'
           || CAST(1000 + doc_id % 9000 AS VARCHAR)
         ELSE '' END AS t
  FROM documents
), per_doc AS (
  SELECT source,
    CAST(len(regexp_extract_all(t, '{_PII_EMAIL}', 0)) AS BIGINT) AS e,
    CAST(len(regexp_extract_all(t, '{_PII_IPV4}', 0)) AS BIGINT) AS i,
    CAST(len(regexp_extract_all(t, '{_PII_PHONE}', 0)) AS BIGINT) AS p
  FROM aug
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(COUNT(*) FILTER (WHERE e + i + p > 0) AS BIGINT) AS docs_with_pii,
  CAST(SUM(e) AS BIGINT) AS emails,
  CAST(SUM(i) AS BIGINT) AS ipv4s,
  CAST(SUM(p) AS BIGINT) AS phones,
  (CAST(COUNT(*) FILTER (WHERE e + i + p > 0) AS BIGINT) * 1000000)
    // COUNT(*) AS pii_doc_ppm
FROM per_doc GROUP BY source
"""


@query(
    "pii_scrub_audit",
    oracle=_PII_ORACLE,
    tags=("curation", "privacy", "text"),
)
def pii_scrub_audit(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    aug = d.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(" logged"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call "),
                    (100 + F.col("doc_id") % 900).cast("string"),
                    F.lit("-"),
                    (100 + F.col("doc_id") % 890).cast("string"),
                    F.lit("-"),
                    (1000 + F.col("doc_id") % 9000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    cnt = aug.select(
        "source",
        F.size(
            F.regexp_extract_all(F.col("t"), F.lit(_PII_EMAIL), F.lit(0))
        ).cast("bigint").alias("e"),
        F.size(
            F.regexp_extract_all(F.col("t"), F.lit(_PII_IPV4), F.lit(0))
        ).cast("bigint").alias("i"),
        F.size(
            F.regexp_extract_all(F.col("t"), F.lit(_PII_PHONE), F.lit(0))
        ).cast("bigint").alias("p"),
    )
    hit = (F.col("e") + F.col("i") + F.col("p")) > 0
    return cnt.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(hit, F.lit(1))).cast("bigint").alias("docs_with_pii"),
        F.sum("e").cast("bigint").alias("emails"),
        F.sum("i").cast("bigint").alias("ipv4s"),
        F.sum("p").cast("bigint").alias("phones"),
        F.expr(
            "cast(count(case when e + i + p > 0 then 1 end) * 1000000 "
            "div count(1) as bigint)"
        ).alias("pii_doc_ppm"),
    )
