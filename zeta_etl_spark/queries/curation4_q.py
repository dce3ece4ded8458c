"""Curation batch 4: canonical-document selection inside exact-dup groups,
per-document n-gram novelty, and sqrt-temperature source mixture weights.

All three are standard large-corpus training-data operations (dedup keep
rules, novelty filtering, mixture reweighting).  Cross-engine determinism
follows the house rules: integer counts + ONE final integer division
(``div`` ↔ ``//``), and the only float op is IEEE-exact ``sqrt`` whose
result is floor-scaled to BIGINT before any summation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from zeta_etl_spark.functions.text import duck_shingles, spark_shingles
from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- canonical_doc_selection: quality-keep rule inside exact-dup groups ------
# exact_dedup_docs keeps MIN(doc_id) per content hash; production curation
# keeps the BEST copy (here: longest n_chars, deterministic doc_id
# tie-break) and records how many copies it shadows.  One shuffle on the
# content hash; the window never sees more rows than the group.

_CANON_ORACLE = """
WITH g AS (
  SELECT doc_id, source, n_chars, md5(text) AS content_hash,
    row_number() OVER (
      PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id
    ) AS rn,
    COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
  FROM documents
)
SELECT content_hash, doc_id AS kept_doc_id, source AS kept_source,
  CAST(n_chars AS BIGINT) AS kept_n_chars, CAST(n_copies AS BIGINT) AS n_copies
FROM g WHERE rn = 1
"""


@query(
    "canonical_doc_selection",
    oracle=_CANON_ORACLE,
    tags=("dedup", "curation", "window"),
)
def canonical_doc_selection(spark, sf_dir):
    d = T(spark, sf_dir, "documents").withColumn(
        "content_hash", F.md5("text")
    )
    part = W.partitionBy("content_hash")
    ranked = d.select(
        "content_hash",
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(part.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(part).alias("n_copies"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "content_hash",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("source").alias("kept_source"),
        F.col("n_chars").cast("bigint").alias("kept_n_chars"),
        F.col("n_copies").cast("bigint").alias("n_copies"),
    )


# --- ngram_novelty: how much of each doc appears nowhere else ----------------
# Distinct 3-shingles per doc; a shingle is "novel" when exactly one doc
# contains it.  Scale shape: one explode, one shuffle on the shingle (the
# ownership count), one shuffle back on doc_id — the same inverted-index
# seam as ngram_jaccard_pairs, no pairwise work at all.

_NOVEL_K = 3

_NOVEL_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {duck_shingles(k=_NOVEL_K)} AS shingles FROM documents
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), owners AS (
  SELECT shingle, COUNT(*) AS n_owner_docs FROM ex GROUP BY shingle
), per_doc AS (
  SELECT e.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_shingles,
    CAST(SUM(CASE WHEN o.n_owner_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_novel
  FROM ex e JOIN owners o ON o.shingle = e.shingle
  GROUP BY e.doc_id
)
SELECT doc_id, n_shingles, n_novel,
  (1000 * n_novel) // n_shingles AS novelty_permille
FROM per_doc
"""


@query("ngram_novelty", oracle=_NOVEL_ORACLE, tags=("text", "curation", "ngram"))
def ngram_novelty(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        F.explode(F.expr(spark_shingles(k=_NOVEL_K))).alias("shingle"),
    )
    owners = ex.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("n_owner_docs")
    )
    per_doc = (
        ex.join(owners, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("n_owner_docs") == 1, F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.expr("(1000 * n_novel) div n_shingles").alias("novelty_permille"),
    )


# --- source_mixture_weights: temperature-scaled sampling weights -------------
# Mixture reweighting p_s ∝ n_s^(1/T) with T = 2 (i.e. sqrt smoothing —
# upweights small sources, the standard multi-source LLM recipe).  sqrt is
# IEEE-correctly-rounded so Spark and DuckDB agree bit-for-bit; each
# sqrt is floor-scaled to BIGINT *before* the cross-source sum (float sums
# of 3+ terms are order-dependent; integer sums are not).

_MIX_ORACLE = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs, n_tokens,
    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      AS w_scaled
  FROM s
), tot AS (
  SELECT CAST(SUM(w_scaled) AS BIGINT) AS total FROM w
)
SELECT source, n_docs, n_tokens,
  (1000000 * w_scaled) // total AS weight_ppm
FROM w CROSS JOIN tot
"""


@query(
    "source_mixture_weights",
    oracle=_MIX_ORACLE,
    tags=("curation", "sampling", "mixture"),
)
def source_mixture_weights(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = s.withColumn(
        "w_scaled",
        F.expr(
            "cast(floor(sqrt(cast(n_tokens as double)) * 1000000 + 0.5)"
            " as bigint)"
        ),
    )
    tot = w.agg(F.sum("w_scaled").cast("bigint").alias("total"))
    return (
        w.transform(with_scalar_frame(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("(1000000 * w_scaled) div total").alias("weight_ppm"),
        )
    )


# --- duplicated_span_fraction: exact-substring dedup signal ------------------
# Lee et al., "Deduplicating Training Data Makes Language Models Better"
# (ACL 2022): the actionable unit is the repeated SPAN, not the whole-doc
# near-dup.  Per document: how many of its positional 8-token windows also
# occur (verbatim) in at least one OTHER document.  High fractions mark
# boilerplate/templated text that whole-doc MinHash misses.
# Scale shape: windows are hashed to 60-bit BIGINTs before the explode so
# the token-grain shuffle carries 8 bytes per window, not the text; the
# shared-gram set is produced by one groupBy and semi-joined back — the
# same inverted-index seam as ngram_novelty/hapax_fraction, no pairwise
# doc×doc work at any point.

_SPAN_K = 8


def _spark_window_hashes(col: str = "text", k: int = _SPAN_K) -> str:
    from zeta_etl_spark.functions.text import spark_hex2long, spark_tokens

    toks = spark_tokens(col)
    wins = (
        f"case when size({toks}) >= {k} then "
        f"transform(sequence(0, size({toks}) - {k}), "
        f"j -> concat_ws(' ', slice({toks}, j + 1, {k}))) "
        f"else cast(array() as array<string>) end"
    )
    return f"transform({wins}, s -> {spark_hex2long('s')})"


def _duck_window_hashes(col: str = "text", k: int = _SPAN_K) -> str:
    from zeta_etl_spark.functions.text import duck_hex2long, duck_tokens

    toks = duck_tokens(col)
    wins = (
        f"list_transform(range(0, greatest(len({toks}) - {k}, -1) + 1), "
        f"j -> array_to_string({toks}[j + 1:j + {k}], ' '))"
    )
    return f"list_transform({wins}, s -> {duck_hex2long('s')})"


_SPAN_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest({_duck_window_hashes()}) AS g FROM documents
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id
), shared AS (
  SELECT g FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), sc AS (
  SELECT w.doc_id, COUNT(*) AS n_shared
  FROM w JOIN shared USING (g) GROUP BY w.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
  CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
  CASE WHEN COALESCE(p.n_windows, 0) = 0 THEN 0.0
       ELSE CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / p.n_windows
  END AS dup_fraction
FROM documents d
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
LEFT JOIN sc s ON s.doc_id = d.doc_id
"""


@query(
    "duplicated_span_fraction",
    oracle=_SPAN_ORACLE,
    tags=("dedup", "spans", "curation"),
)
def duplicated_span_fraction(spark, sf_dir):
    d = T(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # win feeds three branches (per-doc counts, shared-gram set, shared
    # counts) whose groupBys partition on different keys — cache so the
    # corpus tokenize + window-hash + explode pass runs once, not three
    # times
    win = d.select(
        "doc_id", F.explode(F.expr(_spark_window_hashes())).alias("g")
    ).cache()
    per_doc = win.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    shared = (
        win.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter("nd >= 2")
        .select("g")
    )
    sc = (
        win.join(shared, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("n_shared", F.lit(0)).cast("double")
                / F.col("n_windows")
            )
            .alias("dup_fraction"),
        )
    )


# --- corpus_snapshot_diff: version reconciliation between corpus snapshots ---
# Every managed corpus ships as versioned snapshots; the reconciliation
# report (added / removed / changed / unchanged per source) is the standard
# pre-release gate before retraining.  Snapshots are simulated
# deterministically from the one documents table: snapshot A drops
# doc_id % 7 = 0, snapshot B revises the text of doc_id % 11 = 0.
# Scale shape: ONE full outer equi join on doc_id (shuffle-partitioned both
# sides), change detection via md5 comparison inside the join projection,
# then a small groupBy — no row-pair work beyond the keyed join.

_DIFF_ORACLE = """
WITH a AS (
  SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
), b AS (
  SELECT doc_id, source,
    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h
  FROM documents
), d AS (
  SELECT COALESCE(a.source, b.source) AS source,
    CASE WHEN a.doc_id IS NULL THEN 'added'
         WHEN b.doc_id IS NULL THEN 'removed'
         WHEN a.h <> b.h THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT source, status, COUNT(*) AS n_docs
FROM d GROUP BY source, status
"""


@query(
    "corpus_snapshot_diff",
    oracle=_DIFF_ORACLE,
    tags=("curation", "diff", "outer"),
)
def corpus_snapshot_diff(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    a = docs.filter("doc_id % 7 != 0").select(
        F.col("doc_id").alias("a_id"),
        F.col("source").alias("a_source"),
        F.md5("text").alias("a_h"),
    )
    b = docs.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("b_source"),
        F.md5(
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("b_h"),
    )
    d = a.join(b, a["a_id"] == b["b_id"], "full_outer").select(
        F.coalesce("a_source", "b_source").alias("source"),
        F.when(F.col("a_id").isNull(), "added")
        .when(F.col("b_id").isNull(), "removed")
        .when(F.col("a_h") != F.col("b_h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return d.groupBy("source", "status").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --- quality_budget_gate: per-source keep-threshold hitting a global budget --
# Corpus assembly works backward from a token/document BUDGET: keep the best
# X% of every source, where "best" is a deterministic integer score and the
# cut is an exact rank-selection threshold (no percentile interpolation —
# the r3 house rule).  Here X = 60%, score = per-mille token uniqueness
# (BIGINT: 1000·distinct div total), tie-broken by doc_id so the budget is
# hit EXACTLY regardless of score ties.  One shuffle on source; windows
# never see more rows than the source group.

_BUDGET_PPC = 60  # keep percentage


def _budget_oracle() -> str:
    from zeta_etl_spark.functions.text import duck_tokens

    return f"""
WITH s AS (
  SELECT doc_id, source,
    CAST(1000 * len(list_distinct({duck_tokens()}))
         // len({duck_tokens()}) AS BIGINT) AS score
  FROM documents
), r AS (
  SELECT doc_id, source, score,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY source) AS n
  FROM s
)
SELECT doc_id, source, score,
  CAST(CASE WHEN rn <= ({_BUDGET_PPC} * n + 99) // 100 THEN 1 ELSE 0 END
    AS BIGINT) AS kept
FROM r
"""


@query(
    "quality_budget_gate",
    oracle=_budget_oracle(),
    tags=("curation", "quality", "quantile"),
)
def quality_budget_gate(spark, sf_dir):
    from pyspark.sql.window import Window

    from zeta_etl_spark.functions.text import spark_tokens

    toks = spark_tokens()
    s = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            f"cast(1000 * size(array_distinct({toks})) div size({toks}) "
            "as bigint)"
        ).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("source")
    r = s.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    kept = F.when(
        F.col("rn") <= F.expr(f"({_BUDGET_PPC} * n + 99) div 100"), 1
    ).otherwise(0)
    return r.select(
        "doc_id", "source", "score", kept.cast("bigint").alias("kept")
    )


# --- zorder_bucket_stats: real Z-order clustering for two-column pruning -----
# The reference's zOrderCols table property is a storage-layout concern this
# engine stands in with sortWithinPartitions; this query implements the
# actual space-filling curve: Morton-interleave (custkey, orderkey mod 2^16)
# and report per-Z-bucket min/max spans of BOTH dimensions — the quantity
# row-group pruning depends on.  Sorting by the interleaved code keeps both
# spans narrow per bucket; sorting by either column alone leaves the other
# span full-range.

def _zorder_oracle() -> str:
    from zeta_etl_spark.operators.reshape import duck_morton_code_sql

    code = duck_morton_code_sql("o_custkey % 65536", "o_orderkey % 65536")
    return f"""
WITH z AS (
  SELECT o_custkey % 65536 AS ck, o_orderkey % 65536 AS ok,
         {code} AS zcode
  FROM orders
), b AS (
  SELECT zcode // 1048576 AS zbucket, ck, ok FROM z
)
SELECT zbucket,
  COUNT(*) AS n_rows,
  MIN(ck) AS ck_min, MAX(ck) AS ck_max,
  MIN(ok) AS ok_min, MAX(ok) AS ok_max
FROM b GROUP BY zbucket
"""


@query(
    "zorder_bucket_stats",
    oracle=_zorder_oracle(),
    tags=("layout", "zorder", "pruning"),
)
def zorder_bucket_stats(spark, sf_dir):
    from zeta_etl_spark.operators.reshape import morton_code_sql

    code = morton_code_sql("o_custkey % 65536", "o_orderkey % 65536")
    z = T(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 65536).alias("ck"),
        (F.col("o_orderkey") % 65536).alias("ok"),
        F.expr(code).alias("zcode"),
    )
    return (
        z.withColumn("zbucket", F.expr("zcode div 1048576"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").alias("ck_min"),
            F.max("ck").alias("ck_max"),
            F.min("ok").alias("ok_min"),
            F.max("ok").alias("ok_max"),
        )
    )


# --- composition_chisq: corpus composition independence check ----------------
# Curation QA: is language independent of source, or do some sources skew
# the language mix?  Pearson chi-square over the lang × source contingency
# table.  Determinism: all inputs are exact BIGINT counts; each cell's
# statistic is computed in ONE expression tree of single IEEE ops
# ((obs·tot − rt·ct)² / (tot·rt·ct) — identical rounding both engines) and
# floor-scaled to BIGINT so the cross-cell SUM is order-independent.
# Scale shape: one groupBy for cells, two tiny broadcast margins, no row
# explosion.

_CHISQ_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
  FROM documents GROUP BY lang, source
), rt AS (
  SELECT lang, CAST(SUM(obs) AS BIGINT) AS row_total FROM cells GROUP BY lang
), ct AS (
  SELECT source, CAST(SUM(obs) AS BIGINT) AS col_total
  FROM cells GROUP BY source
), tot AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS total FROM cells
)
SELECT c.lang, c.source, c.obs,
  CAST(floor(
    ((CAST(c.obs AS DOUBLE) * t.total - CAST(r.row_total AS DOUBLE) * k.col_total)
     * (CAST(c.obs AS DOUBLE) * t.total - CAST(r.row_total AS DOUBLE) * k.col_total))
    / (CAST(t.total AS DOUBLE) * r.row_total * k.col_total)
    * 1000000 + 0.5) AS BIGINT) AS chi_e6
FROM cells c
JOIN rt r ON r.lang = c.lang
JOIN ct k ON k.source = c.source
CROSS JOIN tot t
"""


@query(
    "composition_chisq",
    oracle=_CHISQ_ORACLE,
    tags=("curation", "stats", "composition"),
)
def composition_chisq(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    rt = cells.groupBy("lang").agg(
        F.sum("obs").cast("bigint").alias("row_total")
    )
    ct = cells.groupBy("source").agg(
        F.sum("obs").cast("bigint").alias("col_total")
    )
    tot = cells.agg(F.sum("obs").cast("bigint").alias("total"))
    # cast to double BEFORE multiplying: BIGINT obs*total overflows (ANSI
    # raises) past ~3e9 total rows; the double products are the same single
    # IEEE ops in both engines and stay exact below 2^53
    chi = F.expr(
        "cast(floor("
        "((cast(obs as double) * total - cast(row_total as double) * col_total)"
        " * (cast(obs as double) * total - cast(row_total as double) * col_total))"
        " / (cast(total as double) * row_total * col_total)"
        " * 1000000 + 0.5) as bigint)"
    )
    return (
        cells.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .transform(with_scalar_frame(tot))
        .select("lang", "source", "obs", chi.alias("chi_e6"))
    )
