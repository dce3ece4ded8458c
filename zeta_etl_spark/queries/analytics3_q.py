"""Round-6 analytics batch 3: the mergeable QUANTILE sketch missing from the
sketch family (HLL/CMS/KMV/Bloom are covered), windowed token co-occurrence
(the PMI / embedding-prep precursor), and a deterministic fixed-k
per-group reservoir sample.

All three are integer-exact cross-engine: the sketch buckets come from
binary string length (no libm log), co-occurrence is pure counting, and
the reservoir rank orders by md5 hex (identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.queries.registry import T, query

# --- ddsketch_quantiles: mergeable log-bucket quantile sketch ----------------
# DDSketch (Masson et al., VLDB'19 — public method) with base-2 buckets:
# bucket(x) = floor(log2(x)) + 1, computed EXACTLY as length(bin(cents))
# (both engines print minimal binary), so the sketch never touches libm.
# The per-(event_type, bucket) count table IS the sketch — mergeable by
# SUM, bounded at ~64 rows per group for any data volume, which is the
# 100 TB aggregation shape: partial-aggregated map-side, one tiny shuffle.
# The quantile estimate (smallest bucket whose running count reaches
# ceil(q·n/100)) is relative-error bounded by the base (2× here; a finer
# base is the same construction with a scaled mantissa).  Integer targets
# use ceil division (q·n + 99) div 100 — no float rank math.

_DDS_ORACLE = """
WITH cents AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
), hist AS (
  SELECT event_type, CAST(length(bin(c)) AS BIGINT) AS bucket, COUNT(*) AS cnt
  FROM cents GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
  FROM hist
), tot AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1
), targets AS (
  SELECT event_type, n, q, (q * n + 99) // 100 AS target
  FROM tot, (SELECT UNNEST([50, 90, 99]) AS q) qs
)
SELECT t.event_type, CAST(t.q AS BIGINT) AS q, t.n,
  CAST(MIN(c.bucket) AS BIGINT) AS bucket,
  CAST(CAST(1 AS BIGINT) << (CAST(MIN(c.bucket) AS INTEGER) - 1)
    AS BIGINT) AS lo_cents,
  CAST((CAST(1 AS BIGINT) << CAST(MIN(c.bucket) AS INTEGER)) - 1
    AS BIGINT) AS hi_cents
FROM targets t
JOIN cum c ON c.event_type = t.event_type AND c.cum >= t.target
GROUP BY t.event_type, t.q, t.n
"""


@query("ddsketch_quantiles", oracle=_DDS_ORACLE, tags=("sketch", "quantile"))
def ddsketch_quantiles(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    # value ∈ (0, ~500] in cents ≥ 1, so bin() never sees 0 or negatives;
    # the operator contract (positive values) matches DDSketch's domain.
    hist = (
        e.select(
            "event_type",
            F.expr(
                "cast(length(bin(cast(floor(value * 100 + 0.5) as bigint)))"
                " as bigint)"
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("event_type").agg(F.sum("cnt").cast("bigint").alias("n"))
    targets = tot.select(
        "event_type",
        "n",
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q"),
    ).withColumn("target", F.expr("(q * n + 99) div 100"))
    # the sketch is tiny (groups × ≤64 buckets) → broadcast the cum side
    hit = targets.join(F.broadcast(cum), "event_type").filter(
        F.col("cum") >= F.col("target")
    )
    return hit.groupBy(
        "event_type", F.col("q").cast("bigint").alias("q"), "n"
    ).agg(
        F.min("bucket").cast("bigint").alias("bucket"),
        F.expr("cast(shiftleft(cast(1 as bigint), cast(min(bucket) as int) - 1) as bigint)").alias(
            "lo_cents"
        ),
        F.expr(
            "cast(shiftleft(cast(1 as bigint), cast(min(bucket) as int)) - 1 as bigint)"
        ).alias("hi_cents"),
    )


# --- token_cooccurrence: windowed co-occurrence counts -----------------------
# Count unordered token pairs appearing within ±2 positions across the
# corpus — the raw statistic behind PMI matrices and count-based
# embeddings.  The pair grid is generated ARRAY-SIDE with nested
# transform/sequence HOFs (fan-out ≤ window per token, one explode), not a
# positional self-join: at 100 TB a posexplode self-join on (doc_id, pos)
# would shuffle the exploded token table twice; the HOF form shuffles only
# the final fixed-vocabulary pair counts (map-side combined).

_COOC_W = 2

_COOC_ORACLE = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), pairs AS (
  SELECT unnest(flatten(list_transform(range(0, greatest(len(t) - 1, 0)), i ->
      list_transform(range(i + 1, least(i + {_COOC_W + 1}, len(t))), j ->
        {{'w1': least(t[i + 1], t[j + 1]), 'w2': greatest(t[i + 1], t[j + 1])}})))) AS p
  FROM toks
)
SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS n_cooc
FROM pairs GROUP BY 1, 2
"""


@query("token_cooccurrence", oracle=_COOC_ORACLE, tags=("text", "cooccurrence"))
def token_cooccurrence(spark, sf_dir):
    # Tokenize ONCE into a named column before the nested lambdas: inside a
    # HOF lambda body Catalyst does not CSE a repeated split(text) — each
    # t[i]/t[j] access would re-split the document, turning the O(n·w) pair
    # grid into O(n²·w) splits per doc (measured 10.1 s → 0.9 s at sf0.1).
    # Single-file parquet reads as 1 partition — spread the CPU-heavy HOF
    # chain across cores first (load-bearing decision #6).
    d = (
        T(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
    )
    pairs = d.select(
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(0, size(t) - 2), i ->
                  transform(
                    sequence(i + 1, least(i + {_COOC_W}, size(t) - 1)),
                    j -> struct(
                      least(t[i], t[j]) AS w1,
                      greatest(t[i], t[j]) AS w2))))
                """
            )
        ).alias("p")
    )
    return (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
    )


# --- reservoir_sample_per_source: deterministic fixed-k per group ------------
# "Reservoir sampling" as a deterministic engine primitive: the k docs per
# source with the smallest md5(doc_id) — uniform over each group (md5 is
# order-free), stable across runs/partitionings/engines, and exactly-k.
# Complements stratified_sample_docs (per-stratum RATE sampling) with the
# fixed-BUDGET form.  Scale shape: Spark 4 plans rank ≤ k as
# WindowGroupLimit — a per-partition top-k heap before the single
# per-group shuffle, never a full sort of the corpus.

_RES_K = 10

_RES_ORACLE = f"""
SELECT doc_id, source, CAST(rn AS BIGINT) AS sample_rank
FROM (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) t
WHERE rn <= {_RES_K}
"""


@query(
    "reservoir_sample_per_source",
    oracle=_RES_ORACLE,
    tags=("sampling", "curation"),
)
def reservoir_sample_per_source(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("bigint").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= _RES_K)
    )
