"""Frontier batch 14 (round 8, session 5): sketch-based join-size
estimation, bounded-round graph BFS, Zipf profiling, greedy set cover,
leave-one-out influence, and propensity-score matching —

- ``cms_join_size_estimate``: Count-Min-sketch join-size estimation
  (the optimizer-statistics primitive from Cormode & Muthukrishnan'05):
  |A ⋈ B| on a key = Σ_k a_k·b_k, estimated as min over 4 hash rows of
  the 256-bucket cell inner product — always an overestimate, computed
  here next to the exact answer with the error in ppm.  Sides: returned
  (R) vs kept line items joined on supplier.  The sketch build is one
  key-grain aggregate + a 4·256-cell table; the estimate never touches
  the pair space.
- ``bfs_seed_distances``: 3 unrolled BFS rounds from a seed set
  (vec_id % 97 = 0) over the hyperplane-LSH neighborhood graph (each
  node ↔ the 4 smallest vec_ids of its bucket — the bounded-degree
  star adjacency every graph query here rides; |E| ≤ 4·|V|).  Output is
  the distance histogram 0..3 plus the unreached count (-1) — the
  "coverage radius of a labeled seed set" curation diagnostic.
- ``zipf_octave_profile``: rank-frequency Zipf profile of the 5-shingle
  vocabulary on octave grain — tokens ranked by document frequency via
  the distributed ``global_row_number`` (no single-task sort), then
  grouped by ``length(bin(rank))`` (exact bit-length octaves — the
  log-log histogram without libm; Zipf ⇒ roughly constant sum_freq per
  octave).  DuckDB's and Spark's bin() agree on positive BIGINTs.
- ``set_cover_source_picks``: 3 unrolled greedy set-cover rounds — pick
  the source covering the most not-yet-covered shingles (Nemhauser's
  (1-1/e) greedy, the standard corpus-selection heuristic), report each
  round's pick, marginal gain, and cumulative coverage ppm.  Each round
  is one anti-join + one argmax; ties break on source name.
- ``loo_source_influence``: leave-one-source-out influence of each
  source on the global mean document length — mean_all − mean_without,
  computed algebraically from one per-source aggregate + global totals
  (S−s_i)/(N−n_i): the O(sources) re-aggregation a naive loop would do
  in O(sources·docs).  The cheapest data-valuation signal.
- ``psm_matched_pairs``: 1-NN propensity-score matching — treated users
  (more pre-period purchases than errors — a behavioral self-selection
  rule) matched to the nearest control by pre-period activity count via
  the sorted-merge device: two O(n) running last_value(IGNORE NULLS)
  fills (ascending and descending — NO shrinking frame), nearer
  neighbor wins, ties prefer the predecessor.  Emits the matched-pair
  table with both outcomes (post-period spend).

Scale notes: the CMS cell table is 4·256 rows regardless of data; BFS
adjacency is ≤ 4 edges per node and each round is one join; set-cover
rounds are one shuffle each on the shingle key; the PSM fill windows
run on the USER-grain frame (already aggregated); at cluster scale the
same fills range-partition by score exactly like global_row_number.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import (
    duck_hex2long,
    duck_shingles,
    spark_hex2long,
    spark_shingles,
)
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame
from zeta_etl_spark.queries.registry import T, query

# --- cms_join_size_estimate ---------------------------------------------------

_CMS_W = 256
_CMS_D = 4

_CMS_KEY_D = "concat('cms', CAST(d AS VARCHAR), ':', CAST(l_suppkey AS VARCHAR))"
_CMS_KEY_S = "concat('cms', cast(d as string), ':', cast(l_suppkey as string))"


def _cms_oracle() -> str:
    h = duck_hex2long(_CMS_KEY_D, digits=15)
    return f"""
WITH k AS (
  SELECT l_suppkey,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM lineitem GROUP BY 1
), exact AS (
  SELECT CAST(SUM(a * b) AS BIGINT) AS exact_pairs FROM k
), cells AS (
  SELECT d, {h} % {_CMS_W} AS bucket,
    CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(b) AS BIGINT) AS cb
  FROM k CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(d)
  GROUP BY 1, 2
), est AS (
  SELECT CAST(MIN(e) AS BIGINT) AS cms_estimate FROM (
    SELECT d, SUM(ca * cb) AS e FROM cells GROUP BY 1
  )
)
SELECT exact_pairs, cms_estimate,
  -- staged division: (d // e)*1M + (d % e)*1M // e == d*1M // e exactly
  -- for d >= 0, but the left form never materializes d*1M (est-exact can
  -- pass 9.2e12 around sf100, where the direct product overflows BIGINT)
  CAST((cms_estimate - exact_pairs) // NULLIF(exact_pairs, 0) * 1000000
    + (cms_estimate - exact_pairs) % NULLIF(exact_pairs, 0) * 1000000
      // NULLIF(exact_pairs, 0) AS BIGINT) AS overestimate_ppm
FROM exact CROSS JOIN est
"""


@query(
    "cms_join_size_estimate",
    oracle=_cms_oracle(),
    tags=("sketch", "statistics", "join"),
)
def cms_join_size_estimate(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    k = k.localCheckpoint()  # key grain feeds the exact answer + the sketch
    exact = k.agg(F.sum(F.col("a") * F.col("b")).cast("bigint").alias("exact_pairs"))
    cells = (
        k.withColumn("d", F.explode(F.expr("array(0, 1, 2, 3)")))
        .withColumn(
            "bucket",
            F.expr(spark_hex2long(_CMS_KEY_S)) % _CMS_W,
        )
        .groupBy("d", "bucket")
        .agg(
            F.sum("a").cast("bigint").alias("ca"),
            F.sum("b").cast("bigint").alias("cb"),
        )
    )
    est = (
        cells.groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("e"))
        .agg(F.min("e").cast("bigint").alias("cms_estimate"))
    )
    return (
        exact.transform(with_scalar_frame(est))
        .withColumn(
            "overestimate_ppm",
            F.expr(
                "cast((cms_estimate - exact_pairs)"
                " div nullif(exact_pairs, 0) * 1000000"
                " + (cms_estimate - exact_pairs) % nullif(exact_pairs, 0)"
                " * 1000000 div nullif(exact_pairs, 0) as bigint)"
            ),
        )
        .select("exact_pairs", "cms_estimate", "overestimate_ppm")
    )


# --- bfs_seed_distances -------------------------------------------------------

_BFS_PLANES = 4
_BFS_DIM = 64
_BFS_DEG = 4


def _bfs_planes():
    from zeta_etl_spark.operators.vectors import hyperplane_params

    return hyperplane_params(_BFS_PLANES, _BFS_DIM)


def _bfs_oracle() -> str:
    from zeta_etl_spark.operators.vectors import duck_hyperplane_bucket_sql

    bucket = duck_hyperplane_bucket_sql(_bfs_planes())
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sv
  FROM embeddings
), b AS MATERIALIZED (
  SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM e
), anchors AS MATERIALIZED (
  SELECT bucket, vec_id FROM (
    SELECT bucket, vec_id,
      ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
    FROM b
  ) WHERE rn <= {_BFS_DEG}
), edges AS MATERIALIZED (
  SELECT n.vec_id AS src, a.vec_id AS dst
  FROM b n JOIN anchors a ON a.bucket = n.bucket AND a.vec_id <> n.vec_id
  UNION
  SELECT a.vec_id AS src, n.vec_id AS dst
  FROM b n JOIN anchors a ON a.bucket = n.bucket AND a.vec_id <> n.vec_id
), d0 AS MATERIALIZED (
  SELECT vec_id FROM b WHERE vec_id % 97 = 0
), d1 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS vec_id FROM edges e
  JOIN d0 ON d0.vec_id = e.src
  WHERE e.dst NOT IN (SELECT vec_id FROM d0)
), d2 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS vec_id FROM edges e
  JOIN d1 ON d1.vec_id = e.src
  WHERE e.dst NOT IN (SELECT vec_id FROM d0)
    AND e.dst NOT IN (SELECT vec_id FROM d1)
), d3 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS vec_id FROM edges e
  JOIN d2 ON d2.vec_id = e.src
  WHERE e.dst NOT IN (SELECT vec_id FROM d0)
    AND e.dst NOT IN (SELECT vec_id FROM d1)
    AND e.dst NOT IN (SELECT vec_id FROM d2)
), labeled AS (
  SELECT CAST(0 AS BIGINT) AS dist, COUNT(*) AS n FROM d0
  UNION ALL SELECT 1, COUNT(*) FROM d1
  UNION ALL SELECT 2, COUNT(*) FROM d2
  UNION ALL SELECT 3, COUNT(*) FROM d3
  UNION ALL
  SELECT -1, (SELECT COUNT(*) FROM b)
    - (SELECT COUNT(*) FROM d0) - (SELECT COUNT(*) FROM d1)
    - (SELECT COUNT(*) FROM d2) - (SELECT COUNT(*) FROM d3)
)
SELECT CAST(dist AS BIGINT) AS dist, CAST(n AS BIGINT) AS n_vectors
FROM labeled WHERE n > 0
"""


@query(
    "bfs_seed_distances",
    oracle=_bfs_oracle(),
    tags=("graph", "vectors", "bfs"),
)
def bfs_seed_distances(spark, sf_dir):
    from pyspark.sql import Window

    from zeta_etl_spark.operators.vectors import lsh_bucket, scaled_vectors

    emb = scaled_vectors(T(spark, sf_dir, "embeddings")).select("vec_id", "sv")
    b = emb.select(
        "vec_id",
        lsh_bucket("sv", _bfs_planes()).cast("bigint").alias("bucket"),
    )
    b = b.localCheckpoint()  # node grain feeds anchors, edges, seed set, total
    w = Window.partitionBy("bucket").orderBy("vec_id")
    anchors = (
        b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _BFS_DEG)
        .select("bucket", F.col("vec_id").alias("anchor"))
    )
    half = (
        b.join(anchors, "bucket")
        .filter(F.col("vec_id") != F.col("anchor"))
        .select(F.col("vec_id").alias("src"), F.col("anchor").alias("dst"))
    )
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint()  # bounded (≤ 8·|V|) — reused per round
    d0 = b.filter(F.col("vec_id") % 97 == 0).select("vec_id")
    d0 = d0.localCheckpoint()

    def step(frontier, *seen):
        nxt = (
            edges.join(frontier, edges.src == frontier.vec_id, "left_semi")
            .select(F.col("dst").alias("vec_id"))
            .distinct()
        )
        for s in seen:
            nxt = nxt.join(s, "vec_id", "left_anti")
        return nxt.localCheckpoint()

    d1 = step(d0, d0)
    d2 = step(d1, d0, d1)
    d3 = step(d2, d0, d1, d2)

    def cnt(df, dist):
        return df.agg(
            F.lit(dist).cast("bigint").alias("dist"),
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        )

    reached = cnt(d0, 0).union(cnt(d1, 1)).union(cnt(d2, 2)).union(cnt(d3, 3))
    total = b.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    unreached = (
        reached.agg(F.sum("n_vectors").alias("n_reached"))
        .transform(with_scalar_frame(total))
        .select(
            F.lit(-1).cast("bigint").alias("dist"),
            (F.col("n_total") - F.col("n_reached"))
            .cast("bigint")
            .alias("n_vectors"),
        )
    )
    return reached.union(unreached).filter(F.col("n_vectors") > 0)


# --- zipf_octave_profile ------------------------------------------------------

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest({duck_shingles()}) AS token FROM documents
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1
), ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token) AS r FROM freq
)
SELECT CAST(length(bin(r)) AS BIGINT) AS octave,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(f) AS BIGINT) AS sum_freq,
  CAST(MAX(f) AS BIGINT) AS max_freq,
  CAST(MIN(f) AS BIGINT) AS min_freq
FROM ranked GROUP BY 1
"""


@query(
    "zipf_octave_profile",
    oracle=_ZIPF_ORACLE,
    tags=("text", "statistics", "vocabulary"),
)
def zipf_octave_profile(spark, sf_dir):
    from pyspark.sql import Window

    # Optimization r13 (guide §2.4/§1.1 first-principles): the octave of a
    # token depends only on its global rank, and ranks ordered by
    # (f DESC, token) assign each distinct-frequency GROUP a contiguous
    # rank range — the within-group token tie-break shuffles ranks only
    # inside the group, never across an f boundary.  So the per-token
    # global ranking (a |vocab|-sized range exchange + local sorts +
    # offset join) collapses to rank-interval algebra on the frequency
    # histogram: per f-group [s+1, s+c] overlapped with octave o's rank
    # interval [2^(o-1), 2^o - 1].  n_tokens/sum_freq are overlap sums;
    # max/min_freq fall out because f is monotone in rank.  The histogram
    # has |distinct f| = O(sqrt Σf) rows (≪ |vocab|), so the prefix-sum
    # window over it is a bounded single-partition pass, never data-sized.
    tok = T(spark, sf_dir, "documents").select(
        F.explode(F.expr(spark_shingles())).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    fgrp = freq.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    spans = fgrp.select(
        "f",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint").alias("s"),
    )
    per_octave = spans.select(
        "f",
        F.expr(
            "explode(sequence(cast(length(bin(s + 1)) as bigint), "
            "cast(length(bin(s + c)) as bigint)))"
        ).alias("octave"),
        "s",
        "c",
    ).select(
        "octave",
        "f",
        F.expr(
            "least(s + c, shiftleft(1L, cast(octave as int)) - 1)"
            " - greatest(s + 1, shiftleft(1L, cast(octave as int) - 1)) + 1"
        ).alias("n"),
    )
    return per_octave.groupBy("octave").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.col("f") * F.col("n")).cast("bigint").alias("sum_freq"),
        F.max("f").cast("bigint").alias("max_freq"),
        F.min("f").cast("bigint").alias("min_freq"),
    )


# --- set_cover_source_picks ---------------------------------------------------

_SC_ORACLE = f"""
WITH ss AS MATERIALIZED (
  SELECT DISTINCT source, unnest({duck_shingles()}) AS sh FROM documents
), u AS (
  SELECT CAST(COUNT(DISTINCT sh) AS BIGINT) AS universe FROM ss
), p1 AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS gain FROM ss
  GROUP BY 1 ORDER BY gain DESC, source LIMIT 1
), c1 AS MATERIALIZED (
  SELECT DISTINCT sh FROM ss JOIN p1 USING (source)
), p2 AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS gain FROM ss
  WHERE source <> (SELECT source FROM p1)
    AND sh NOT IN (SELECT sh FROM c1)
  GROUP BY 1 ORDER BY gain DESC, source LIMIT 1
), c2 AS MATERIALIZED (
  SELECT sh FROM c1
  UNION
  SELECT sh FROM ss JOIN p2 USING (source)
), p3 AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS gain FROM ss
  WHERE source NOT IN (SELECT source FROM p1 UNION ALL SELECT source FROM p2)
    AND sh NOT IN (SELECT sh FROM c2)
  GROUP BY 1 ORDER BY gain DESC, source LIMIT 1
), picks AS (
  SELECT 1 AS round, source, gain FROM p1
  UNION ALL SELECT 2, source, gain FROM p2
  UNION ALL SELECT 3, source, gain FROM p3
)
SELECT CAST(round AS BIGINT) AS round, source,
  CAST(gain AS BIGINT) AS new_covered,
  CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS cum_covered,
  CAST(SUM(gain) OVER (ORDER BY round) * 1000000 // u.universe AS BIGINT)
    AS coverage_ppm
FROM picks CROSS JOIN u
"""


@query(
    "set_cover_source_picks",
    oracle=_SC_ORACLE,
    tags=("curation", "text", "greedy"),
)
def set_cover_source_picks(spark, sf_dir):
    from pyspark.sql import Window

    # Optimization r13 (guide §2.3/§2.4): the greedy rounds only ever need,
    # per SHINGLE, the set of sources containing it — so contract the
    # exploded (source, shingle) postings to a (source-set → shingle count)
    # subset table in ONE pass (collect_set dedups inline; no distinct
    # pre-pass) and run all three rounds against that tiny checkpointed
    # frame.  "Covered by pick s" = array_contains(srcs, s); a picked
    # source can never reappear as a candidate because every subset
    # containing it is filtered with it.  The former shape re-joined the
    # full exploded postings per round (distinct + 2 anti-joins × 3 rounds,
    # 22 exchanges); this is 2 data-sized exchanges total.
    ss = T(spark, sf_dir, "documents").select(
        "source", F.explode(F.expr(spark_shingles())).alias("sh")
    )
    subsets = (
        ss.groupBy("sh")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .groupBy("srcs")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # ≤ |distinct source subsets| rows — tiny
    )
    universe = subsets.agg(F.sum("cnt").cast("bigint").alias("universe"))

    def argmax(counts):
        # top-1 by (gain desc, source asc) as a one-row aggregate — the
        # provably-bounded shape the scalar-frame lint rule reads off a plan
        return counts.agg(
            F.min(F.struct(-F.col("gain"), F.col("source"))).alias("s")
        ).select(
            F.col("s.source").alias("source"),
            (-F.col("s.col1")).cast("bigint").alias("gain"),
        )

    def gains(remaining):
        return (
            remaining.select(F.explode("srcs").alias("source"), "cnt")
            .groupBy("source")
            .agg(F.sum("cnt").cast("bigint").alias("gain"))
        )

    def uncovered_by(remaining, pick, tag):
        # subsets whose shingles the 1-row checkpointed pick does not cover
        # (bound=1: argmax is a global aggregate, checkpointing just hides
        # that from the plan-shape proof)
        return (
            remaining.transform(
                with_scalar_frame(
                    pick.select(F.col("source").alias(tag)), bound=1
                )
            )
            .filter(~F.array_contains("srcs", F.col(tag)))
            .select("srcs", "cnt")
        )

    # each pick is localCheckpointed so the round chain stays a flat plan
    # (uncheckpointed, round 3's tree re-plans and re-executes rounds 1-2
    # once per reference — measured as 3× the exchange count)
    p1 = argmax(gains(subsets)).localCheckpoint()
    rem2 = uncovered_by(subsets, p1, "_s1").localCheckpoint()
    p2 = argmax(gains(rem2)).localCheckpoint()
    rem3 = uncovered_by(rem2, p2, "_s2")
    p3 = argmax(gains(rem3))
    picks = (
        p1.select(F.lit(1).alias("round"), "source", "gain")
        .union(p2.select(F.lit(2).alias("round"), "source", "gain"))
        .union(p3.select(F.lit(3).alias("round"), "source", "gain"))
        # a round with NO remaining candidates (fewer than 3 sources, or
        # full coverage reached early): the global min(struct) aggregate
        # still emits one all-NULL row where the oracle's LIMIT-over-empty
        # emits none — drop it so both engines skip the exhausted round
        .filter(F.col("source").isNotNull())
    )
    w = Window.orderBy("round")  # 3-row frame
    return (
        picks.transform(with_scalar_frame(universe))
        .withColumn("cum_covered", F.sum("gain").over(w).cast("bigint"))
        .select(
            F.col("round").cast("bigint").alias("round"),
            "source",
            F.col("gain").alias("new_covered"),
            "cum_covered",
            F.expr(
                "cast(cum_covered * 1000000 div universe as bigint)"
            ).alias("coverage_ppm"),
        )
    )


# --- loo_source_influence -----------------------------------------------------

_LOO_ORACLE = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1
), g AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_all,
    CAST(SUM(sum_chars) AS BIGINT) AS s_all
  FROM s
)
SELECT source, n_docs,
  CAST(s_all * 1000000 // n_all AS BIGINT) AS mean_all_ppm,
  CAST((s_all - sum_chars) * 1000000
    // NULLIF(n_all - n_docs, 0) AS BIGINT) AS mean_without_ppm,
  CAST(s_all * 1000000 // n_all
    - (s_all - sum_chars) * 1000000 // NULLIF(n_all - n_docs, 0)
    AS BIGINT) AS influence_ppm
FROM s CROSS JOIN g
"""


@query(
    "loo_source_influence",
    oracle=_LOO_ORACLE,
    tags=("curation", "statistics", "valuation"),
)
def loo_source_influence(spark, sf_dir):
    s = (
        T(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )
    s = s.localCheckpoint()  # source grain feeds the global totals + rows
    g = s.agg(
        F.sum("n_docs").cast("bigint").alias("n_all"),
        F.sum("sum_chars").cast("bigint").alias("s_all"),
    )
    return (
        s.transform(with_scalar_frame(g))
        .withColumn(
            "mean_all_ppm", F.expr("cast(s_all * 1000000 div n_all as bigint)")
        )
        .withColumn(
            "mean_without_ppm",
            F.expr(
                "cast((s_all - sum_chars) * 1000000"
                " div nullif(n_all - n_docs, 0) as bigint)"
            ),
        )
        .select(
            "source",
            "n_docs",
            "mean_all_ppm",
            "mean_without_ppm",
            (F.col("mean_all_ppm") - F.col("mean_without_ppm"))
            .cast("bigint")
            .alias("influence_ppm"),
        )
    )


# --- psm_matched_pairs --------------------------------------------------------

_PSM_DAY_DUCK = (
    "CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', "
    "date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400 AS BIGINT)"
)
_PSM_DAY_SPARK = "cast(unix_timestamp(date_trunc('day', ts)) div 86400 as bigint)"

_PSM_ORACLE = f"""
WITH d0 AS (
  SELECT MIN({_PSM_DAY_DUCK}) AS d0 FROM events
), u AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN {_PSM_DAY_DUCK} < d0.d0 + 15 THEN 1 ELSE 0 END)
      AS BIGINT) AS score,
    CAST(SUM(CASE WHEN {_PSM_DAY_DUCK} < d0.d0 + 15
      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pre_buy,
    CAST(SUM(CASE WHEN {_PSM_DAY_DUCK} < d0.d0 + 15
      AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS pre_err,
    CAST(SUM(CASE WHEN {_PSM_DAY_DUCK} >= d0.d0 + 15
      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS outcome_cents
  FROM events CROSS JOIN d0 GROUP BY 1, d0.d0
), t AS (
  SELECT user_id, score, outcome_cents,
    (pre_buy > pre_err) AS treated
  FROM u
), filled AS (
  SELECT *,
    last_value(CASE WHEN NOT treated THEN
        struct_pack(cu := user_id, cs := score, co := outcome_cents)
      END IGNORE NULLS) OVER (ORDER BY score, user_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_c,
    last_value(CASE WHEN NOT treated THEN
        struct_pack(cu := user_id, cs := score, co := outcome_cents)
      END IGNORE NULLS) OVER (ORDER BY score DESC, user_id DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_c
  FROM t
), matched AS (
  SELECT user_id AS treated_user, score AS t_score,
    outcome_cents AS t_outcome_cents,
    CASE
      WHEN prev_c IS NULL THEN next_c
      WHEN next_c IS NULL THEN prev_c
      WHEN (score - prev_c.cs) <= (next_c.cs - score) THEN prev_c
      ELSE next_c
    END AS m
  FROM filled WHERE treated
)
SELECT treated_user, t_score, t_outcome_cents,
  m.cu AS control_user, m.cs AS c_score, m.co AS c_outcome_cents,
  CAST(abs(t_score - m.cs) AS BIGINT) AS score_dist
FROM matched WHERE m IS NOT NULL
"""


@query(
    "psm_matched_pairs",
    oracle=_PSM_ORACLE,
    tags=("experiment", "causal", "matching"),
)
def psm_matched_pairs(spark, sf_dir):
    from zeta_etl_spark.operators.windows import global_last_before

    e = T(spark, sf_dir, "events")
    d0 = e.agg(F.expr(f"min({_PSM_DAY_SPARK})").alias("d0"))
    u = (
        e.transform(with_scalar_frame(d0))
        .withColumn("day", F.expr(_PSM_DAY_SPARK))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("d0") + 15, 1).otherwise(0))
            .cast("bigint")
            .alias("score"),
            F.sum(
                F.when(
                    (F.col("day") < F.col("d0") + 15)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("pre_buy"),
            F.sum(
                F.when(
                    (F.col("day") < F.col("d0") + 15)
                    & (F.col("event_type") == "error"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("pre_err"),
            F.sum(
                F.when(
                    F.col("day") >= F.col("d0") + 15,
                    F.expr("cast(floor(value * 100 + 0.5) as bigint)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("outcome_cents"),
        )
        .withColumn("treated", F.col("pre_buy") > F.col("pre_err"))
    )
    cs = F.when(
        ~F.col("treated"),
        F.struct(
            F.col("user_id").alias("cu"),
            F.col("score").alias("cs"),
            F.col("outcome_cents").alias("co"),
        ),
    )
    # both fills ride the range-partitioned global_last_before device
    # (the module docstring's promise): no Exchange SinglePartition over
    # the user grain — each direction is one balanced range shuffle +
    # local windows + a broadcast carry join.
    filled = global_last_before(
        u, ["score", "user_id"], cs, "prev_c"
    )
    filled = global_last_before(
        filled,
        [F.col("score").desc(), F.col("user_id").desc()],
        cs,
        "next_c",
    )
    m = F.when(F.col("prev_c").isNull(), F.col("next_c")).otherwise(
        F.when(F.col("next_c").isNull(), F.col("prev_c")).otherwise(
            F.when(
                (F.col("score") - F.col("prev_c.cs"))
                <= (F.col("next_c.cs") - F.col("score")),
                F.col("prev_c"),
            ).otherwise(F.col("next_c"))
        )
    )
    return (
        filled.filter("treated")
        .withColumn("m", m)
        .filter(F.col("m").isNotNull())
        .select(
            F.col("user_id").alias("treated_user"),
            F.col("score").alias("t_score"),
            F.col("outcome_cents").alias("t_outcome_cents"),
            F.col("m.cu").alias("control_user"),
            F.col("m.cs").alias("c_score"),
            F.col("m.co").alias("c_outcome_cents"),
            F.abs(F.col("t_score") - F.col("m.cs"))
            .cast("bigint")
            .alias("score_dist"),
        )
    )
