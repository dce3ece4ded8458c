"""Frontier batch 3 (round 8): four more operator families —

- ``lm_likelihood_score``: corpus-bigram-LM quality scoring per document
  (the CCNet/Gopher "LM likelihood" curation signal, integerized as mean
  conditional probability in ppm — no transcendental log).
- ``markov_removal_attribution``: Markov-chain removal-effect channel
  attribution (Anderl et al. 2016): conversion reach within K steps of
  the observed first-order transition chain, re-computed with each
  channel removed; removal effect = relative reach drop.
- ``autocorr_best_lag``: periodicity detection — argmax over lags 1..10
  of the daily-series autocorrelation, computed scale-invariantly on
  permille deviations so BIGINT cross-products survive any data scale.
- ``entity_linkage_parts``: blocked fuzzy entity linkage over part
  names: block on the head noun (last token), verify with
  ``levenshtein <= 3``, score pairs — the classic record-linkage
  block+verify shape, work bounded by block sizes, never |names|^2.

Determinism: SURVEY §5 rules (BIGINT, floor div, min/max-of-struct
argmax, levenshtein is exact integer on both engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query

# --- lm_likelihood_score -----------------------------------------------------
# Train: bigram counts c(w1,w2) and unigram prefix counts c(w1) over the
# whole corpus (two map-side-combinable groupBys; the LM table is
# vocabulary-bounded, not corpus-bounded).  Score: every document bigram
# looks up P(w2|w1)_ppm = c(w1,w2)*1e6 // c(w1); the doc score is the
# mean conditional probability (sum div count) — the integer stand-in
# for LM log-likelihood (monotone in the geometric-mean sense for
# ranking).  One shuffle on the bigram key to score.

_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, unnest(range(1, len(ts))) AS u(i)
), lm2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2
), lm1 AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM lm2 GROUP BY 1
), scored AS (
  SELECT b.doc_id, (l2.c2 * 1000000) // l1.c1 AS p_ppm
  FROM bg b
  JOIN lm2 l2 ON l2.w1 = b.w1 AND l2.w2 = b.w2
  JOIN lm1 l1 ON l1.w1 = b.w1
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(p_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_cond_ppm
FROM scored GROUP BY doc_id
"""


@query(
    "lm_likelihood_score",
    oracle=_LM_ORACLE,
    tags=("curation", "language-model", "scoring"),
)
def lm_likelihood_score(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(ts[i - 1] as w1, ts[i] as w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    lm2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    lm1 = lm2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    # the LM is vocabulary-sized — broadcast both sides of the lookup
    scored = (
        bg.join(F.broadcast(lm2), ["w1", "w2"])
        .join(F.broadcast(lm1), "w1")
        .select("doc_id", F.expr("(c2 * 1000000) div c1").alias("p_ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.expr(
            "cast(sum(p_ppm) as bigint) div cast(count(*) as bigint)"
        ).alias("avg_cond_ppm"),
    )


# --- markov_removal_attribution ----------------------------------------------
# First-order Markov attribution: user journeys order event types by
# (ts, event_id); transition probabilities p_ppm from observed
# consecutive pairs (plus START -> first event).  Conversion reach =
# probability of hitting 'purchase' within K=6 steps from START,
# computed by K relational matrix-vector rounds on the ppm-scaled chain
# (SUM of BIGINT products, ONE floor div per entry per round — exact on
# both engines).  Removal effect of channel c: recompute reach with c's
# rows/cols deleted (standard removal-effect attribution); output
# removal_ppm = (reach_full - reach_without) * 1e6 // reach_full.
# Data-sized work is ONE sessionize pass; the chain itself is
# |event_types|^2 — driver-side rounds on a broadcast-sized frame.

_MARKOV_K = 6
_CONV = "purchase"


# The oracle enumerates the channels LITERALLY (the four non-converting
# event types of the corpus), one unrolled K-round chain per scenario —
# per-channel recursion cannot be parameterized in portable SQL.


def _markov_oracle_literal(channels: list[str]) -> str:
    # r10 rescue (sf10 genuinely filled a 76 GB /tmp with spill — not the
    # dead-spill-dir incident r9 assumed): ``trans`` is a ~25-row frame
    # computed from TWO windowed scans over all events, and the unrolled
    # rounds reference it 30× — DuckDB 1.0 re-evaluates a non-MATERIALIZED
    # CTE per reference (r9 playbook #1), and the old reach SCALAR
    # subqueries re-evaluate their CTE chain even under MATERIALIZED
    # (playbook #2).  Fixes: trans and every round frame AS MATERIALIZED
    # (all broadcast-sized), reach as an aggregate over a UNION ALL of the
    # round frames (no scalar subqueries), final assembly by joining a
    # VALUES tag list against one materialized reach table.  Integer
    # semantics unchanged — SUM(empty) IS NULL → COALESCE 0 matches the
    # old per-round COALESCE chain exactly.
    base = f"""
WITH seq AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (PARTITION BY user_id
      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
  FROM events
), firsts AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
      ROW_NUMBER() OVER (PARTITION BY user_id
        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
    FROM events
  ) WHERE rn = 1
), pairs AS (
  SELECT event_type AS src, nxt AS dst FROM seq WHERE nxt IS NOT NULL
  UNION ALL
  SELECT '__START__' AS src, event_type AS dst FROM firsts
), trans AS MATERIALIZED (
  SELECT src, dst,
    (CAST(COUNT(*) AS BIGINT) * 1000000)
      // CAST(SUM(COUNT(*)) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
  FROM pairs GROUP BY src, dst
)"""
    ctes = []
    scenarios = [("full", None)] + [
        (f"c{i}", ch) for i, ch in enumerate(channels)
    ]
    for tag, removed in scenarios:
        guard = (
            f"AND t.src <> '{removed}' AND t.dst <> '{removed}'"
            if removed is not None
            else ""
        )
        ctes.append(
            f"""r0{tag}(node, mass) AS MATERIALIZED (
  SELECT '__START__', CAST(1000000 AS BIGINT)
)"""
        )
        for i in range(_MARKOV_K):
            ctes.append(
                f"""r{i + 1}{tag} AS MATERIALIZED (
  SELECT t.dst AS node,
    CAST(SUM(r.mass * t.p_ppm) AS BIGINT) // 1000000 AS mass
  FROM r{i}{tag} r
  JOIN trans t ON t.src = r.node AND r.node <> '{_CONV}' {guard}
  GROUP BY t.dst
)"""
            )
        conv_rounds = " UNION ALL ".join(
            f"SELECT mass FROM r{i + 1}{tag} WHERE node = '{_CONV}'"
            for i in range(_MARKOV_K)
        )
        ctes.append(
            f"""reach_{tag} AS MATERIALIZED (
  SELECT COALESCE(CAST(SUM(mass) AS BIGINT), 0) AS reach
  FROM ({conv_rounds})
)"""
        )
    reach_union = " UNION ALL ".join(
        f"SELECT '{tag}' AS tag, reach FROM reach_{tag}"
        for tag, _ in scenarios
    )
    ctes.append(f"allreach AS MATERIALIZED ({reach_union})")
    tag_values = ", ".join(
        f"('{ch}', 'c{i}')" for i, ch in enumerate(channels)
    )
    return f"""{base},
{", ".join(ctes)}
SELECT ch.channel, f.reach AS reach_full, w.reach AS reach_without,
  ((f.reach - w.reach) * 1000000) // f.reach AS removal_ppm
FROM (VALUES {tag_values}) ch(channel, tag)
JOIN allreach f ON f.tag = 'full'
JOIN allreach w ON w.tag = ch.tag
WHERE f.reach > 0
"""


_MARKOV_CHANNELS = ["click", "error", "signup", "view"]


@query(
    "markov_removal_attribution",
    oracle=_markov_oracle_literal(_MARKOV_CHANNELS),
    tags=("attribution", "markov", "iterative"),
)
def markov_removal_attribution(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").cast("timestamp"), "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    pairs = seq.where(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    )
    starts = seq.where(F.col("rn") == 1).select(
        F.lit("__START__").alias("src"), F.col("event_type").alias("dst")
    )
    counts = pairs.unionByName(starts).groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    trans = counts.select(
        "src",
        "dst",
        F.expr(
            "(c * 1000000) div cast(sum(c) over "
            "(partition by src) as bigint)"
        ).alias("p_ppm"),
    )
    # ONE data-sized job: sessionize + pair-count + ppm; the chain frame
    # is |event_types + 1|^2 rows — collect it and run the 5 scenarios x
    # K removal rounds in driver Python with the SAME integer semantics
    # as the oracle's unrolled CTEs (sum of mass*p_ppm products per dst,
    # then ONE floor div per entry per round).  The previous form ran 30
    # localCheckpoint'ed micro-jobs + a .first() per round against this
    # tens-of-rows frame — 6.7 s of pure job overhead at sf0.1.
    edges = [
        (r["src"], r["dst"], int(r["p_ppm"])) for r in trans.collect()
    ]

    def reach(removed: str | None) -> int:
        mass = {"__START__": 1_000_000}
        total = 0
        for _ in range(_MARKOV_K):
            nxt: dict[str, int] = {}
            for src, dst, p_ppm in edges:
                if removed is not None and (
                    src == removed or dst == removed
                ):
                    continue
                m = mass.get(src)
                if m is None or src == _CONV:
                    continue
                nxt[dst] = nxt.get(dst, 0) + m * p_ppm
            mass = {d: v // 1_000_000 for d, v in nxt.items()}
            total += mass.get(_CONV, 0)
        return total

    full = reach(None)
    out_rows = []
    for ch in _MARKOV_CHANNELS:
        without = reach(ch)
        if full > 0:
            out_rows.append(
                (ch, full, without, (full - without) * 1_000_000 // full)
            )
    return spark.createDataFrame(
        out_rows,
        "channel string, reach_full bigint, reach_without bigint, "
        "removal_ppm bigint",
    )


# --- autocorr_best_lag -------------------------------------------------------
# Periodicity detection: the lag in 1..10 maximizing the daily-series
# Pearson autocorrelation, per event type.  Scale-invariant integer
# math: deviations are PERCENT of the series mean, WINSORIZED to ±300
# (dev = clamp((y - mean) * 100 div mean, -300, 300)) — scale
# invariance keeps cross-products constant-bounded at any data volume,
# and the clamp bounds them even under per-day skew (an unclamped 10x
# outlier day overflowed sign*num^2*1e6 at sf0.001).  With |dev| <= 300
# and any series length n: |sxy| <= 9e4*n, so sxy^2*1e6 fits BIGINT up
# to n ~ 3e4 days (≈80 years of dailies).  r is compared via its
# sign-aware square sign(num)*num^2*1e6 // (den_x*den_y) — argmax by
# min-of-struct (ties -> smaller lag).  The lag join is a day = day+lag
# equi-join on the bounded day-grain pre-agg.

_ACF_MAX_LAG = 10

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
    CAST(SUM(cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean
  FROM daily GROUP BY 1
), dev AS (
  SELECT d.event_type, d.day,
    GREATEST(LEAST(((d.cents - m.mean) * 100) // m.mean, 300), -300) AS dv
  FROM daily d JOIN m ON m.event_type = d.event_type
  WHERE m.mean > 0
), lagged AS (
  SELECT a.event_type, l.lag,
    CAST(SUM(a.dv * b.dv) AS BIGINT) AS sxy,
    CAST(SUM(a.dv * a.dv) AS BIGINT) AS sxx,
    CAST(SUM(b.dv * b.dv) AS BIGINT) AS syy,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM dev a
  JOIN (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag) l ON true
  JOIN dev b ON b.event_type = a.event_type
            AND b.day = a.day + CAST(l.lag AS INTEGER)
  GROUP BY 1, 2
), scored AS (
  SELECT event_type, lag, n,
    CASE WHEN sxx = 0 OR syy = 0 THEN 0
      ELSE (CASE WHEN sxy < 0 THEN -1 ELSE 1 END)
        * ((sxy * sxy * 1000000) // (sxx * syy))
    END AS r2_signed_ppm
  FROM lagged WHERE n >= 5
)
SELECT event_type,
  MIN(struct_pack(nr := -r2_signed_ppm, l := lag))['l'] AS best_lag,
  MAX(r2_signed_ppm) AS best_r2_signed_ppm
FROM scored GROUP BY event_type
"""


@query(
    "autocorr_best_lag",
    oracle=_ACF_ORACLE,
    tags=("timeseries", "autocorrelation", "statistics"),
)
def autocorr_best_lag(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    m = daily.groupBy("event_type").agg(
        F.expr(
            "cast(sum(cents) as bigint) div cast(count(*) as bigint)"
        ).alias("mean")
    )
    dev = (
        daily.join(m, "event_type")
        .where(F.col("mean") > 0)
        .select(
            "event_type",
            "day",
            F.expr(
                "greatest(least(((cents - mean) * 100) div mean, 300), "
                "-300)"
            ).alias("dv"),
        )
    )
    a = dev.select(
        "event_type",
        "day",
        "dv",
        F.explode(
            F.array(*[F.lit(i) for i in range(1, _ACF_MAX_LAG + 1)])
        ).alias("lag"),
    ).select(
        "event_type",
        "lag",
        F.expr("date_add(day, lag)").alias("jday"),
        F.col("dv").alias("dva"),
    )
    b = dev.select(
        "event_type", F.col("day").alias("jday"), F.col("dv").alias("dvb")
    )
    lagged = (
        a.join(b, ["event_type", "jday"])
        .groupBy("event_type", "lag")
        .agg(
            F.sum(F.col("dva") * F.col("dvb")).cast("bigint").alias("sxy"),
            F.sum(F.col("dva") * F.col("dva")).cast("bigint").alias("sxx"),
            F.sum(F.col("dvb") * F.col("dvb")).cast("bigint").alias("syy"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .where(F.col("n") >= 5)
    )
    scored = lagged.select(
        "event_type",
        "lag",
        F.when((F.col("sxx") == 0) | (F.col("syy") == 0), F.lit(0))
        .otherwise(
            F.when(F.col("sxy") < 0, -1).otherwise(1)
            * F.expr("(sxy * sxy * 1000000) div (sxx * syy)")
        )
        .cast("bigint")
        .alias("r2_signed_ppm"),
    )
    return scored.groupBy("event_type").agg(
        F.min(F.struct((-F.col("r2_signed_ppm")).alias("nr"), "lag"))[
            "lag"
        ].alias("best_lag"),
        F.max("r2_signed_ppm").alias("best_r2_signed_ppm"),
    )


# --- entity_linkage_parts ----------------------------------------------------
# Record linkage, block + verify: part names block on their HEAD NOUN
# (last whitespace token), candidate pairs verify with levenshtein <= 3
# (exact integer on both engines), and each linked name pair reports its
# entity-pair cardinality (cnt_a * cnt_b part rows).  Work is
# sum(|block|^2) over distinct names — never |parts|^2; at 100 TB the
# distinct-name relation is the (bounded) vocabulary, not the fact.

_LINK_MAX_LEV = 3

_LINK_ORACLE = f"""
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt,
    list_extract(string_split(p_name, ' '), -1) AS noun
  FROM part GROUP BY 1
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
  a.cnt * b.cnt AS n_entity_pairs
FROM names a
JOIN names b ON b.noun = a.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_LINK_MAX_LEV}
"""


@query(
    "entity_linkage_parts",
    oracle=_LINK_ORACLE,
    tags=("linkage", "dedup", "join"),
)
def entity_linkage_parts(spark, sf_dir):
    pt = T(spark, sf_dir, "part")
    names = pt.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            <= _LINK_MAX_LEV
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("bigint")
            .alias("lev"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("n_entity_pairs"),
        )
    )
