"""Data-quality audit batch (the Deequ/expectations-style checks a
production lakehouse runs on every load): per-column profiling, foreign-key
orphan audits across the star schema, and primary-key uniqueness.

The engine's pipeline runner already enforces per-node expectations
(plans/graph.py); these queries are the WAREHOUSE-WIDE audit reports that
feed such expectations.  Cross-engine notes: numeric min/max surface as
scaled BIGINTs (double→string formatting differs between engines; integer
cents/epochs are hash-stable), string min/max as plain strings.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

# --- events_profile: column profiling in two passes --------------------------
# n_rows / n_nulls / n_distinct plus typed min-max per column of the fact
# table, unpivoted to the long report.  The distinct counts and the plain
# stats are SEPARATE aggregations cross-joined as scalars: Spark plans
# multi-column count(DISTINCT) via an Expand×columns rewrite, and any
# plain aggregate mixed into that agg is evaluated over the expanded
# rows — measured 6× slower at sf10 (18.7 s mixed vs ~3 s distinct-only
# + ~1 s plain).  Two scans of the fact table beat one 5×-inflated pass.

_PROFILE_ORACLE = """
WITH m AS (
  SELECT
    COUNT(*) AS n_rows,
    COUNT(*) - COUNT(event_id)   AS null_event_id,
    COUNT(*) - COUNT(user_id)    AS null_user_id,
    COUNT(*) - COUNT(event_type) AS null_event_type,
    COUNT(*) - COUNT(value)      AS null_value,
    COUNT(*) - COUNT(props)      AS null_props,
    COUNT(DISTINCT event_id)   AS d_event_id,
    COUNT(DISTINCT user_id)    AS d_user_id,
    COUNT(DISTINCT event_type) AS d_event_type,
    COUNT(DISTINCT value)      AS d_value,
    COUNT(DISTINCT props)      AS d_props,
    MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id,
    MIN(user_id)  AS min_user_id,  MAX(user_id)  AS max_user_id,
    CAST(floor(MIN(value) * 100 + 0.5) AS BIGINT) AS min_value_cents,
    CAST(floor(MAX(value) * 100 + 0.5) AS BIGINT) AS max_value_cents,
    MIN(event_type) AS min_event_type, MAX(event_type) AS max_event_type,
    MIN(props) AS min_props, MAX(props) AS max_props
  FROM events
)
SELECT col, CAST(t.n_rows AS BIGINT) AS n_rows,
  CAST(t.n_nulls AS BIGINT) AS n_nulls,
  CAST(t.n_distinct AS BIGINT) AS n_distinct,
  CAST(t.min_num AS BIGINT) AS min_num, CAST(t.max_num AS BIGINT) AS max_num,
  t.min_str, t.max_str
FROM m, LATERAL (VALUES
  ('event_id',   n_rows, null_event_id,   d_event_id,
     min_event_id, max_event_id, NULL, NULL),
  ('user_id',    n_rows, null_user_id,    d_user_id,
     min_user_id, max_user_id, NULL, NULL),
  ('event_type', n_rows, null_event_type, d_event_type,
     NULL, NULL, min_event_type, max_event_type),
  ('value',      n_rows, null_value,      d_value,
     min_value_cents, max_value_cents, NULL, NULL),
  ('props',      n_rows, null_props,      d_props,
     NULL, NULL, min_props, max_props)
) AS t(col, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)
"""


@query("events_profile", oracle=_PROFILE_ORACLE, tags=("audit", "profiling"))
def events_profile(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    distincts = e.agg(
        *[
            F.countDistinct(c).alias(f"d_{c}")
            for c in ("event_id", "user_id", "event_type", "value", "props")
        ]
    )
    plain = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}")
            for c in ("event_id", "user_id", "event_type", "value", "props")
        ],
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.min("user_id").alias("min_user_id"),
        F.max("user_id").alias("max_user_id"),
        F.expr("cast(floor(min(value) * 100 + 0.5) as bigint)").alias(
            "min_value_cents"
        ),
        F.expr("cast(floor(max(value) * 100 + 0.5) as bigint)").alias(
            "max_value_cents"
        ),
        F.min("event_type").alias("min_event_type"),
        F.max("event_type").alias("max_event_type"),
        F.min("props").alias("min_props"),
        F.max("props").alias("max_props"),
    )
    m = plain.crossJoin(distincts)  # two scalar rows → 1×1 cross join
    rows = m.selectExpr(
        """stack(5,
          'event_id',   n_rows, null_event_id,   d_event_id,
             min_event_id, max_event_id,
             cast(NULL as string), cast(NULL as string),
          'user_id',    n_rows, null_user_id,    d_user_id,
             min_user_id, max_user_id,
             cast(NULL as string), cast(NULL as string),
          'event_type', n_rows, null_event_type, d_event_type,
             cast(NULL as bigint), cast(NULL as bigint),
             min_event_type, max_event_type,
          'value',      n_rows, null_value,      d_value,
             min_value_cents, max_value_cents,
             cast(NULL as string), cast(NULL as string),
          'props',      n_rows, null_props,      d_props,
             cast(NULL as bigint), cast(NULL as bigint),
             min_props, max_props
        ) AS (col, n_rows, n_nulls, n_distinct,
              min_num, max_num, min_str, max_str)"""
    )
    return rows.select(
        "col",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.col("min_num").cast("bigint").alias("min_num"),
        F.col("max_num").cast("bigint").alias("max_num"),
        "min_str",
        "max_str",
    )


# --- fk_integrity_audit: star-schema orphan census ---------------------------
# One row per foreign-key edge with child cardinality and orphan count
# (child keys with no parent) — computed in ONE pass per edge: a left
# outer join whose unmatched rows carry a NULL parent key, aggregated as
# count(*) + count(parent IS NULL).  (An anti join plus a separate total
# count would scan each child twice — review finding.)  Bounded dims
# broadcast; the fact-fact edges shuffle on their key.  The report is
# the warehouse-ingest gate: a nonzero orphan count fails the load.

_FK_EDGES = [
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey",
     "region", "r_regionkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS fk_edge,
  (SELECT COUNT(*) FROM {child}) AS n_child_rows,
  (SELECT COUNT(*) FROM {child} c
     WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                       WHERE p.{pkey} = c.{ckey})) AS n_orphans"""
    for edge, child, ckey, parent, pkey in _FK_EDGES
)


@query("fk_integrity_audit", oracle=_FK_ORACLE, tags=("audit", "integrity"))
def fk_integrity_audit(spark, sf_dir):
    frames = []
    for edge, child, ckey, parent, pkey in _FK_EDGES:
        c = T(spark, sf_dir, child).select(ckey)
        p = T(spark, sf_dir, parent).select(pkey).distinct()
        # broadcast only the BOUNDED dims (nation/region); customer,
        # supplier, part and orders all scale with SF — AQE decides those
        pside = F.broadcast(p) if parent in ("nation", "region") else p
        joined = c.join(pside, c[ckey] == p[pkey], "left")
        frames.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.count(F.when(p[pkey].isNull(), 1)).alias("n_orphans"),
            ).select(
                F.lit(edge).alias("fk_edge"), "n_child_rows", "n_orphans"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


# --- pk_uniqueness_audit: key-cardinality report -----------------------------
# rows vs distinct primary keys per table (composite for lineitem) — the
# duplicate-key gate.  Each table contributes one partial-aggregated
# count-distinct; the union is rows-per-table sized.

_PK_TABLES = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

_PK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, COUNT(*) AS n_rows,
  COUNT(DISTINCT {k}) AS n_distinct_keys,
  COUNT(*) - COUNT(DISTINCT {k}) AS n_duplicate_rows FROM {t}"""
    for t, k in _PK_TABLES
) + """
UNION ALL
SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows,
  COUNT(DISTINCT l_orderkey * 1000 + l_linenumber) AS n_distinct_keys,
  COUNT(*) - COUNT(DISTINCT l_orderkey * 1000 + l_linenumber)
    AS n_duplicate_rows
FROM lineitem"""


@query("pk_uniqueness_audit", oracle=_PK_ORACLE, tags=("audit", "integrity"))
def pk_uniqueness_audit(spark, sf_dir):
    frames = []
    for t, k in _PK_TABLES:
        df = T(spark, sf_dir, t)
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(k).alias("n_distinct_keys"),
                (F.count(F.lit(1)) - F.countDistinct(k)).alias(
                    "n_duplicate_rows"
                ),
            ).select(F.lit(t).alias("table_name"), "*")
        )
    li = T(spark, sf_dir, "lineitem")
    # composite key packed to one BIGINT (linenumber < 1000) so the
    # distinct is a single-column hash in both engines
    ck = F.expr("l_orderkey * 1000 + l_linenumber")
    frames.append(
        li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(ck).alias("n_distinct_keys"),
            (F.count(F.lit(1)) - F.countDistinct(ck)).alias(
                "n_duplicate_rows"
            ),
        ).select(F.lit("lineitem").alias("table_name"), "*")
    )
    out = reduce(lambda a, b: a.unionByName(b), frames)
    return out.select(
        "table_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_distinct_keys").cast("bigint").alias("n_distinct_keys"),
        F.col("n_duplicate_rows").cast("bigint").alias("n_duplicate_rows"),
    )


# --- benford_first_digit: first-digit distribution audit ---------------------
# The classic fraud/synthetic-data screen: distribution of the leading
# digit of value cents vs Benford's law.  The digit comes from the FIRST
# CHARACTER of the BIGINT's decimal string (identical rendering in both
# engines — no float log10); expected shares are integer ppm constants of
# log10(1+1/d), so the whole report is counting plus one ratio.  The
# observed-share denominator counts digits 1–9 ONLY (zero-cent rows land
# in digit '0' and are not part of Benford's domain — with them in the
# total, observed shares are deflated vs expected; review finding).

_BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910,
                5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757}

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM events
), counts AS (
  SELECT d, COUNT(*) AS n FROM digits GROUP BY d
), tot AS (SELECT SUM(n) AS total FROM counts WHERE d BETWEEN 1 AND 9),
expected(d, expected_ppm) AS (VALUES
  {', '.join(f'({d}, {p})' for d, p in _BENFORD_PPM.items())})
SELECT e.d AS first_digit,
  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_values,
  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
  CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT) AS observed_ppm
FROM expected e
LEFT JOIN counts c ON c.d = e.d
CROSS JOIN tot t
"""


@query("benford_first_digit", oracle=_BENFORD_ORACLE, tags=("audit", "benford"))
def benford_first_digit(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    digits = e.select(
        F.expr(
            "cast(substr(cast(cast(floor(value * 100 + 0.5) as bigint)"
            " as string), 1, 1) as bigint)"
        ).alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.filter(F.col("d").between(1, 9)).agg(
        F.sum("n").alias("total")
    )
    expected = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()], "d bigint, expected_ppm bigint"
    )
    return (
        expected.join(F.broadcast(counts), "d", "left")
        .transform(with_scalar_frame(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_values"),
            F.col("expected_ppm").cast("bigint").alias("expected_ppm"),
            F.expr(
                "cast(coalesce(n, 0) * 1000000 div total as bigint)"
            ).alias("observed_ppm"),
        )
    )


# --- freshness_audit: per-partition staleness report -------------------------
# The data-ops freshness gate: per day-partition, the row count, the last
# event's epoch second, and how many whole hours that partition's tail
# lags the table's global high-water mark — the report a scheduler uses
# to decide whether yesterday's load actually landed.  Global max via a
# scalar cross join (one row), day rollup partial-aggregated.

_FRESH_ORACLE = """
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
    MAX(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                  CAST(ts AS TIMESTAMP))) AS last_ep
  FROM events GROUP BY 1
), hwm AS (SELECT MAX(last_ep) AS global_ep FROM per_day)
SELECT p.d AS partition_day,
  CAST(p.n_events AS BIGINT) AS n_events,
  CAST(p.last_ep AS BIGINT) AS last_ep,
  CAST((h.global_ep - p.last_ep) // 3600 AS BIGINT) AS hours_behind
FROM per_day p CROSS JOIN hwm h
"""


@query("freshness_audit", oracle=_FRESH_ORACLE, tags=("audit", "freshness"))
def freshness_audit(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    per_day = e.groupBy(F.col("ts").cast("date").alias("partition_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_timestamp("ts")).alias("last_ep"),
    )
    hwm = per_day.agg(F.max("last_ep").alias("global_ep"))
    return per_day.transform(with_scalar_frame(hwm)).select(
        "partition_day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("last_ep").cast("bigint").alias("last_ep"),
        F.expr("cast((global_ep - last_ep) div 3600 as bigint)").alias(
            "hours_behind"
        ),
    )


# --- daily_anomaly_alerts: z-scores on the aggregate day series --------------
# Ops anomaly detection on the METRIC series (not per-entity): each day's
# total value scored against the all-days mean/std, flagging |z| > 2.
# Exact forms: day totals are integer cents; mean and variance come from
# the nSxx − Sx² identity over the ~30-row day frame (window over the
# aggregated series, no second scan); sqrt is IEEE-correctly-rounded, so
# the double z is deterministic (bollinger/autocorr precedent).

_DAILYZ_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
    SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1
), anch AS (
  SELECT d, cents,
    CAST(COUNT(*) OVER () AS BIGINT) AS n,
    CAST(SUM(cents) OVER () AS BIGINT) AS sx
  FROM daily
), dev AS (
  SELECT *, cents - (sx // n) AS dv FROM anch
), stats AS (
  SELECT d, cents, n, sx,
    CAST(SUM(dv) OVER () AS BIGINT) AS sd,
    CAST(SUM(dv * dv) OVER () AS BIGINT) AS sdd
  FROM dev
)
SELECT d AS day, CAST(cents AS BIGINT) AS cents,
  (cents - CAST(sx AS DOUBLE) / n)
    / NULLIF(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)) / n, 0) AS z,
  CAST(CASE WHEN abs((cents - CAST(sx AS DOUBLE) / n)
    / NULLIF(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)) / n, 0)) > 2
    THEN 1 ELSE 0 END AS BIGINT) AS is_alert
FROM stats
"""


@query("daily_anomaly_alerts", oracle=_DAILYZ_ORACLE, tags=("audit", "anomaly"))
def daily_anomaly_alerts(spark, sf_dir):
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.expr("sum(cast(floor(value * 100 + 0.5) as bigint))").alias("cents")
    )
    wall = Window.partitionBy()  # ~30-row day frame — global window is free
    # Overflow-proof exact variance (found by the sf10 sweep: day totals
    # reach ~1.6e9 cents at 100x, so Σcents² overflows BIGINT under ANSI
    # while DuckDB silently widens to HUGEINT).  Center on the integer
    # anchor sx div n first: the nSxx − Sx² identity is shift-invariant in
    # exact integer arithmetic, and day-total DEVIATIONS grow only with
    # √(events/day), keeping n·Σdev² inside BIGINT at any realistic scale.
    anch = daily.select(
        "day",
        F.col("cents").cast("bigint").alias("cents"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("cents").over(wall).cast("bigint").alias("sx"),
    ).withColumn("dv", F.col("cents") - F.expr("sx div n"))
    stats = anch.select(
        "day",
        "cents",
        "n",
        "sx",
        F.sum("dv").over(wall).cast("bigint").alias("sd"),
        F.sum(F.col("dv") * F.col("dv")).over(wall).cast("bigint").alias(
            "sdd"
        ),
    )
    sigma = F.sqrt(
        (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")).cast("double")
    ) / F.col("n")
    z = (F.col("cents") - F.col("sx").cast("double") / F.col("n")) / F.nullif(
        sigma, F.lit(0.0)
    )
    return stats.select(
        "day",
        "cents",
        z.alias("z"),
        F.when(F.abs(z) > 2, 1).otherwise(0).cast("bigint").alias("is_alert"),
    )


# --- duplicate_delivery_audit: at-least-once redelivery screen ---------------
# Events that look like duplicate DELIVERIES rather than organic repeats:
# identical (user, type, payload) observed more than once inside a bounded
# span but under different event_ids — the signature of an at-least-once
# producer retrying.  (Exact event_id duplicates are pk_uniqueness_audit's
# job; this catches payload-level redelivery.)  In production the payload
# grain is the full payload hash and the span ~minutes; on the synthetic
# corpus (no true redeliveries) the demo grain is whole dollars over a day
# so the report is non-empty and the shape is exercised — a cents/60 s
# parameterization returned 0 rows at every SF (the trivial-pass trap).
# One payload-grain partial-aggregated shuffle, then a per-user rollup.

_DUPDEL_ORACLE = """
WITH g AS (
  SELECT user_id, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS dollars,
    COUNT(*) AS n,
    MAX(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                  CAST(ts AS TIMESTAMP)))
      - MIN(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                      CAST(ts AS TIMESTAMP))) AS span_s
  FROM events
  GROUP BY 1, 2, 3
  HAVING COUNT(*) > 1
     AND MAX(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                       CAST(ts AS TIMESTAMP)))
       - MIN(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                       CAST(ts AS TIMESTAMP))) <= 86400
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_suspect_groups,
  CAST(SUM(n - 1) AS BIGINT) AS n_redundant_events,
  CAST(MAX(span_s) AS BIGINT) AS widest_span_s
FROM g
GROUP BY user_id
"""


@query(
    "duplicate_delivery_audit", oracle=_DUPDEL_ORACLE, tags=("audit", "dedup")
)
def duplicate_delivery_audit(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    g = (
        e.groupBy(
            "user_id",
            "event_type",
            F.expr(
                "cast(floor(value * 100 + 0.5) as bigint) div 100"
            ).alias("dollars"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
            ).alias("span_s"),
        )
        .filter((F.col("n") > 1) & (F.col("span_s") <= 86400))
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suspect_groups"),
        F.sum(F.col("n") - 1).cast("bigint").alias("n_redundant_events"),
        F.max("span_s").cast("bigint").alias("widest_span_s"),
    )
