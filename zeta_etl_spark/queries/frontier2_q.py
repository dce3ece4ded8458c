"""Frontier batch (round 8): seven operator families the engine did not
yet cover —

- ``market_basket_pairs``: association-rule mining (support / confidence /
  lift over co-purchased part pairs) — the classic a-priori 2-itemset
  pass, pair space bounded by per-order basket size.
- ``asof_nearest_event``: BIDIRECTIONAL as-of join — nearest match in
  time, either direction, with deterministic tie-breaks; both directions
  are O(n) running window frames (never a shrinking frame — see
  plans/lint unbounded-following-frame).
- ``lttb_downsample``: Largest-Triangle-Three-Buckets time-series
  downsampling (Steinarsson 2013), the standard viz decimation operator,
  with bucket-average anchors so every bucket's argmax is independent
  (parallel, not sequential).
- ``sax_motifs``: PAA + SAX symbolization of per-user-day activity and
  motif (repeated word) counting — time-series motif discovery.
- ``grid_density_clusters``: DBSCAN-style density clustering on the
  embedding plane via integer grid cells: core cells (>= min_pts) are
  connected through 8-neighborhood adjacency — grid-bucketed, never
  all-pairs point distances.
- ``hits_hub_authority``: Kleinberg's HITS on the directed value-flow
  graph, 2 unrolled integer-scaled iterations (the directed sibling of
  ``pagerank_sim_graph``).
- ``binseg_changepoint``: single change-point per user by binary
  segmentation (argmax between-segment separation over day prefix sums)
  — the first step of PELT-style segmentation, O(days) per key.

All determinism rules as SURVEY §5: BIGINT integer math (floor ``div`` ==
DuckDB ``//`` on non-negative operands), deterministic argmax via
min/max-of-struct, no float accumulation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zeta_etl_spark.operators.scalar_frame import scalar_frame_crossjoin
from zeta_etl_spark.queries.registry import T, query

# --- market_basket_pairs -----------------------------------------------------
# Association rules over order baskets (Agrawal et al., SIGMOD'93 a-priori
# 2-itemset pass).  Pair generation is a SELF-JOIN WITHIN the order key —
# work is sum(|basket|^2) with |basket| <= ~13, never |items|^2.  The
# item-count join shuffles on part key; lift/confidence are ppm-scaled
# BIGANTs; the final top-50 is a total order (cnt desc, part_a, part_b).

_BASKET_ORACLE = """
WITH i AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM i
), ic AS MATERIALIZED (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS item_cnt FROM i GROUP BY 1
), pc AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(COUNT(*) AS BIGINT) AS pair_cnt
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), top AS MATERIALIZED (
  -- the output order is a function of pc alone and the ic/n joins are
  -- 1:1 with no filter, so the top-50 commutes with them: take it FIRST
  -- (r9 sf10: joining the 119.6M-row pair grain to ic twice before the
  -- LIMIT ground past the 900 s oracle watchdog)
  SELECT * FROM pc WHERE pair_cnt >= 3
  ORDER BY pair_cnt DESC, part_a, part_b
  LIMIT 50
)
SELECT p.part_a, p.part_b, p.pair_cnt,
  (p.pair_cnt * 1000000) // ca.item_cnt AS confidence_ppm,
  (p.pair_cnt * n.n_orders * 1000000) // (ca.item_cnt * cb.item_cnt)
    AS lift_ppm
FROM top p
JOIN ic ca ON ca.l_partkey = p.part_a
JOIN ic cb ON cb.l_partkey = p.part_b
CROSS JOIN n
ORDER BY p.pair_cnt DESC, p.part_a, p.part_b
"""


@query(
    "market_basket_pairs",
    oracle=_BASKET_ORACLE,
    tags=("mining", "association-rules", "join"),
)
def market_basket_pairs(spark, sf_dir):
    from zeta_etl_spark.operators.graph import basket_arrays, pairs_from_arrays

    li = T(spark, sf_dir, "lineitem")
    # one exchange builds the basket arrays; n / ic / pc all derive from it
    # (AQE exchange reuse shares the shuffle across the three consumers) —
    # the former distinct + self-join needed three exchanges before the
    # pair groupBy and shuffled the item table twice
    baskets = basket_arrays(
        li.select("l_orderkey", "l_partkey"), "l_orderkey", "l_partkey"
    )
    n = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    ic = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("item_cnt"))
    )
    pc = (
        pairs_from_arrays(baskets, "part_a", "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 3)
    )
    # top-50 commutes with the 1:1 ic/n joins (order is a function of pc
    # alone): take it on the pair grain FIRST, then enrich 50 rows — the
    # pair frame is ~120M rows at sf10 and never needs to reach the joins
    top = pc.orderBy(F.desc("pair_cnt"), "part_a", "part_b").limit(50)
    # ic is PART-grain (data-sized, never broadcast); the 50-row top
    # frame is the broadcast side of both enrichment joins
    out = (
        ic.withColumnRenamed("l_partkey", "part_a")
        .join(F.broadcast(top), "part_a")
        .withColumnRenamed("item_cnt", "cnt_a")
    )
    out = (
        ic.withColumnRenamed("l_partkey", "part_b")
        .join(F.broadcast(out), "part_b")
        .withColumnRenamed("item_cnt", "cnt_b")
    )
    out = scalar_frame_crossjoin(out, n)
    return (
        out.select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.expr("(pair_cnt * 1000000) div cnt_a").alias("confidence_ppm"),
            F.expr(
                "(pair_cnt * n_orders * 1000000) div (cnt_a * cnt_b)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("pair_cnt"), "part_a", "part_b")
    )


# --- asof_nearest_event ------------------------------------------------------
# Nearest click (either direction in time) for every purchase, per user.
# Both directions are RUNNING frames: prior = last(click) over ascending
# (ts, is_purchase, event_id) rows UNBOUNDED PRECEDING..CURRENT; next =
# the same running frame over the DESCENDING order — O(n) each, one sort
# shuffle on user_id total (the second window reuses the partitioning).
# A shrinking (current..unboundedFollowing) frame would be O(n^2) — the
# exact trap plans/lint.py's unbounded-following-frame rule flags.
# Ordering puts a same-timestamp click BEFORE the purchase in ascending
# order (is_purchase tie key), so an equal-ts click is "prior" at
# distance 0 and never "next" — ties then prefer prior (<=).

_ASOF_NEAREST_ORACLE = """
WITH tagged AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('purchase', 'click')
), w AS (
  SELECT *,
    LAST_VALUE(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_p, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_ts,
    LAST_VALUE(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts DESC, is_p DESC, event_id DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_ts
  FROM tagged
)
SELECT event_id, user_id,
  CASE
    WHEN prior_ts IS NULL AND next_ts IS NULL THEN 'none'
    WHEN next_ts IS NULL THEN 'prior'
    WHEN prior_ts IS NULL THEN 'next'
    WHEN date_diff('microsecond', prior_ts, ts)
         <= date_diff('microsecond', ts, next_ts) THEN 'prior'
    ELSE 'next'
  END AS nearest_side,
  CASE
    WHEN prior_ts IS NULL AND next_ts IS NULL THEN NULL
    WHEN next_ts IS NULL
      THEN date_diff('microsecond', prior_ts, ts)
    WHEN prior_ts IS NULL
      THEN date_diff('microsecond', ts, next_ts)
    ELSE LEAST(date_diff('microsecond', prior_ts, ts),
               date_diff('microsecond', ts, next_ts))
  END AS nearest_dist_us
FROM w WHERE is_p = 1
"""


@query(
    "asof_nearest_event",
    oracle=_ASOF_NEAREST_ORACLE,
    tags=("join", "asof", "temporal"),
)
def asof_nearest_event(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_p"
        ),
    )
    click_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    w_asc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("is_p"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "is_p",
        F.last(click_ts, ignorenulls=True).over(w_asc).alias("prior_ts"),
        F.last(click_ts, ignorenulls=True).over(w_desc).alias("next_ts"),
    ).where(F.col("is_p") == 1)
    d_prior = F.col("ts").cast("long") * 0 + (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prior_ts"))
    )
    d_next = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    return w.select(
        "event_id",
        "user_id",
        F.when(
            F.col("prior_ts").isNull() & F.col("next_ts").isNull(), "none"
        )
        .when(F.col("next_ts").isNull(), "prior")
        .when(F.col("prior_ts").isNull(), "next")
        .when(d_prior <= d_next, "prior")
        .otherwise("next")
        .alias("nearest_side"),
        F.when(
            F.col("prior_ts").isNull() & F.col("next_ts").isNull(),
            F.lit(None).cast("bigint"),
        )
        .when(F.col("next_ts").isNull(), d_prior)
        .when(F.col("prior_ts").isNull(), d_next)
        .otherwise(F.least(d_prior, d_next))
        .alias("nearest_dist_us"),
    )


# --- lttb_downsample ---------------------------------------------------------
# Largest-Triangle-Three-Buckets (Steinarsson 2013) decimation of each
# user's event-value series to <= _LTTB_BUCKETS points.  Classic LTTB
# anchors each bucket's triangle on the PREVIOUSLY SELECTED point — a
# sequential dependency; the scale-parallel variant used here (and in
# production viz backends) anchors on the neighbor buckets' AVERAGES so
# every bucket is independent: one groupBy for bucket sums, lag/lead for
# neighbor anchors, one join back, min-of-struct argmax.  Integer math:
# coordinates are (microseconds, cents); anchor = floor-div average;
# |2*area| fits BIGINT (us-span ~2.6e9 * cents ~1e7).  Tie → earliest
# (ts, event_id).
# Oracle r9: the per-bucket argmax is scalar MAX/MIN aggregates + joins,
# NOT MIN(struct_pack(...)) — DuckDB's struct-aggregate state is not
# tracked by the memory limit and reached 117 GB RSS at sf10 (host OOM);
# IS NOT DISTINCT FROM keeps all-NULL buckets on the earliest-(x,e)
# branch, value-identical to the struct form.

_LTTB_BUCKETS = 10

_LTTB_ORACLE = f"""
WITH base AS (
  SELECT user_id, event_id,
    date_diff('microsecond', TIMESTAMP '2024-01-01',
              CAST(ts AS TIMESTAMP)) AS x,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
), bkt AS MATERIALIZED (
  SELECT *, (rn * {_LTTB_BUCKETS}) // n AS b FROM base
), avgs AS (
  SELECT user_id, b, SUM(x) AS sx, SUM(y) AS sy,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM bkt GROUP BY 1, 2
), anch AS MATERIALIZED (
  SELECT user_id, b,
    LAG(sx) OVER w // LAG(c) OVER w AS ax0,
    LAG(sy) OVER w // LAG(c) OVER w AS ay0,
    LEAD(sx) OVER w // LEAD(c) OVER w AS ax2,
    LEAD(sy) OVER w // LEAD(c) OVER w AS ay2
  FROM avgs WINDOW w AS (PARTITION BY user_id ORDER BY b)
), area AS MATERIALIZED (
  SELECT p.user_id, p.b, p.event_id, p.x, p.y,
    CASE WHEN a.ax0 IS NULL OR a.ax2 IS NULL THEN NULL
      ELSE abs((a.ax0 - p.x) * (a.ay2 - p.y) - (a.ax2 - p.x) * (a.ay0 - p.y))
    END AS area2
  FROM bkt p JOIN anch a ON a.user_id = p.user_id AND a.b = p.b
), w1 AS MATERIALIZED (
  SELECT user_id, b, MAX(area2) AS ma FROM area GROUP BY 1, 2
), c1 AS MATERIALIZED (
  SELECT a.user_id, a.b, a.x, a.event_id
  FROM area a JOIN w1 ON w1.user_id = a.user_id AND w1.b = a.b
    AND a.area2 IS NOT DISTINCT FROM w1.ma
), w2 AS (
  SELECT user_id, b, MIN(x) AS mx FROM c1 GROUP BY 1, 2
)
SELECT c.user_id, c.b AS bucket, MIN(c.event_id) AS event_id
FROM c1 c JOIN w2 ON w2.user_id = c.user_id AND w2.b = c.b AND c.x = w2.mx
GROUP BY 1, 2
"""


@query(
    "lttb_downsample",
    oracle=_LTTB_ORACLE,
    tags=("timeseries", "downsample", "window"),
)
def lttb_downsample(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy(
        F.col("ts").cast("timestamp"), "event_id"
    )
    w_cnt = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        "event_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
        ).alias("x"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("y"),
        (F.row_number().over(w_rn) - 1).alias("rn"),
        F.count(F.lit(1)).over(w_cnt).alias("n"),
    )
    bkt = base.withColumn(
        "b", F.expr(f"(rn * {_LTTB_BUCKETS}) div n")
    )
    avgs = bkt.groupBy("user_id", "b").agg(
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    # integer floor-div anchors (lag/lead of sums then div) — built
    # explicitly to keep the division integral on both engines
    anch = avgs.select(
        "user_id",
        "b",
        F.expr("lag(sx, 1) over (partition by user_id order by b)").alias(
            "lsx"
        ),
        F.expr("lag(sy, 1) over (partition by user_id order by b)").alias(
            "lsy"
        ),
        F.expr("lag(c, 1) over (partition by user_id order by b)").alias(
            "lc"
        ),
        F.expr("lead(sx, 1) over (partition by user_id order by b)").alias(
            "nsx"
        ),
        F.expr("lead(sy, 1) over (partition by user_id order by b)").alias(
            "nsy"
        ),
        F.expr("lead(c, 1) over (partition by user_id order by b)").alias(
            "nc"
        ),
    ).select(
        "user_id",
        "b",
        F.expr("lsx div lc").alias("ax0"),
        F.expr("lsy div lc").alias("ay0"),
        F.expr("nsx div nc").alias("ax2"),
        F.expr("nsy div nc").alias("ay2"),
    )
    area = bkt.join(anch, ["user_id", "b"]).select(
        "user_id",
        "b",
        "event_id",
        "x",
        "y",
        F.when(
            F.col("ax0").isNull() | F.col("ax2").isNull(),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.abs(
                (F.col("ax0") - F.col("x")) * (F.col("ay2") - F.col("y"))
                - (F.col("ax2") - F.col("x")) * (F.col("ay0") - F.col("y"))
            )
        )
        .alias("area2"),
    )
    return area.groupBy("user_id", F.col("b").alias("bucket")).agg(
        F.when(
            F.min("area2").isNull(),
            F.min(F.struct("x", "event_id"))["event_id"],
        )
        .otherwise(
            F.min(F.struct((-F.col("area2")).alias("neg"), "x", "event_id"))[
                "event_id"
            ]
        )
        .alias("event_id")
    )


# --- sax_motifs --------------------------------------------------------------
# PAA + SAX (Lin et al., DMKD'07) over each user's month of activity: the
# daily cent-sums are piecewise-aggregated into 6 five-day segments
# (PAA), each segment discretized into symbols a-d by its ppm share of
# the user's month total — a shape alphabet invariant to the user's
# scale.  Motifs = SAX words shared by >= 2 users.  One shuffle to
# (user, segment), one to user, one to word; per-key work is O(1).

_SAX_ORACLE = """
WITH seg AS (
  SELECT user_id,
    date_diff('day', DATE '2024-01-01',
              CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 5 AS seg,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT user_id, SUM(cents) AS tot_cents, COUNT(*) AS n_segs
  FROM seg GROUP BY 1
), sym AS (
  SELECT s.user_id, s.seg,
    CASE
      WHEN (s.cents * 1000000) // t.tot_cents < 100000 THEN 'a'
      WHEN (s.cents * 1000000) // t.tot_cents < 166667 THEN 'b'
      WHEN (s.cents * 1000000) // t.tot_cents < 233334 THEN 'c'
      ELSE 'd'
    END AS symbol
  FROM seg s JOIN tot t ON t.user_id = s.user_id
  WHERE t.tot_cents > 0 AND t.n_segs = 6
), words AS (
  SELECT user_id, string_agg(symbol, '' ORDER BY seg) AS word
  FROM sym GROUP BY 1
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_users
FROM words GROUP BY word HAVING COUNT(*) >= 2
"""


@query("sax_motifs", oracle=_SAX_ORACLE, tags=("timeseries", "sax", "motif"))
def sax_motifs(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    seg = ev.groupBy(
        "user_id",
        F.expr(
            "datediff(cast(cast(ts as timestamp) as date), "
            "date '2024-01-01') div 5"
        ).alias("seg"),
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    tot = seg.groupBy("user_id").agg(
        F.sum("cents").alias("tot_cents"),
        F.count(F.lit(1)).alias("n_segs"),
    )
    share = F.expr("(cents * 1000000) div tot_cents")
    sym = (
        seg.join(tot, "user_id")
        .where((F.col("tot_cents") > 0) & (F.col("n_segs") == 6))
        .select(
            "user_id",
            "seg",
            F.when(share < 100000, "a")
            .when(share < 166667, "b")
            .when(share < 233334, "c")
            .otherwise("d")
            .alias("symbol"),
        )
    )
    words = sym.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("seg", "symbol"))).getField(
                "symbol"
            ),
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .where(F.col("n_users") >= 2)
    )


# --- grid_density_clusters ---------------------------------------------------
# DBSCAN-style density clustering of the embedding plane (dims 0, 1)
# without any all-pairs distance join: quantize to an integer grid, keep
# cells with >= _GRID_MINPTS points (core cells), connect core cells
# through 8-neighborhood adjacency, and label components with the MIN
# linearized cell id via iterative label propagation (bounded rounds —
# the cell graph is tiny relative to points).  Oracle: recursive-CTE
# label propagation to the same fixpoint.  Coordinates are offset to
# non-negative before the floor division so Spark `div` and DuckDB `//`
# agree.

_GRID_CELL = 500  # milli-units per cell
_GRID_MINPTS = 8
_GRID_OFF = 1_000_000


def _grid_cells_sql() -> str:
    return f"""
  SELECT
    (CAST(floor(embedding[1] * 1000 + 0.5) AS BIGINT) + {_GRID_OFF})
      // {_GRID_CELL} AS gx,
    (CAST(floor(embedding[2] * 1000 + 0.5) AS BIGINT) + {_GRID_OFF})
      // {_GRID_CELL} AS gy,
    CAST(COUNT(*) AS BIGINT) AS n_points
  FROM embeddings GROUP BY 1, 2
"""


_GRID_ORACLE = f"""
WITH RECURSIVE cells AS ({_grid_cells_sql()}
), core AS (
  SELECT gx, gy, n_points, gx * 100000 + gy AS cell_id
  FROM cells WHERE n_points >= {_GRID_MINPTS}
), edges AS (
  SELECT a.cell_id AS src, b.cell_id AS dst
  FROM core a JOIN core b
    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
), walk(cell_id, label) AS (
  SELECT cell_id, cell_id FROM core
  UNION
  SELECT e.src, w.label
  FROM walk w JOIN edges e ON e.dst = w.cell_id
  WHERE w.label < e.src
)
SELECT c.cell_id, c.gx, c.gy, c.n_points,
  MIN(w.label) AS cluster_id
FROM core c JOIN walk w ON w.cell_id = c.cell_id
GROUP BY 1, 2, 3, 4
"""


@query(
    "grid_density_clusters",
    oracle=_GRID_ORACLE,
    tags=("clustering", "dbscan", "graph"),
)
def grid_density_clusters(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            F.expr(
                f"(cast(floor(element_at(embedding, 1) * 1000 + 0.5) as "
                f"bigint) + {_GRID_OFF}) div {_GRID_CELL}"
            ).alias("gx"),
            F.expr(
                f"(cast(floor(element_at(embedding, 2) * 1000 + 0.5) as "
                f"bigint) + {_GRID_OFF}) div {_GRID_CELL}"
            ).alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    )
    core = cells.where(F.col("n_points") >= _GRID_MINPTS).withColumn(
        "cell_id", F.col("gx") * 100000 + F.col("gy")
    )
    # 8-neighborhood adjacency as an EQUI-join: explode each core cell to
    # its 9 neighbor coordinates and join on exact (gx, gy) — bucketed,
    # no inequality join, no cartesian
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx}L as dx, {dy}L as dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    probes = core.select(
        F.col("cell_id").alias("src"), "gx", "gy", offsets.alias("o")
    ).select(
        "src",
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
    )
    edges = probes.join(
        core.select("gx", "gy", F.col("cell_id").alias("dst")), ["gx", "gy"]
    ).select("src", "dst")
    # exact fixpoint labeling on the (tiny) core-cell graph via the
    # engine's star-contraction connected components — O(log n) rounds
    # regardless of component diameter (operators/dedup.py)
    from zeta_etl_spark.operators.dedup import connected_components_star

    labels = connected_components_star(edges)
    return core.join(
        labels, core["cell_id"] == labels["doc_id"]
    ).select(
        "cell_id", "gx", "gy", "n_points", F.col("label").alias("cluster_id")
    )


# --- hits_hub_authority ------------------------------------------------------
# Kleinberg's HITS (JACM'99) on the directed user value-flow graph: per
# hour, users are ranked by cent-sum (desc, user_id tiebreak) and each
# user points at the next _HITS_FANOUT lower-ranked users — a
# rank-adjacency graph whose edge count is participants x fanout, NEVER
# the all-pairs-per-hour quadratic (at 100 TB an hour can hold 10^5+
# active users; |hour|^2 would be 10^10 edges/hour).  2 unrolled
# iterations of h = sum(a(dst)), a = sum(h(src)), each renormalized to
# max = 1e6 by integer floor division — no float norms.  Each round is
# one shuffle per side.

_HITS_SCALE = 1_000_000
_HITS_FANOUT = 5


def _hits_oracle() -> str:
    # Oracle scale note (r9, sf10 sweep): DuckDB re-evaluates a CTE per
    # reference, and ``edges`` is referenced 4x with two more scalar
    # subqueries per renorm — at 10M events the un-materialized form
    # spilled past the 24 GB cap (r8: ORACLE_RESOURCE).  Fixes that keep
    # values bit-identical: ``edges AS MATERIALIZED`` (one evaluation),
    # and renorm via ``MAX(...) OVER ()`` — a single-pass window instead
    # of a scalar subquery that re-runs the upstream CTE.
    offs = ", ".join(str(i) for i in range(1, _HITS_FANOUT + 1))
    return f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
    ROW_NUMBER() OVER (
      PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP))
      ORDER BY SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) DESC, user_id
    ) AS rnk
  FROM events GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
), edges AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM hourly a
  JOIN (SELECT unnest(ARRAY[{offs}]) AS o) offs ON true
  JOIN hourly b ON b.hr = a.hr AND b.rnk = a.rnk + offs.o
  WHERE a.user_id <> b.user_id
), a0 AS (
  SELECT DISTINCT dst AS user_id, CAST({_HITS_SCALE} AS BIGINT) AS a
  FROM edges
), h1 AS (
  SELECT user_id, (h * {_HITS_SCALE}) // (MAX(h) OVER ()) AS h
  FROM (
    SELECT e.src AS user_id, CAST(SUM(a.a) AS BIGINT) AS h
    FROM edges e JOIN a0 a ON a.user_id = e.dst GROUP BY 1
  )
), a1 AS MATERIALIZED (
  SELECT user_id, (a * {_HITS_SCALE}) // (MAX(a) OVER ()) AS a
  FROM (
    SELECT e.dst AS user_id, CAST(SUM(h.h) AS BIGINT) AS a
    FROM edges e JOIN h1 h ON h.user_id = e.src GROUP BY 1
  )
), h2 AS (
  SELECT user_id, (h * {_HITS_SCALE}) // (MAX(h) OVER ()) AS h
  FROM (
    SELECT e.src AS user_id, CAST(SUM(a.a) AS BIGINT) AS h
    FROM edges e JOIN a1 a ON a.user_id = e.dst GROUP BY 1
  )
)
SELECT COALESCE(h.user_id, a.user_id) AS user_id,
  COALESCE(h.h, 0) AS hub_scaled,
  COALESCE(a.a, 0) AS authority_scaled
FROM h2 h FULL OUTER JOIN a1 a ON a.user_id = h.user_id
"""


@query(
    "hits_hub_authority",
    oracle=_hits_oracle(),
    tags=("graph", "hits", "iterative"),
)
def hits_hub_authority(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hr"),
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    # Optimization r13 (guide §2.4): "user at rank r+o" is lead(user, o)
    # over the SAME hourly ranking window — the rank-offset equi-join
    # (which exploded every ranked row 5× and re-shuffled both sides on
    # (hr, rnk)) is a window function the ranking pass computes for free.
    # lead() returns NULL past the bottom of the hour, exactly the ranks
    # the join found no match for.
    w_rank = Window.partitionBy("hr").orderBy(F.desc("cents"), "user_id")
    ranked = hourly.select(
        F.col("user_id").alias("src"),
        *[
            F.lead("user_id", o).over(w_rank).alias(f"_d{o}")
            for o in range(1, _HITS_FANOUT + 1)
        ],
    )
    edges = (
        ranked.select(
            "src",
            F.explode(
                F.array(*[f"_d{o}" for o in range(1, _HITS_FANOUT + 1)])
            ).alias("dst"),
        )
        .where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )

    def renorm(df, col):
        mx = df.agg(F.max(col).cast("bigint").alias("mx"))
        return scalar_frame_crossjoin(df, mx).select(
            "user_id",
            F.expr(f"({col} * {_HITS_SCALE}) div mx").alias(col),
        )

    a0 = edges.select(F.col("dst").alias("user_id")).distinct().withColumn(
        "a", F.lit(_HITS_SCALE).cast("bigint")
    )
    h1 = renorm(
        edges.join(a0, edges["dst"] == a0["user_id"])
        .groupBy(F.col("src").alias("user_id"))
        .agg(F.sum("a").cast("bigint").alias("h")),
        "h",
    ).localCheckpoint()
    a1 = renorm(
        edges.join(h1, edges["src"] == h1["user_id"])
        .groupBy(F.col("dst").alias("user_id"))
        .agg(F.sum("h").cast("bigint").alias("a")),
        "a",
    ).localCheckpoint()
    h2 = renorm(
        edges.join(a1, edges["dst"] == a1["user_id"])
        .groupBy(F.col("src").alias("user_id"))
        .agg(F.sum("a").cast("bigint").alias("h")),
        "h",
    )
    return (
        h2.withColumnRenamed("user_id", "hu")
        .join(
            a1.withColumnRenamed("user_id", "au"),
            F.col("hu") == F.col("au"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("hu"), F.col("au")).alias("user_id"),
            F.coalesce(F.col("h"), F.lit(0)).alias("hub_scaled"),
            F.coalesce(F.col("a"), F.lit(0)).alias("authority_scaled"),
        )
    )


# --- binseg_changepoint ------------------------------------------------------
# Single change-point per user by binary segmentation — argmax over split
# positions k of the between-segment separation
#   gain(k) = (n * S_k - k * S)^2 // (k * (n - k))
# computed from day-grain prefix sums (S_k = prefix dollar sum, S = total,
# n = active-day count).  This is the first split of PELT/BinSeg
# segmentation; day-grain pre-aggregation bounds per-key work at O(days).
# Dollar (not cent) units keep (n*S_k - k*S)^2 far inside BIGINT at any
# realistic per-day volume.  Tie → smallest k.  Users with < 4 active
# days are excluded (no interior split with 2-day margins).

_BINSEG_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100 AS BIGINT)
      AS dollars
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT user_id, day, dollars,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS k,
    COUNT(*) OVER (PARTITION BY user_id) AS n,
    CAST(SUM(dollars) OVER (PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk,
    CAST(SUM(dollars) OVER (PARTITION BY user_id) AS BIGINT) AS s
  FROM daily
), gains AS (
  SELECT user_id, day, k, n,
    CAST(((n * sk - k * s) * (n * sk - k * s)) // (k * (n - k)) AS BIGINT)
      AS gain
  FROM seq WHERE n >= 4 AND k >= 2 AND k <= n - 2
)
SELECT user_id,
  MIN(struct_pack(ng := -gain, k := k, d := day))['d'] AS split_day,
  MAX(gain) AS gain
FROM gains GROUP BY user_id
"""


@query(
    "binseg_changepoint",
    oracle=_BINSEG_ORACLE,
    tags=("statistics", "changepoint", "window"),
)
def binseg_changepoint(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
    ).agg(
        F.expr(
            "cast(sum(cast(floor(value * 100 + 0.5) as bigint)) div 100 "
            "as bigint)"
        ).alias("dollars")
    )
    w_ord = Window.partitionBy("user_id").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("user_id")
    seq = daily.select(
        "user_id",
        "day",
        F.row_number().over(w_ord).alias("k"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("dollars").over(w_run).alias("sk"),
        F.sum("dollars").over(w_all).alias("s"),
    )
    gains = seq.where(
        (F.col("n") >= 4) & (F.col("k") >= 2) & (F.col("k") <= F.col("n") - 2)
    ).select(
        "user_id",
        "day",
        "k",
        F.expr(
            "((n * sk - k * s) * (n * sk - k * s)) div (k * (n - k))"
        ).alias("gain"),
    )
    return gains.groupBy("user_id").agg(
        F.min(F.struct((-F.col("gain")).alias("ng"), "k", "day"))[
            "day"
        ].alias("split_day"),
        F.max("gain").alias("gain"),
    )
