"""Property-based checks (SURVEY.md §5.4): algebraic invariants the reference
relies on implicitly, verified over generated inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zeta_etl_spark.operators.cdc import latest_by_keys
from zeta_etl_spark.operators.windows import cumsum, share_of_total

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=10_000),  # seq
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_cumsum_final_equals_group_total(spark, rows):
    df = spark.createDataFrame(
        [(k, s, i, float(v)) for i, (k, s, v) in enumerate(rows)],
        "key int, seq int, uid int, value double",
    )
    out = cumsum(df, "value", ["key"], [F.col("seq"), F.col("uid")], "cum")
    last = latest_by_keys(out, ["key"], ["seq", "uid"]).select("key", "cum")
    totals = df.groupBy("key").agg(
        F.sum(F.col("value").cast("DECIMAL(32,6)")).cast("double").alias("t")
    )
    joined = last.join(totals, "key").collect()
    for r in joined:
        assert abs(r["cum"] - r["t"]) < 1e-4


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_share_of_total_sums_to_one(spark, rows):
    df = spark.createDataFrame(
        [(k, abs(float(v)) + 1.0) for k, _, v in rows],
        "key int, value double",
    )
    out = share_of_total(df, "value", ["key"], "share")
    sums = out.groupBy("key").agg(F.sum("share").alias("s")).collect()
    # denominator is the 1e-6-rounded decimal total → ppm-level slack
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_latest_by_keys_unique_and_maximal(spark, rows):
    df = spark.createDataFrame(
        [(k, s, i) for i, (k, s, _) in enumerate(rows)],
        "key int, seq int, uid int",
    )
    out = latest_by_keys(df, ["key"], ["seq", "uid"])
    assert out.groupBy("key").count().filter("count > 1").count() == 0
    maxes = df.groupBy("key").agg(F.max("seq").alias("m"))
    bad = out.join(maxes, "key").filter(F.col("seq") != F.col("m"))
    assert bad.count() == 0


def test_rollup_total_equals_sum_of_parts(spark):
    from zeta_etl_spark.operators.reshape import rollup_with_total

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.5), ("b", 4.0)], "k string, v double"
    )
    out = rollup_with_total(
        df, "k", [F.sum(F.col("v").cast("DECIMAL(32,6)")).cast("double").alias("s")]
    ).collect()
    by_k = {r["k"]: r["s"] for r in out}
    assert abs(by_k["ALL"] - (by_k["a"] + by_k["b"])) < 1e-9


def test_approx_aggregates_close_to_exact(spark, sf_dir):
    """A6/A9 scale variants: approx_count_distinct and percentile_approx are
    the 100 TB substitutes for countDistinct/median — verify bounded error."""
    from zeta_etl_spark.datasets import load_table

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.median("value").alias("exact_median"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_median"),
    ).first()
    assert abs(row["approx_users"] - row["exact_users"]) <= max(
        2, 0.05 * row["exact_users"]
    )
    assert abs(row["approx_median"] - row["exact_median"]) <= 0.05 * max(
        1.0, abs(row["exact_median"])
    )


def test_seeded_rand_is_deterministic(spark):
    """§2.8 math family: rand(seed) team assignment (madwars-pipeline.py:60)
    must be reproducible run-to-run under a fixed seed and partitioning."""
    def assign():
        df = spark.range(0, 100, 1, 4)
        return {
            r["id"]: r["team"]
            for r in df.withColumn(
                "team", (F.rand(42) * 4).cast("int")
            ).collect()
        }

    a, b = assign(), assign()
    assert a == b
    assert len(set(a.values())) > 1


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                # key
            st.integers(0, 50_000),           # start offset (s)
            st.integers(1, 30_000),           # duration (s)
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_overlap_join_matches_naive(spark, rows):
    """The bucketized interval-overlap join must be EXACTLY the naive
    all-pairs overlap join for any interval layout (bucket boundaries,
    shared-bucket dedup, multi-key)."""
    from datetime import datetime, timedelta

    from zeta_etl_spark.operators.temporal import interval_overlap_join

    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(k, i, t0 + timedelta(seconds=s), t0 + timedelta(seconds=s + d))
         for i, (k, s, d) in enumerate(rows)],
        "k int, lid int, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [(k, i, t0 + timedelta(seconds=s * 2 % 50_000),
          t0 + timedelta(seconds=s * 2 % 50_000 + d))
         for i, (k, s, d) in enumerate(rows)],
        "k int, rid int, r_start timestamp, r_end timestamp",
    )
    fast = interval_overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end",
        keys=["k"], bucket_seconds=3600,
    ).select("lid", "rid")
    naive = (
        left.join(right, "k")
        .filter(
            (F.col("l_start") < F.col("r_end"))
            & (F.col("l_end") > F.col("r_start"))
        )
        .select("lid", "rid")
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_interval_overlap_join_preserves_duplicate_multiplicity(spark):
    """ADVICE r2: identical input rows (no distinguishing id) must stay
    distinct pairs in the output — bag semantics, like the plain overlap
    join.  Two identical-priced quotes from different (projected-away)
    order_ids are two quotes, not one."""
    from datetime import datetime

    from zeta_etl_spark.operators.temporal import interval_overlap_join

    t = datetime(2024, 1, 1, 0, 0, 0)
    t2 = datetime(2024, 1, 1, 5, 0, 0)   # spans several 1h buckets
    left = spark.createDataFrame(
        [("A", t, t2, 10.0), ("A", t, t2, 10.0)],   # exact duplicates
        "k string, l_start timestamp, l_end timestamp, bid double",
    )
    right = spark.createDataFrame(
        [("A", t, t2, 11.0)],
        "k string, r_start timestamp, r_end timestamp, ask double",
    )
    out = interval_overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end",
        keys=["k"], bucket_seconds=3600,
    )
    assert out.count() == 2   # was 1 with the old trailing .distinct()


def test_asof_join_deterministic_under_shuffling(spark):
    """Duplicate (key, ts) right rows must resolve identically regardless of
    input order/partitioning (the r2 tie-break fix)."""
    from datetime import datetime

    from zeta_etl_spark.operators.temporal import as_of_join

    t0 = datetime(2024, 1, 1, 12)
    left = spark.createDataFrame(
        [("k", t0)], "key string, lts timestamp"
    )
    dups = [("k", datetime(2024, 1, 1, 11), float(v)) for v in (3, 8, 1, 8)]
    results = set()
    for rot in range(4):
        right = spark.createDataFrame(
            dups[rot:] + dups[:rot], "key string, rts timestamp, val double"
        ).repartition(5)
        out = as_of_join(left, right, ["key"], "lts", "rts", ["val"]).collect()
        results.add(out[0]["val"])
    assert results == {8.0}


def test_corpus_packing_invariants(spark, sf_dir):
    """Packing invariants (VERDICT r2 next-7): every doc packed exactly
    once, token counts conserved, and NO pack holds more than the 256-token
    budget when the per-pack spans are re-aggregated from the output."""
    from zeta_etl_spark.queries import REGISTRY
    from zeta_etl_spark.queries.curation_q import _PACK_BUDGET

    out = REGISTRY["corpus_pack_docs"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.count() == docs.count()                      # every doc once
    assert out.select("doc_id").distinct().count() == docs.count()

    b = _PACK_BUDGET
    # re-derive each doc's token span inside every pack it touches:
    # overlap of [cum_excl, cum_excl + n_tokens) with [pack*b, (pack+1)*b)
    spans = out.selectExpr(
        "source",
        "explode(sequence(start_pack, end_pack)) AS pack",
        "start_pack * {b} + start_offset AS tok_begin".format(b=b),
        "start_pack * {b} + start_offset + n_tokens AS tok_end".format(b=b),
    ).selectExpr(
        "source",
        "pack",
        "least(tok_end, (pack + 1) * {b}) - greatest(tok_begin, pack * {b}) "
        "AS tokens_in_pack".format(b=b),
    )
    per_pack = spans.groupBy("source", "pack").agg(
        F.sum("tokens_in_pack").alias("pack_tokens")
    )
    assert per_pack.filter(F.col("pack_tokens") > b).count() == 0
    # conservation: span tokens sum to the original token counts
    total_spans = spans.agg(F.sum("tokens_in_pack")).first()[0]
    total_tokens = out.agg(F.sum("n_tokens")).first()[0]
    assert total_spans == total_tokens


def test_countmin_sketch_estimate_bounds(spark, sf_dir):
    """CMS guarantees: the point estimate (min over depths of the hashed
    cell) never underestimates the true frequency, and with width=256 the
    classic bound caps overestimation at ~e/width * N."""
    from zeta_etl_spark.functions.text import spark_hex2long
    from zeta_etl_spark.queries import REGISTRY
    from zeta_etl_spark.queries.analytics_q import _CMS_DEPTH, _CMS_WIDTH

    sketch = {
        (r["depth"], r["bucket"]): r["cnt"]
        for r in REGISTRY["countmin_sketch"].fn(spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_total = events.count()
    truth = {
        r["user_id"]: r["cnt"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # recompute each sampled user's buckets with the same salted hash
    users = list(truth)[:50]
    hashed = events.sparkSession.createDataFrame(
        [(u,) for u in users], "user_id bigint"
    ).select(
        "user_id",
        *[
            (
                F.expr(
                    spark_hex2long(
                        f"concat('cms{d}:', cast(user_id as string))", digits=8
                    )
                )
                % _CMS_WIDTH
            ).alias(f"b{d}")
            for d in range(_CMS_DEPTH)
        ],
    )
    slack = 3 * n_total / _CMS_WIDTH  # e/width*N with margin
    for r in hashed.collect():
        est = min(
            sketch.get((d, r[f"b{d}"]), 0) for d in range(_CMS_DEPTH)
        )
        true = truth[r["user_id"]]
        assert est >= true, (r["user_id"], est, true)
        assert est <= true + slack, (r["user_id"], est, true, slack)


def test_hll_and_kmv_distinct_estimates(spark):
    """Sketch estimator accuracy at sf0.1 (1500 distinct users): the HLL
    harmonic-mean estimate lands within ~3 standard errors (1.04/sqrt(256)
    = 6.5%) and the KMV (k-1)/x_k estimate within ~3*n/sqrt(64)."""
    from zeta_etl_spark.queries import REGISTRY
    from zeta_etl_spark.queries.analytics_q import _HLL_M, _KMV_K

    from zeta_etl_spark.datasets import load_table

    sf = "/root/testdata/sf0.1"
    exact = (
        load_table(spark, sf, "events")
        .select("user_id").distinct().count()
    )

    regs = {
        r["register"]: r["max_rank"]
        for r in REGISTRY["hll_registers"].fn(spark, sf).collect()
    }
    m = _HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    v = sum(1 for j in range(m) if j not in regs)
    if est <= 2.5 * m and v > 0:  # small-range (linear counting) correction
        import math
        est = m * math.log(m / v)
    assert abs(est - exact) / exact < 0.20, (est, exact)

    kmv = REGISTRY["kmv_bottomk"].fn(spark, sf).collect()
    assert len(kmv) == _KMV_K
    xk = max(r["hash_val"] for r in kmv) / float(16 ** 15)  # normalize 60-bit
    est_kmv = (_KMV_K - 1) / xk
    assert abs(est_kmv - exact) / exact < 0.40, (est_kmv, exact)


def test_chunk_udtf_matches_codegen_grid(spark, sf_dir):
    """Python UDTF chunker (lateral table function) yields exactly the
    codegen chunk_docs grid — same chunk ids, token counts and md5 chunk
    hashes — proving the API surface without admitting it to the hot path."""
    from pyspark.sql import functions as F2

    from zeta_etl_spark.functions.python_surface import ChunkDocUDTF
    from zeta_etl_spark.queries import REGISTRY
    from zeta_etl_spark.queries.registry import T

    docs = T(spark, sf_dir, "documents").filter("doc_id < 20")
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_chunk_tokens, "
        "md5(c.chunk_text) AS chunk_hash "
        "FROM _udtf_docs d, LATERAL chunk_doc(d.text) c"
    )
    want = (
        REGISTRY["chunk_docs"].fn(spark, sf_dir).filter("doc_id < 20")
    )
    g = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_hash"])
        for r in got.collect()
    }
    w = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_hash"])
        for r in want.collect()
    }
    assert g == w and len(g) > 0


def test_morton_code_interleave_and_tile_locality(spark, sf_dir):
    """Morton code: known-value bit interleave, and the tile property that
    makes Z-order pruning work — every bucket of 2^20 consecutive z-codes
    is a 1024x1024 tile, so BOTH dimensions' spans are <= 1023 within any
    bucket (a single-column sort leaves the other span full-range)."""
    from pyspark.sql import functions as F2

    from zeta_etl_spark.operators.reshape import morton_code_sql
    from zeta_etl_spark.queries import REGISTRY

    # interleave(a=0b11, b=0b01) = a0<<0 | b0<<1 | a1<<2 | b1<<3 = 0b0111
    df = spark.createDataFrame([(3, 1)], "a bigint, b bigint")
    code = df.select(F2.expr(morton_code_sql("a", "b")).alias("z")).first()["z"]
    assert code == 0b0111
    df2 = spark.createDataFrame([(0, 65535)], "a bigint, b bigint")
    code2 = df2.select(F2.expr(morton_code_sql("a", "b")).alias("z")).first()["z"]
    assert code2 == sum(1 << (2 * i + 1) for i in range(16))

    stats = REGISTRY["zorder_bucket_stats"].fn(spark, sf_dir)
    bad = stats.filter(
        (F2.col("ck_max") - F2.col("ck_min") > 1023)
        | (F2.col("ok_max") - F2.col("ok_min") > 1023)
    )
    assert stats.count() > 0
    assert bad.count() == 0


def test_hll_rolling_merge_estimates_rolling_distinct(spark):
    """The merged 3-day rolling registers estimate each day's exact 3-day
    rolling COUNT(DISTINCT user_id) within sketch error (~3σ = 20%) — the
    mergeable-rollup property: window estimates come from sketch merges,
    never a second scan of the events."""
    import datetime as _dt
    import math

    from pyspark.sql import functions as F2

    from zeta_etl_spark.datasets import load_table
    from zeta_etl_spark.queries import REGISTRY
    from zeta_etl_spark.queries.analytics_q import _HLL_M

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        _check_rolling_hll(spark, sf)


def _check_rolling_hll(spark, sf):
    import datetime as _dt
    import math

    from pyspark.sql import functions as F2

    from zeta_etl_spark.datasets import load_table
    from zeta_etl_spark.queries import REGISTRY
    from zeta_etl_spark.queries.analytics_q import _HLL_M

    rows = REGISTRY["hll_rolling_registers"].fn(spark, sf).collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["day"], {})[r["register"]] = r["rolling_max_rank"]

    ev = load_table(spark, sf, "events").select(
        F2.expr("cast(date_trunc('day', ts) as date)").alias("day"), "user_id"
    )
    days = sorted(by_day)
    # spot-check up to 5 days spread across the range
    step = max(1, len(days) // 5)
    m = _HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    for day in days[::step]:
        lo = day - _dt.timedelta(days=2)
        exact = (
            ev.filter((F2.col("day") >= F2.lit(lo)) & (F2.col("day") <= F2.lit(day)))
            .select("user_id").distinct().count()
        )
        regs = by_day[day]
        s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
        est = alpha * m * m / s
        v = sum(1 for j in range(m) if j not in regs)
        if est <= 2.5 * m and v > 0:
            est = m * math.log(m / v)
        assert abs(est - exact) / exact < 0.20, (day, est, exact)


_EDGES = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=0,
    max_size=30,
)

_CC_SETTINGS = dict(
    max_examples=6,  # each example runs two iterative Spark fixpoints
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=_EDGES)
@settings(**_CC_SETTINGS)
def test_star_cc_equals_minlabel_on_random_graphs(spark, edges):
    """Property: large-star/small-star contraction and min-label
    propagation produce identical component labels on arbitrary graphs
    (self-loops, duplicates, disconnected nodes, empty)."""
    from zeta_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "src bigint, dst bigint") \
        if edges else spark.createDataFrame([], "src bigint, dst bigint")
    a = {
        r["doc_id"]: r["label"] for r in connected_components(df).collect()
    }
    b = {
        r["doc_id"]: r["label"]
        for r in connected_components_star(df).collect()
    }
    assert a == b


@given(edges=_EDGES, split=st.integers(1, 9))
@settings(**_CC_SETTINGS)
def test_incremental_cc_equals_full_on_random_splits(spark, edges, split):
    """Property: splitting any edge list into old/new batches and absorbing
    the new batch incrementally yields exactly the from-scratch labels over
    the union — for every graph shape and split point."""
    from zeta_etl_spark.operators.dedup import (
        connected_components_star,
        incremental_connected_components,
    )

    old = [e for e in edges if (e[0] + e[1]) % 10 < split]
    new = [e for e in edges if (e[0] + e[1]) % 10 >= split]
    mk = lambda rows: (  # noqa: E731
        spark.createDataFrame(rows, "src bigint, dst bigint")
        if rows
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    old_labels = connected_components_star(mk(old))
    got = {
        r["doc_id"]: r["label"]
        for r in incremental_connected_components(
            old_labels, mk(new)
        ).collect()
    }
    want = {
        r["doc_id"]: r["label"]
        for r in connected_components_star(mk(edges)).collect()
    }
    assert got == want


_INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # user
        st.integers(min_value=0, max_value=300),   # start second
        st.integers(min_value=1, max_value=60),    # duration
    ),
    min_size=1,
    max_size=25,
)


@given(iv=_INTERVALS)
@settings(**_SETTINGS)
def test_interval_union_matches_naive_second_sets(spark, iv):
    """Sweep-line interval coalescing == brute-force union of the covered
    integer seconds, for arbitrary overlapping/nested/adjacent intervals.
    (The registry query derives intervals from events; the operator shape
    under test is the window sweep itself.)"""
    from pyspark.sql.window import Window as W

    rows = [
        (u, i, s, s + d) for i, (u, s, d) in enumerate(iv)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, start_s long, end_s long"
    )
    w = W.partitionBy("user_id").orderBy("start_s", "event_id")
    prior_max = F.max("end_s").over(w.rowsBetween(W.unboundedPreceding, -1))
    islands = (
        df.withColumn(
            "is_start",
            F.when(prior_max.isNull() | (F.col("start_s") > prior_max), 1)
            .otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("is_start").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "island")
        .agg(F.min("start_s").alias("a"), F.max("end_s").alias("b"))
        .groupBy("user_id")
        .agg(F.sum(F.col("b") - F.col("a")).alias("covered"))
    )
    got = {r["user_id"]: r["covered"] for r in islands.collect()}
    naive = {}
    for u, s, d in iv:
        naive.setdefault(u, set()).update(range(s, s + d))
    assert got == {u: len(secs) for u, secs in naive.items()}


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),    # group
            st.integers(min_value=0, max_value=15),   # item
            st.integers(min_value=0, max_value=100),  # score
        ),
        min_size=1,
        max_size=30,
    ),
    cut=st.integers(min_value=0, max_value=30),
)
@settings(**_SETTINGS)
def test_topk_merge_is_split_invariant(spark, rows, cut):
    """The incremental top-k merge rule (topk of max-score dedup of
    state ∪ batch) gives the SAME result for any split of the input into
    two batches as for one batch — the associativity that makes
    foreach_batch_topk correct under arbitrary microbatch boundaries."""
    from pyspark.sql.window import Window as W

    k = 3

    def topk(df):
        best = df.groupBy("g", "item").agg(F.max("score").alias("score"))
        w = W.partitionBy("g").orderBy(F.col("score").desc(), "item")
        return (
            best.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    schema = "g int, item int, score int"
    all_df = spark.createDataFrame(rows, schema)
    direct = topk(all_df)

    cut = min(cut, len(rows))
    b1 = spark.createDataFrame(rows[:cut], schema) if cut else None
    b2 = (
        spark.createDataFrame(rows[cut:], schema)
        if cut < len(rows)
        else None
    )
    state = None
    for b in (b1, b2):
        if b is None:
            continue
        merged = b if state is None else state.unionByName(b)
        state = topk(merged)
    assert state is not None
    assert direct.exceptAll(state).count() == 0
    assert state.exceptAll(direct).count() == 0


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=19),        # doc id
            st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    mod=st.integers(min_value=2, max_value=5),
)
@settings(**_SETTINGS)
def test_incremental_jaccard_equals_filtered_full(spark, docs, mod):
    """shingle_jaccard_pairs incremental mode == full mode restricted to
    batch-touching pairs, for arbitrary corpora (including docs shorter
    than the shingle size, empty docs, and batches that are empty or the
    whole corpus)."""
    from zeta_etl_spark.operators.dedup import shingle_jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in docs]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pred = f"doc_id % {mod} = 0"

    full = shingle_jaccard_pairs(df, min_jaccard=0.2).select(
        "doc_a", "doc_b", "n_common"
    )
    expected = full.filter(
        f"(doc_a % {mod} = 0) OR (doc_b % {mod} = 0)"
    )
    got = shingle_jaccard_pairs(df, min_jaccard=0.2, touching=pred).select(
        "doc_a", "doc_b", "n_common"
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


@given(
    vec=st.lists(
        st.integers(min_value=-1_000_000, max_value=1_000_000),
        min_size=8,
        max_size=8,
    ),
    n_planes=st.integers(min_value=1, max_value=10),
)
@settings(**_SETTINGS)
def test_lsh_bucket_fold_matches_reference(spark, vec, n_planes):
    """The folded one-expression lsh_bucket (2-D literal + nested HOFs)
    computes bit-identical bucket ids to a direct per-plane Python
    evaluation, for arbitrary vectors and plane counts — guards the
    codegen-size refactor against silent arithmetic drift."""
    from zeta_etl_spark.operators.vectors import hyperplane_params, lsh_bucket

    planes = hyperplane_params(n_planes, 8)
    expected = sum(
        (1 << b)
        for b, plane in enumerate(planes)
        if sum(x * w for x, w in zip(vec, plane)) > 0
    )
    df = spark.createDataFrame([(vec,)], "sv array<bigint>")
    got = df.select(lsh_bucket("sv", planes).alias("b")).first()["b"]
    assert got == expected


def test_ddsketch_brackets_exact_quantiles(spark, sf_dir):
    """DDSketch guarantee: for each (event_type, q) the returned bucket
    [lo_cents, hi_cents] must CONTAIN the exact q-quantile (ceil-rank
    definition, the same integer target the sketch uses), and the sketch
    must be mergeable — cell-wise SUM of per-split histograms equals the
    whole-corpus histogram."""
    import duckdb

    from zeta_etl_spark.queries import REGISTRY

    rows = REGISTRY["ddsketch_quantiles"].fn(spark, sf_dir).collect()
    assert rows, "sketch produced no estimates"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    exact = {
        (et, q): v
        for et, q, v in con.execute(
            """
            WITH cents AS (
              SELECT event_type,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
            ), ranked AS (
              SELECT event_type, c,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM cents
            )
            SELECT event_type, q, MIN(c)
            FROM ranked, (SELECT UNNEST([50, 90, 99]) AS q) qs
            WHERE rn >= (q * n + 99) // 100
            GROUP BY event_type, q
            """
        ).fetchall()
    }
    for r in rows:
        ex = exact[(r["event_type"], r["q"])]
        assert r["lo_cents"] <= ex <= r["hi_cents"], (
            r["event_type"], r["q"], ex, r["lo_cents"], r["hi_cents"],
        )

    # mergeability: per-split histograms SUM to the full histogram
    full = con.execute(
        """
        SELECT event_type, length(bin(CAST(floor(value*100+0.5) AS BIGINT))) AS b,
          COUNT(*) FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    merged = con.execute(
        """
        WITH part AS (
          SELECT event_type, event_id % 4 AS shard,
            length(bin(CAST(floor(value*100+0.5) AS BIGINT))) AS b
          FROM events
        ), per_shard AS (
          SELECT event_type, shard, b, COUNT(*) AS cnt FROM part GROUP BY 1,2,3
        )
        SELECT event_type, b, SUM(cnt) FROM per_shard GROUP BY 1,2 ORDER BY 1,2
        """
    ).fetchall()
    assert [(a, b, int(c)) for a, b, c in full] == [
        (a, b, int(c)) for a, b, c in merged
    ]


def test_markov_rows_sum_to_one_and_twap_bounds(spark, sf_dir):
    """Transition probabilities per from-state must sum to EXACTLY the
    count ratio total (p = n/n_out with one shared denominator → the sum
    is Σn/n_out = 1 up to one rounding per term); TWAP must lie within
    the user's [min, max] event value."""
    from zeta_etl_spark.queries import REGISTRY

    rows = REGISTRY["markov_transitions"].fn(spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for ft, grp in by_from.items():
        total = sum(r["p_trans"] for r in grp)
        assert abs(total - 1.0) < 1e-9, (ft, total)
        n_out = grp[0]["n_out"]
        assert all(r["n_out"] == n_out for r in grp)
        assert sum(r["n_trans"] for r in grp) == n_out

    from pyspark.sql import functions as F
    from zeta_etl_spark.queries.registry import T

    twap = {
        r["user_id"]: r
        for r in REGISTRY["twap_per_user"].fn(spark, sf_dir).collect()
    }
    bounds = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("min(cast(floor(value*100+0.5) as bigint))").alias("lo"),
            F.expr("max(cast(floor(value*100+0.5) as bigint))").alias("hi"),
        )
        .collect()
    }
    checked = 0
    for uid, r in twap.items():
        if r["twap_cents"] is None:
            continue
        lo, hi = bounds[uid]
        assert lo <= r["twap_cents"] <= hi, (uid, r["twap_cents"], lo, hi)
        checked += 1
    assert checked > 0


@given(
    vals=st.lists(st.integers(min_value=1, max_value=50_000),
                  min_size=1, max_size=60)
)
@settings(**_SETTINGS)
def test_cusum_closed_form_equals_recursion(spark, vals):
    """The window identity S_i = C_i − min(0, min_{j≤i} C_j) used by
    cusum_drift must equal the textbook recursion S_i = max(0, S_{i−1} +
    d_i) on arbitrary integer sequences (deviation vs the integer mean,
    exactly as the query computes it) — the 0 term is the empty prefix."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    mu = sum(vals) // len(vals)
    # reference recursion
    s, want = 0, []
    for v in vals:
        s = max(0, s + (v - mu))
        want.append(s)

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, cents long"
    ).withColumn("mu", F.lit(mu))
    w = Window.orderBy("i")
    got = [
        r["cusum"]
        for r in (
            df.withColumn("c", F.sum(F.col("cents") - F.col("mu")).over(w))
            .withColumn(
                "cusum", F.col("c") - F.least(F.lit(0), F.min("c").over(w))
            )
            .orderBy("i")
            .collect()
        )
    ]
    assert got == want


@given(
    vals=st.lists(st.integers(min_value=1, max_value=50_000),
                  min_size=1, max_size=30)
)
@settings(**_SETTINGS)
def test_dyadic_ewma_equals_naive_float_loop(spark, vals):
    """The bigint-shift EWMA (alpha = 1/2 over the last k, newest weight
    2^(k-1)) must equal the naive float computation exactly — dyadic
    weights make every partial sum exactly representable, so the double
    division result is bit-identical to the weighted mean computed in
    Python floats."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    K = 20
    last = vals[-K:][::-1]  # newest first
    num = sum(v * 2.0 ** (K - 1 - j) for j, v in enumerate(last))
    den = sum(2.0 ** (K - 1 - j) for j in range(len(last)))
    want = num / den

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, cents long"
    )
    w = Window.orderBy(F.col("i").desc())
    ranked = df.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= K
    )
    wgt = F.expr(f"shiftleft(cast(1 as bigint), {K} - cast(rn as int))")
    got = ranked.agg(
        (
            F.sum(F.col("cents") * wgt).cast("double")
            / F.sum(wgt).cast("double")
        ).alias("ewma")
    ).first()["ewma"]
    assert got == want  # exact equality, not approx
