"""Bounded-state and scale-gate hardening for the graph/postings operators
(OPTIMIZATION r14, VERDICT r13 #4/#5).

- ``capped_postings`` must enforce the df cap BEFORE any array exists: a
  synthetic hot key (100k rows — the stop-shingle shape) is dropped without
  its posting array ever materializing inside an aggregation entry.
- The kcore/pagerank broadcast hints are gated on the vertex count; forcing
  the gate to 0 exercises the shuffle fallback, which must be
  row-identical to the broadcast path.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from zeta_etl_spark.operators.graph import capped_postings

HOT_N = 100_000
CAP = 50


def test_capped_postings_drops_hot_key_without_materializing(spark):
    # one hot key with 100k rows, two sub-cap keys
    hot = spark.range(HOT_N).select(
        F.lit("hot").alias("s"), F.col("id").alias("doc_id")
    )
    cold = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], ["s", "doc_id"]
    ).select("s", F.col("doc_id").cast("long").alias("doc_id"))
    out = capped_postings(hot.unionByName(cold), "s", "doc_id", CAP)
    rows = {r["s"]: r["ids"] for r in out.collect()}
    assert set(rows) == {"a", "b"}  # hot key dropped entirely
    assert rows["a"] == [1, 2, 3]  # sorted ascending
    assert rows["b"] == [9]
    assert max(len(v) for v in rows.values()) <= CAP

    # structural guarantee: the cap filter (Window count) sits BELOW the
    # collect aggregate in the physical plan — the aggregate only ever sees
    # pre-filtered rows, so no agg entry can exceed `cap` elements
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "collect_list" in plan
    agg_idx = plan.index("ObjectHashAggregate") if "ObjectHashAggregate" in plan else plan.index("SortAggregate")
    win_idx = plan.index("Window")
    assert agg_idx < win_idx, "cap filter must run before the collect"


def test_kcore_broadcast_gate_fallback_matches(spark, sf_dir, monkeypatch):
    from zeta_etl_spark.queries.frontier7_q import kcore_peeling

    base = sorted(map(tuple, kcore_peeling(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_KCORE_BCAST_MAX", "0")
    low = sorted(map(tuple, kcore_peeling(spark, sf_dir).collect()))
    assert base == low


def test_pagerank_broadcast_gate_fallback_matches(spark, sf_dir, monkeypatch):
    from zeta_etl_spark.queries.graph_q import pagerank_sim_graph

    base = sorted(map(tuple, pagerank_sim_graph(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_PR_BCAST_MAX", "0")
    low = sorted(map(tuple, pagerank_sim_graph(spark, sf_dir).collect()))
    assert base == low
