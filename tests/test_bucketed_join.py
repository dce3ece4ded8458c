"""Sort-merge-bucket infrastructure: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated big-big equi-join is the shuffle
of both sides.  Spark's bucketed tables (`bucketBy(n, key).sortBy(key)` +
`saveAsTable`) persist a hash-partitioned, sorted layout so the join reads
both sides already co-located: the physical plan has NO Exchange on the
bucketed sides.  This is the engine's prescribed layout for fact-fact
joins that recur (SCALE.md); these tests pin the property so a Spark
upgrade or config drift cannot silently reintroduce the shuffle.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
    for name, df in (("bkt_a", a), ("bkt_b", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # disable auto-broadcast: at test scale the planner would broadcast
    # (and skip bucketing); at the 100 TB fact-fact scale this layout
    # targets, neither side is broadcastable
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed-table join must read both sides co-located "
            "(no shuffle):\n" + plan
        )
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    # groupBy on the bucket key reuses the bucketing as the partitioning
    agg = spark.table(ta).groupBy("k").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 10_000


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join without bucketing plans >= 1 Exchange —
    proving the bucketed plans above are the layout's doing."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
        plan = (
            a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
