"""Incremental view maintenance (IVM) for additive aggregate views.

The reference's gold tables are aggregate views over CDC-maintained silvers
that DLT recomputes per trigger (e.g. the hourly/user rollups in
zetadex-transactions-helius-pipeline.py); Databricks' incremental
refresh ("Enzyme") and Materialize/Feldera maintain such views from the
change feed instead — cost proportional to the CHANGE volume, not the view
input.  This module is that capability on the engine's own primitives:

    Pipeline.table_changes (CDF)  →  delta_from_changes (signed fold)
        →  Pipeline.merge_into (null-safe keyed upsert of group rows)

Supported aggregates are the self-maintainable additive ones: COUNT(*),
per-measure SUM and non-null COUNT (from which AVG derives).  MIN/MAX are
deliberately NOT supported — they are not self-maintainable under deletes
(a retracted maximum requires re-scanning the group), which is the same
line every IVM engine draws for its "fully incremental" tier.

Determinism: measures must be exact types (integral or DECIMAL).  Floating
measures are REJECTED — incremental float sums drift from recomputed ones
(addition is not associative in IEEE), so a maintained float view would
slowly diverge from its own definition.  Cast money doubles to
DECIMAL(32,6) upstream (functions/deterministic.py rules).

View schema, for group columns G and measures m1..mk:

    G..., _n BIGINT,                    -- COUNT(*) of live base rows
    <m>_sum <exact type>, <m>_n BIGINT  -- SUM(m), COUNT(m) per measure

``SUM`` of zero non-null inputs is NULL in SQL; the pair (sum, n) preserves
that: expose ``CASE WHEN <m>_n = 0 THEN NULL ELSE <m>_sum END``.  Groups
whose ``_n`` reaches 0 are DELETED by the merge (SQL GROUP BY emits no row
for an empty group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, IntegralType

from zeta_etl_spark.plans.graph import Pipeline

_ADD = ("insert", "update_postimage")
_RETRACT = ("delete", "update_preimage")


def _check_exact(df: DataFrame, measures: Sequence[str]) -> None:
    for m in measures:
        dt = df.schema[m].dataType
        if not isinstance(dt, (IntegralType, DecimalType)):
            raise TypeError(
                f"ivm: measure {m!r} has type {dt.simpleString()} — only "
                "exact types (integral, DECIMAL) are self-maintainable "
                "without drift; cast float measures to DECIMAL upstream"
            )


def full_agg(
    base: DataFrame, group_cols: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """The view DEFINITION: a plain GROUP BY over a base snapshot.  Used to
    seed the view and as the recompute oracle in tests."""
    _check_exact(base, measures)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for m in measures:
        aggs.append(F.sum(m).alias(f"{m}_sum"))
        aggs.append(F.count(m).alias(f"{m}_n"))
    return base.groupBy(*group_cols).agg(*aggs)


def delta_from_changes(
    cdf: DataFrame, group_cols: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Fold a change feed into per-group signed deltas.

    Each CDF row carries weight +1 (insert / update_postimage) or -1
    (delete / update_preimage); an update whose group did not change folds
    to sum-of-value-diffs within the group, and an update that MOVED a row
    across groups folds to -1 in the old group and +1 in the new — no
    special casing.  One shuffle, map-side combinable.
    """
    _check_exact(cdf, measures)
    w = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_RETRACT), F.lit(-1))
        .otherwise(F.lit(None))
    )
    signed = cdf.withColumn("_w", w)
    bad = signed.where(F.col("_w").isNull())
    if not bad.isEmpty():
        types = [r[0] for r in bad.select("_change_type").distinct().collect()]
        raise ValueError(f"ivm: unknown _change_type values {types}")
    aggs = [F.sum("_w").cast("bigint").alias("_n_delta")]
    for m in measures:
        aggs.append(F.sum(F.col(m) * F.col("_w")).alias(f"{m}_sum_delta"))
        # coalesce: an all-NULL-measure group folds to SUM-over-nothing =
        # NULL, which would poison the view's counter arithmetic
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col(m).isNotNull(), F.col("_w"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"{m}_n_delta")
        )
    return signed.groupBy(*group_cols).agg(*aggs)


def expose_view(
    view: DataFrame, group_cols: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """SQL-semantics read surface over the maintained state: COUNT(*),
    SUM (NULL when the group has zero non-null inputs) and derived AVG per
    measure.  AVG is exact-sum / non-null-count in DOUBLE (one correctly-
    rounded division — the repo's cross-engine determinism rule), NOT
    Spark's ``AVG(DECIMAL)`` decimal-scale rounding."""
    cols = [*group_cols, F.col("_n").alias("cnt")]
    for m in measures:
        s = F.when(F.col(f"{m}_n") > 0, F.col(f"{m}_sum"))
        cols.append(s.alias(f"{m}_sum"))
        cols.append(
            F.when(
                F.col(f"{m}_n") > 0,
                F.col(f"{m}_sum").cast("double")
                / F.col(f"{m}_n").cast("double"),
            ).alias(f"{m}_avg")
        )
    return view.select(*cols)


def maintain_agg_view(
    spark: SparkSession,
    pipeline: Pipeline,
    view_name: str,
    cdf: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
) -> dict:
    """Apply one change-feed batch to a materialized aggregate view.

    The view table must exist (seed it by materializing :func:`full_agg`
    over the initial base snapshot).  The delta is MERGEd on the group
    columns with null-safe keys (NULL is a real group), with the clause
    matrix encoding the IVM algebra:

    - matched and the group count reaches zero → DELETE the group row;
    - matched otherwise → counters += deltas (SUM of two NULLs stays NULL
      via the (sum, n) pair — coalesce is safe because <m>_n = 0 forces
      exposure back to NULL);
    - unmatched delta group → INSERT (a brand-new group).

    Cost ∝ |changed groups| (+ the merge's touched-partition rewrite), not
    view size — partition the view by a leading group column to get
    hard-linked untouched partitions.

    Correctness contract (tested): for any base v1 → v2,
    ``maintain_agg_view(view(v1), table_changes(v1, v2)) == full_agg(v2)``.
    """
    group_cols = list(group_cols)
    delta = delta_from_changes(cdf, group_cols, measures)
    upd: dict[str, str] = {"_n": "t._n + s._n_delta"}
    ins: dict[str, str] = {
        **{g: f"s.{g}" for g in group_cols},
        "_n": "s._n_delta",
    }
    for m in measures:
        # sum: NULL + x must act as 0 + x while n tracks real nullity
        upd[f"{m}_sum"] = (
            f"CASE WHEN t.{m}_n + s.{m}_n_delta = 0 THEN NULL "
            f"ELSE coalesce(t.{m}_sum, 0) + coalesce(s.{m}_sum_delta, 0) END"
        )
        upd[f"{m}_n"] = f"t.{m}_n + s.{m}_n_delta"
        ins[f"{m}_sum"] = f"s.{m}_sum_delta"
        ins[f"{m}_n"] = f"coalesce(s.{m}_n_delta, 0)"
    return pipeline.merge_into(
        spark,
        view_name,
        delta,
        on=group_cols,
        null_safe_on=True,
        when_matched_delete=True,
        delete_condition="t._n + s._n_delta = 0",
        when_matched_update=upd,
        when_not_matched_insert=ins,
        # a freshly inserted group with zero net rows (e.g. a CDF slice
        # that inserts and deletes the same new-group row) must not appear
        insert_condition="s._n_delta > 0",
    )
