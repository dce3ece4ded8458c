"""CDC / latest-wins dedup operators.

Reference parity: ``dlt.apply_changes(target, source, keys, sequence_by)``
(zetaflex-pipeline.py:146-151 and 4 more call sites;
zetadex-referrals-pipeline.py:147-152) collapses a stream of entity snapshots
to the latest row per key.  Batch form here is a window rank; the streaming
form is streaming/runner.py:foreach_batch_upsert (foreachBatch + versioned
idempotent merge).

Scale design: one shuffle on the key columns; with AQE skew-join handling a
hot key splits automatically.  For 100 TB backfills prefer the
``max_by``-aggregate variant (``latest_by_keys_agg``) which map-side-combines
instead of materializing the full sorted partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_keys(
    df: DataFrame,
    keys: Sequence[str],
    sequence_by: Sequence[str],
) -> DataFrame:
    """Latest row per key: ``row_number() over (partition by keys order by
    sequence_by desc) = 1``.  ``sequence_by`` should end with a unique
    tie-break so the result is deterministic."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in sequence_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_by_keys_agg(
    df: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Aggregate variant: ``max_by(value, sequence_by)`` per key.  Supports
    partial aggregation (no full sort) — preferred at scale when the full row
    isn't needed.  Ties on ``sequence_by`` are broken arbitrarily, so the
    sequence column must be unique per key for determinism."""
    aggs = [F.max(sequence_by).alias(sequence_by)] + [
        F.max_by(c, sequence_by).alias(c) for c in value_cols
    ]
    return df.groupBy(*keys).agg(*aggs)
