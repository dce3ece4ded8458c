"""Injectable engine clock (SURVEY.md §5 determinism rule).

The reference filters serving snapshots with ``current_timestamp``
(dfs-serving/zetadex-serving.py:348-351, zetadex-transactions-helius-
pipeline.py:1581,1903), which makes results untestable.  Engine rule: every
wall-clock read goes through :func:`as_of`, which resolves, in order:
1. an explicit argument,
2. the ``ZETA_ETL_AS_OF`` environment variable (ISO timestamp),
3. the data itself (caller-supplied fallback column max), and only then
4. the real clock.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENV_VAR = "ZETA_ETL_AS_OF"


def as_of(explicit: str | datetime | None = None) -> Column | None:
    """Resolve the engine clock to a literal timestamp column, or None if the
    caller should fall back to data-derived time."""
    value = explicit or os.environ.get(ENV_VAR)
    if value is None:
        return None
    if isinstance(value, datetime):
        value = value.strftime("%Y-%m-%d %H:%M:%S")
    return F.lit(value).cast("timestamp_ntz")


def data_as_of(df: DataFrame, ts_col: str) -> Column:
    """Data-derived clock: the max event time (deterministic for fixed input).
    Used when no explicit/env clock is set.

    The collected datetime goes back to Spark as a STRING literal cast to
    timestamp_ntz: passing a naive Python datetime through ``F.lit`` converts
    it via the driver's LOCAL zone while the session interprets it in the
    session zone — under a non-UTC driver (TZ env) the clock silently shifts
    hours and snapshot filters match nothing.  String → ntz is zone-free.
    """
    value = df.agg(F.max(ts_col)).first()[0]
    if value is None:
        # Empty (or all-null) source: degrade to a null clock so downstream
        # snapshot filters match nothing and the node materializes 0 rows —
        # consistent with the engine's empty-node materialization support
        # (plans/graph.py) instead of an AttributeError mid-run.
        return F.lit(None).cast("timestamp_ntz")
    return F.lit(value.isoformat(sep=" ")).cast("timestamp_ntz")


def latest_complete_hour(clock: Column) -> Column:
    """The O3 snapshot filter value: date_trunc('hour', now - 1 hour)."""
    return F.date_trunc("hour", clock - F.expr("interval 1 hour"))
