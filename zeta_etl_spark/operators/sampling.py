"""Deterministic sampling/splitting operators for training-data pipelines.

``hash_split`` assigns each row to a named split (train/val/test) from an
md5 bucket of its key — stable across runs, engines, partitionings and
cluster sizes, unlike ``df.randomSplit`` (which is partition-dependent).
The same construction does deterministic down-sampling (``hash_sample``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zeta_etl_spark.functions.text import spark_hex2long

_BUCKETS = 10_000


def _bucket(key_col: str) -> Column:
    # 32-bit md5 prefix mod buckets — uniform and engine-portable
    return F.expr(
        f"{spark_hex2long(f'cast({key_col} as string)', digits=8)} % {_BUCKETS}"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, float]],
    split_col: str = "split",
) -> DataFrame:
    """Assign rows to named splits with the given fractions (must sum ≤ 1;
    remainder → last split)."""
    total = sum(f for _, f in splits)
    # explicit raise, not assert: input validation must survive python -O
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = _bucket(key_col)
    expr: Column | None = None
    lo = 0.0
    for name, frac in splits[:-1]:
        hi = lo + frac
        cond = bucket < int(hi * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` down-sample keyed on ``key_col``."""
    return df.filter(_bucket(key_col) < int(fraction * _BUCKETS))
