from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from zeta_etl_spark.datasets import load_table


@dataclass
class QuerySpec:
    """A named engine query plus its DuckDB oracle.

    ``oracle`` is ANSI SQL over the pre-registered testdata views; ``None``
    marks a genuinely non-SQL-expressible operator (driver falls back to a
    rows-only check).  Column names/types must match the Spark result —
    the driver sorts columns by name before value-hashing.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by query definitions."""
    return load_table(spark, sf_dir, name)
