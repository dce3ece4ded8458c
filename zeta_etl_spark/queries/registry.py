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

    ``decimal_faithful`` records the comparison mode the query EARNS:
    True (default) = every output column is cross-engine bit-exact (ints,
    strings, dec_sum-style decimal-routed doubles, identical-IEEE
    expression trees), so full value-hash comparison applies at any scale.
    False = the output carries raw float arithmetic whose partitioning-
    order sums can differ between engines, so large-scale sweeps use the
    order-independent quantized_1e6 checksum instead.  The flag makes the
    checksum fallback auditable per query (r9/r10 verdict ask) — the sweep
    harness consults it instead of inferring from the result schema."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    decimal_faithful: bool = True


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    decimal_faithful: bool = True,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            fn=fn,
            oracle=oracle,
            tags=tags,
            decimal_faithful=decimal_faithful,
        )
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by query definitions."""
    return load_table(spark, sf_dir, name)
