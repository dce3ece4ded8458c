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

    ``decimal_faithful`` is an AUDIT DECLARATION of the comparison mode
    the query earns: True (default) = every output column is
    cross-engine bit-exact (ints, strings, dec_sum-style decimal-routed
    doubles, identical-IEEE expression trees); False = the output
    carries raw float arithmetic whose partitioning-order sums can
    differ between engines, so large-result sweeps legitimately compare
    it under the quantized_1e6 tolerance.  The sweep harness still
    derives the actual rendering from the result schema (doubles can
    only be compared quantized cross-engine regardless of faithfulness —
    engine double→string formats differ); the flag's job is the audit:
    it is recorded on every sweep row, and a query that falls back to
    quantized WITHOUT declaring False is flagged
    ``checksum_mode_undeclared`` in the artifact."""

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
