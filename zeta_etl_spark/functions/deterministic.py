"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point ``SUM`` is order-dependent, and Spark and the DuckDB oracle
will generally sum partitions in different orders.  The reference sidesteps
this by never being tested (SURVEY.md §5); this engine instead aggregates
money-like doubles through exact DECIMAL arithmetic and casts the final result
back to DOUBLE.  DECIMAL sums are associative/commutative, so both engines
produce bit-identical results regardless of partitioning — which is what makes
the driver's value-hash correctness gate meaningful at any scale factor.

Scale note: decimal aggregation stays inside Spark's whole-stage codegen (no
UDFs) and supports partial (map-side) aggregation, so the only cost vs a double
sum is a slightly wider accumulator.

SAFETY RULE — decimal casts are cross-engine-stable only for "decimal-faithful"
doubles: values whose true decimal form terminates well above the cast scale
(raw money columns, products of short-decimal factors).  A double that lands
within double-rounding error of a halfway point at the cast scale rounds
differently (Spark HALF_UPs the shortest string repr; DuckDB scales the binary
value), so NEVER decimal-cast arbitrary products such as ``x * (k/86400)`` —
factor the constant denominator out of the sum and multiply DECIMAL×BIGINT
exactly instead (see queries/windows2_q.py weighted_window_sum).  For float
columns use the ``floor(x*1e6+0.5)`` integer scaling in operators/vectors.py —
floor has no rounding-mode ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 integer digits / 6 fractional: sums of 1e5-magnitude money columns stay
# exact far beyond 100 TB row counts (1e19 rows of 1e5 before overflow).
_DEC = "DECIMAL(32,6)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Exact SUM of a double expression via DECIMAL(32,6); returns DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_sum_expr(sql_expr: str) -> str:
    """SQL-string form of :func:`dec_sum` usable in both Spark SQL and DuckDB."""
    return f"CAST(SUM(CAST(({sql_expr}) AS {_DEC})) AS DOUBLE)"


def dec_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def round6(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(c, 6)
    return out.alias(alias) if alias else out


def safe_div(num: Column, den: Column) -> Column:
    """NULL on zero denominator (ANSI-mode safe in Spark 4, same in DuckDB)."""
    return num / F.nullif(den, F.lit(0))
