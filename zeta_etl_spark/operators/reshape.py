"""Serving-side reshaping operators: rollup with grand-total rows, unpivot
(melt), camelCase renames and unix-timestamp conversion.

Reference parity (SURVEY.md §2.4 A10-A12, §2.7 U4, §3.3):
- rollup + ALL_ASSETS total row: dfs-serving/zetadex-serving.py:483-490
- loop-union unpivot of metric×period frames: zetadex-serving-v2.py:510-554
  (re-expressed as the native ``unpivot`` — one pass, no N-way union)
- camelCase rename: zetadex-serving-v2.py:18-22,557-558
- timestamp→unix conversion for the KV sink: zetadex-serving.py:212-221
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_with_total(
    df: DataFrame,
    group_col: str,
    aggs: Sequence,
    total_label: str = "ALL",
) -> DataFrame:
    """Per-group rows plus one grand-total row labeled ``total_label``."""
    return (
        df.rollup(group_col)
        .agg(*aggs)
        .withColumn(group_col, F.coalesce(F.col(group_col), F.lit(total_label)))
    )


def unpivot_metrics(
    df: DataFrame,
    ids: Sequence[str],
    metrics: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long melt.  Replaces the reference's 11-frame loop-union
    (zetadex-serving-v2.py:510-554) with Spark's native ``unpivot`` — a single
    generate, no repeated scans."""
    return df.unpivot(
        [F.col(c) for c in ids],
        [F.col(m) for m in metrics],
        var_name,
        value_name,
    )


_CAMEL_RE = re.compile(r"_([a-z0-9])")


def to_camel_case(name: str) -> str:
    return _CAMEL_RE.sub(lambda m: m.group(1).upper(), name)


def camel_case_columns(df: DataFrame) -> DataFrame:
    return df.select(*[F.col(c).alias(to_camel_case(c)) for c in df.columns])


def timestamps_to_unix(df: DataFrame) -> DataFrame:
    """Serving sinks want epoch seconds (zetadex-serving.py:212-221)."""
    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() in ("timestamp", "timestamp_ntz"):
            out = out.withColumn(
                f.name, F.col(f.name).cast("timestamp").cast("long")
            )
    return out


def morton_code_sql_n(cols: list[str], bits: int | None = None) -> str:
    """Spark SQL expression interleaving the low ``bits`` of N non-negative
    integer columns into a Z-order (Morton) code: bit ``i`` of column ``j``
    lands at position ``i*N + j``.  ``bits`` defaults to the largest
    per-column width that keeps the code inside a signed 64-bit long
    (16 for 2 cols, 20→capped 16 for 3, 15 for 4).  Pure bit arithmetic —
    whole-stage codegen in Spark, identical semantics in DuckDB."""
    n = len(cols)
    if n < 2:
        raise ValueError("morton_code_sql_n needs at least two columns")
    if bits is None:
        bits = min(16, 62 // n)
    if bits * n > 62:
        raise ValueError(
            f"{bits} bits x {n} cols = {bits * n} interleaved bits; "
            "must fit a signed 64-bit long (<= 62)"
        )
    terms = [
        f"(((({col}) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, col in enumerate(cols)
    ]
    return "cast(" + " + ".join(terms) + " as bigint)"


def morton_code_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """Two-column Z-order (Morton) code — a REAL space-filling
    curve for the reference's ``pipelines.autoOptimize.zOrderCols`` table
    property (zetadex-transactions-helius-pipeline.py:285), not just the
    lexicographic ``sortWithinPartitions`` stand-in: sorting by the
    interleaved code clusters rows that are close in EITHER dimension, so
    parquet row-group min/max pruning stays effective for filters on both
    columns.  Delegates to :func:`morton_code_sql_n`."""
    return morton_code_sql_n([col_a, col_b], bits)


def duck_morton_code_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_code_sql` — DELEGATES to it (the bit
    arithmetic and lowercase ``cast`` parse identically in both engines),
    keeping one copy per the twin-builder rule (ROUND_NOTES lesson 5)."""
    return morton_code_sql(col_a, col_b, bits)
