"""Query registry: every implemented operator from SURVEY.md §2 is declared
here as a named query over the driver's synthetic tables, together with the
ANSI-SQL oracle the DuckDB side runs for the correctness gate.

Import this package to populate ``REGISTRY``.
"""

from __future__ import annotations

from zeta_etl_spark.queries.registry import REGISTRY, QuerySpec, query

# imported for registration side effects
from zeta_etl_spark.queries import (  # noqa: E402,F401
    analytics2_q,
    analytics3_q,
    analytics4_q,
    analytics_q,
    audit_q,
    cep_q,
    curation2_q,
    curation3_q,
    curation4_q,
    curation5_q,
    curation_q,
    dedup_q,
    frontier2_q,
    frontier3_q,
    frontier4_q,
    frontier5_q,
    frontier6_q,
    frontier7_q,
    frontier8_q,
    frontier9_q,
    frontier10_q,
    frontier11_q,
    frontier12_q,
    frontier13_q,
    frontier14_q,
    frontier15_q,
    frontier16_q,
    frontier17_q,
    frontier_q,
    graph_q,
    indicators_q,
    pnl_q,
    product_q,
    relational,
    relational2_q,
    relational3_q,
    relational4_q,
    relational5_q,
    scalar_q,
    serving_q,
    temporal_q,
    text2_q,
    transactions_q,
    text_q,
    vectors2_q,
    vectors_q,
    warehouse_q,
    windows2_q,
    windows_q,
)

__all__ = ["REGISTRY", "QuerySpec", "query"]
