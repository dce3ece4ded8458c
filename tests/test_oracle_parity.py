"""Golden tests: every registry query with an oracle must match DuckDB on the
sf0.001 tables (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from zeta_etl_spark.queries import REGISTRY
from zeta_etl_spark.testing import run_compare

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    n_rows = run_compare(spark, sf_dir, name)
    assert n_rows >= 0


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
