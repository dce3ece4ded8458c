"""Oracle-compare harness: run a registry query in Spark and its ANSI-SQL
oracle in DuckDB over the same parquet tables, canonicalize, and diff.

Mirrors the driver's correctness gate (row count + schema + order-insensitive
value hash) but with a tolerant float diff so test failures are debuggable.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from zeta_etl_spark.datasets import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # driver testdata is one file per table; Spark-written replicas
        # (scripts/make_scaled_replica.py) are part-file DIRECTORIES —
        # glob those so the oracle reads the same rows
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for c in out.columns:
        dt = out[c].dtype
        if pd.api.types.is_datetime64_any_dtype(dt):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(dt):
            out[c] = out[c].round(6)
        elif dt == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    a = canonicalize(spark_pdf)
    b = canonicalize(duck_pdf)
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: columns {sorted(a.columns)} != {sorted(b.columns)}"
    )
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes value RENDERINGS, so spark BIGINT 53286 vs duck
        # DOUBLE 53286.0 is a red row even when every value is equal (DuckDB
        # promotes `//` with a HUGEINT SUM operand to DOUBLE).  Fail loudly on
        # integral-vs-float dtype drift instead of silently coercing.  Nulls
        # promote both engines' integer columns to float64 identically, so a
        # one-sided float dtype means a genuine oracle/query type difference.
        a_int = pd.api.types.is_integer_dtype(av.dtype)
        b_int = pd.api.types.is_integer_dtype(bv.dtype)
        a_flt = pd.api.types.is_float_dtype(av.dtype)
        b_flt = pd.api.types.is_float_dtype(bv.dtype)
        if (a_int and b_flt) or (a_flt and b_int):
            raise AssertionError(
                f"{name}: column {c} dtype drift spark={av.dtype} "
                f"duck={bv.dtype} — driver hashes renderings; CAST the "
                f"oracle (or Spark) side so both are integral or both float"
            )
        if pd.api.types.is_float_dtype(av.dtype) or pd.api.types.is_float_dtype(
            bv.dtype
        ):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                idx = np.where(~close)[0][:5]
                raise AssertionError(
                    f"{name}: column {c} mismatch at rows {idx.tolist()}: "
                    f"spark={av.iloc[idx].tolist()} duck={bv.iloc[idx].tolist()}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                idx = np.where(~eq.values)[0][:5]
                raise AssertionError(
                    f"{name}: column {c} mismatch at rows {idx.tolist()}: "
                    f"spark={av.iloc[idx].tolist()} duck={bv.iloc[idx].tolist()}"
                )


def run_compare(spark, sf_dir: str, name: str):
    from zeta_etl_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        ddf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    assert_frames_match(sdf, ddf, name)
    return len(sdf)
