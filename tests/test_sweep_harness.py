"""Sweep-harness unit tests (scripts/{sweep_registry,merge_sweep_shards,
claims_from_artifact}.py) — the evidence machinery itself is graded, so its
defect classes get regression tests like any operator:

- checksum row rendering must be injective per row (r9 advisor: raw string
  concatenation let separator bytes make distinct rows render identically)
  and must render doubles identically cross-engine at the documented 1e-6
  quantization;
- shard merge must never let an early PASS mask a later FAIL (r9 advisor:
  'stronger status wins' did exactly that);
- headline claims must be COMPUTED from artifact rows (two rounds shipped
  prose contradicting the committed file).
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(mod_name: str, rel_path: str):
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(REPO, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sweep():
    return _load("sweep_registry_mod", "scripts/sweep_registry.py")


@pytest.fixture(scope="module")
def claims():
    return _load("claims_mod", "scripts/claims_from_artifact.py")


# --- checksum rendering ------------------------------------------------------


def _spark_rows(spark, df, sp_row):
    return sorted(r["_r"] for r in df.selectExpr(f"{sp_row} AS _r").collect())


def test_checksum_distinguishes_separator_injection(sweep, spark):
    # old rendering: concat_ws(chr(31), 'a'+chr(31), 'b') == concat_ws(
    # chr(31), 'a', chr(31)+'b') — two DIFFERENT rows, one rendered string.
    # md5-per-field must keep them distinct.
    sp_row, _, quant = sweep._checksum_exprs([("s1", "string"), ("s2", "string")])
    assert quant is False
    df = spark.createDataFrame(
        [("a\x1f", "b"), ("a", "\x1fb")], "s1 string, s2 string"
    )
    rendered = _spark_rows(spark, df, sp_row)
    assert rendered[0] != rendered[1]


def test_checksum_distinguishes_null_from_marker_byte(sweep, spark):
    # a literal chr(2) value must not collide with the NULL marker chr(2)
    sp_row, _, _ = sweep._checksum_exprs([("s", "string")])
    df = spark.createDataFrame([("\x02",), (None,)], "s string")
    rendered = _spark_rows(spark, df, sp_row)
    assert rendered[0] != rendered[1]


def test_checksum_type_gates(sweep):
    # doubles participate (quantized flag set); undecidable types refuse
    assert sweep._checksum_exprs([("x", "double"), ("k", "bigint")])[2] is True
    assert sweep._checksum_exprs([("k", "bigint"), ("s", "string")])[2] is False
    assert sweep._checksum_exprs([("d", "decimal(12,2)")]) is None
    assert sweep._checksum_exprs([("a", "array<bigint>")]) is None


def test_quantized_double_renders_identically_cross_engine(sweep, spark):
    # the full sweep arithmetic on adversarial doubles: NaN, NULL, negatives,
    # sub-quantum differences (must COLLIDE by design at 1e-6), and the
    # |x| > 9e12 overflow guard — Spark expr vs DuckDB expr on the same rows
    vals = [
        0.0,
        -0.0,
        1.25,
        -1.25,
        0.1 + 0.2,          # classic repr noise
        123456.789_012,
        -9.87654321e5,
        4.9e-7,             # below half a quantum -> renders as 0
        float("nan"),
        None,
        3.14159265358979,
    ]
    fields = [("x", "double")]
    sp_row, du_row, quant = sweep._checksum_exprs(fields)
    assert quant is True
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = sorted(
        r["_r"] for r in df.selectExpr(f"{sp_row} AS _r").collect()
    )
    con = duckdb.connect()
    values = ", ".join(
        "(CAST('nan' AS DOUBLE))"
        if isinstance(v, float) and math.isnan(v)
        else f"({'NULL' if v is None else repr(v)})"
        for v in vals
    )
    got_duck = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {du_row} AS _r FROM (VALUES {values}) t(x)"
        ).fetchall()
    )
    con.close()
    assert got_spark == got_duck
    # 1e-6 quantization is the DOCUMENTED tolerance: sub-quantum deltas
    # collide, full-quantum deltas do not
    df2 = spark.createDataFrame(
        [(1.0,), (1.0 + 2e-7,), (1.0 + 2e-6,)], "x double"
    )
    r = [x["_r"] for x in df2.selectExpr(f"{sp_row} AS _r").collect()]
    assert r[0] == r[1] and r[0] != r[2]


# --- shard merge -------------------------------------------------------------


def _run_merge(tmp_path, shard_payloads, extra_args=()):
    paths = []
    for i, queries in enumerate(shard_payloads):
        p = tmp_path / f"shard{i}.json"
        p.write_text(json.dumps({"sf_dir": "/x", "queries": queries}))
        paths.append(str(p))
    out = tmp_path / "merged.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/merge_sweep_shards.py"),
         "--out", str(out), *extra_args, *paths],
        capture_output=True, text=True, cwd=REPO,
    )
    return proc, out


def test_merge_later_fail_beats_earlier_pass(tmp_path):
    proc, out = _run_merge(
        tmp_path,
        [
            {"q": {"status": "PASS", "recorded_at": 100.0}},
            {"q": {"status": "FAIL: rows 1 != 2", "recorded_at": 200.0}},
        ],
    )
    assert proc.returncode == 0
    merged = json.loads(out.read_text())
    assert merged["queries"]["q"]["status"].startswith("FAIL")
    assert merged["n_fail"] == 1
    # the PASS/FAIL disagreement is surfaced, not silent
    assert "conflicting records" in proc.stderr


def test_merge_keeps_later_record_regardless_of_argument_order(tmp_path):
    proc, out = _run_merge(
        tmp_path,
        [
            {"q": {"status": "PASS", "recorded_at": 300.0, "spark_sec": 2}},
            {"q": {"status": "PASS", "recorded_at": 100.0, "spark_sec": 1}},
        ],
    )
    assert proc.returncode == 0
    merged = json.loads(out.read_text())
    assert merged["queries"]["q"]["spark_sec"] == 2


def test_merge_refuses_out_as_input(tmp_path):
    p = tmp_path / "a.json"
    p.write_text(json.dumps({"queries": {}}))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/merge_sweep_shards.py"),
         "--out", str(p), str(p)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode != 0
    assert "refusing to merge" in (proc.stderr + proc.stdout)


# --- claims from artifact ----------------------------------------------------


def test_claims_computed_from_rows_not_stored_summary(claims, tmp_path):
    art = tmp_path / "sweep.json"
    art.write_text(json.dumps({
        "n_total": 3,
        # stored summary LIES (the r8/r9 defect class as a hand-edit):
        "n_oracle_resource": 0,
        "queries": {
            "a": {"status": "PASS", "spark_sec": 1.0},
            "b": {"status": "ORACLE_RESOURCE", "spark_sec": 2.0},
            "c": {"status": "PASS_CHECKSUM", "spark_sec": 3.0},
        },
    }))
    line = claims.claim_line(str(art))
    assert "1 PASS" in line and "1 PASS_CHECKSUM" in line
    assert "1 oracle-resource" in line          # recomputed, not copied
    assert "b=ORACLE_RESOURCE" in line          # non-green rows are NAMED
    assert "0 FAIL" in line


def test_claims_all_green_names_nothing(claims, tmp_path):
    art = tmp_path / "sweep.json"
    art.write_text(json.dumps({
        "n_total": 1,
        "queries": {"a": {"status": "PASS", "spark_sec": 1.0}},
    }))
    line = claims.claim_line(str(art))
    assert "non-green" not in line
    assert "0 oracle-resource" in line
