"""Full-registry correctness sweep at an arbitrary scale dir.

Usage:
    python scripts/sweep_registry.py --sf-dir /root/repo/.scale/sf10 \
        --out SCALE_SWEEP_SF10.json [--oracle-timeout 600]

Runs every registry query in Spark AND its DuckDB oracle over the same
parquet, comparing rows + schema + values (zeta_etl_spark.testing).  Per
query it records wall times and a status:

- ``PASS``            — hash-green against the oracle
- ``ORACLE_TIMEOUT``  — DuckDB could not finish inside --oracle-timeout
  (interrupted via a watchdog thread); the Spark result is recorded
  rows-only.  This is the honest marker for "DuckDB is the bottleneck at
  this scale", not a pass.
- ``FAIL: ...``       — a real mismatch or error.

The output file is rewritten after EVERY query, so a killed sweep keeps its
progress; rerunning with the same --out resumes, skipping recorded names.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zeta_etl_spark.queries import REGISTRY  # noqa: E402
from zeta_etl_spark.session import get_spark  # noqa: E402
from zeta_etl_spark.testing import (  # noqa: E402
    assert_frames_match,
    duck_connection,
)


# Order-independent full-value checksum for results too large to hash
# driver-side (r9): both engines render each row as a canonical string
# (sorted column order, exact integer/string/timestamp rendering), hash it
# to a 60-bit md5 prefix (the repo's standard cross-engine hash device),
# and SUM the hashes exactly (DECIMAL(38,0) vs HUGEINT) — two scalars
# compare instead of 10M collected rows.
#
# Rendering rules (r10):
# - strings are md5-hashed PER FIELD before concatenation (fixed-length
#   lowercase hex on both engines) — raw strings containing the 0x1f
#   separator or the 0x02 null marker could otherwise make distinct rows
#   render identically (separator injection / marker collision);
# - doubles/floats render QUANTIZED: floor(x * 1e6 + 0.5) as an exact
#   integer (round-half-up at 1e-6 — values differing by < 5e-7 compare
#   equal by design; this is the documented tolerance, matching the repo's
#   floor(x*1e6+0.5) scaling discipline).  NaN renders 'Fnan' on both
#   engines; infinities and |x| > 9e12 fall back to each engine's native
#   double→string rendering, which differs cross-engine — a conservative
#   false MISMATCH, never a false pass.  Rows using this path are marked
#   checksum_mode='quantized_1e6' in the artifact.
_CS_TYPES_INT = {"bigint", "int", "integer", "smallint", "tinyint"}


def _quantized_double(sp_col: str, du_col: str) -> tuple[str, str]:
    """Cross-engine rendering of a double at 1e-6 quantization.

    Spark floor(double) returns BIGINT (overflow-unsafe in non-ANSI mode);
    DuckDB floor returns DOUBLE and CAST(double AS BIGINT) rounds — both
    agree only because the guarded input is already integer-valued and
    |x*1e6 + 0.5| <= 9.0000005e18 < Long.MAX.  NULL propagates through
    both CASEs to the caller's chr(2) marker.
    """
    sp = (
        f"case when isnan({sp_col}) then 'Fnan' "
        f"when abs({sp_col}) > 9.0E12 then "
        f"concat('F', lower(cast({sp_col} as string))) "
        f"else cast(floor({sp_col} * 1.0E6 + cast(0.5 as double)) "
        "as string) end"
    )
    du = (
        f"CASE WHEN isnan({du_col}) THEN 'Fnan' "
        f"WHEN abs({du_col}) > 9.0E12 THEN "
        f"'F' || lower(CAST({du_col} AS VARCHAR)) "
        f"ELSE CAST(CAST(floor({du_col} * 1.0E6 + 0.5) AS BIGINT) "
        "AS VARCHAR) END"
    )
    return sp, du


def _checksum_exprs(fields: list[tuple[str, str]]):
    """(spark_row_expr, duck_row_expr, quantized) or None if any column
    type has no cross-engine rendering.  ``fields`` = sorted (name, type).
    ``quantized`` is True when any double/float column participates (the
    1e-6-tolerance rendering, marked distinctly in the artifact)."""
    sp_parts, du_parts = [], []
    quantized = False
    for name, t in fields:
        if t in _CS_TYPES_INT or t in ("boolean", "date"):
            sp = f"cast(`{name}` as string)"
            du = f'CAST("{name}" AS VARCHAR)'
        elif t == "string":
            # per-field md5: fixed-length hex — no separator injection,
            # and the chr(2) null marker cannot collide with hex output
            sp = f"md5(`{name}`)"
            du = f'md5("{name}")'
        elif t in ("timestamp", "timestamp_ntz"):
            # micros epoch: exact BIGINT on both engines (oracles emit
            # TIMESTAMP per the repo contract; session TZ pinned UTC)
            sp = f"cast(unix_micros(cast(`{name}` as timestamp)) as string)"
            du = f'CAST(epoch_us(CAST("{name}" AS TIMESTAMP)) AS VARCHAR)'
        elif t in ("double", "float"):
            sp, du = _quantized_double(
                f"cast(`{name}` as double)", f'CAST("{name}" AS DOUBLE)'
            )
            quantized = True
        else:
            return None
        # chr(2) null marker (DuckDB strings cannot hold chr(0));
        # concat_ws SKIPS nulls on both engines, so nulls must be rendered
        sp_parts.append(f"coalesce({sp}, chr(2))")
        du_parts.append(f"COALESCE({du}, chr(2))")
    sp_row = "concat_ws(chr(31), " + ", ".join(sp_parts) + ")"
    du_row = "concat_ws(chr(31), " + ", ".join(du_parts) + ")"
    return sp_row, du_row, quantized


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--oracle-timeout", type=float, default=600.0)
    ap.add_argument(
        "--max-compare-rows",
        type=int,
        default=2_000_000,
        help="results larger than this are compared by row count only "
        "(status PASS_ROWS_ONLY) — full hashing is a driver-side harness "
        "cost, not an engine property",
    )
    ap.add_argument(
        "--skip",
        default="",
        help="comma-separated query names to leave unrecorded this run "
        "(e.g. one whose oracle needs a dedicated high-memory pass)",
    )
    ap.add_argument(
        "--shard",
        default=None,
        help="'K/N' — run only registry names whose sorted index %% N == K; "
        "shard out-files are merged by scripts/merge_sweep_shards.py",
    )
    ap.add_argument(
        "--retry-failed",
        action="store_true",
        help="invalidate recorded FAIL rows at resume so they re-run — "
        "environmental failures (a task OOM in a heap-pressured JVM) "
        "should not be permanent records; genuine failures simply "
        "re-fail and stay recorded",
    )
    args = ap.parse_args()
    shard_k, shard_n = (
        (int(args.shard.split("/")[0]), int(args.shard.split("/")[1]))
        if args.shard
        else (0, 1)
    )

    def oracle_md5(spec) -> str | None:
        return (
            hashlib.md5(spec.oracle.encode()).hexdigest()
            if spec.oracle
            else None
        )

    def fn_src_md5(spec) -> str | None:
        # r9 advisor: the oracle hash alone lets a row recorded against an
        # OLD Spark implementation survive resume when only the Spark side
        # changed — hash the query function's source too.  (Helper/operator
        # edits still evade this; the per-round driver sample is the
        # backstop for those.)
        try:
            return hashlib.md5(inspect.getsource(spec.fn).encode()).hexdigest()
        except (OSError, TypeError):
            return None

    results: dict[str, dict] = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            results = json.load(fh).get("queries", {})
        # STALENESS GATE (r8 lesson: manually "marked stale, re-run later"
        # silently didn't happen): a recorded row is only trusted if its
        # stored oracle_md5 AND fn_src_md5 match the CURRENT code.  Rows
        # written before these fields existed, or whose oracle or Spark
        # implementation has since changed, are dropped here and re-run.
        stale = [
            n
            for n, r in results.items()
            if n not in REGISTRY
            or r.get("oracle_md5") != oracle_md5(REGISTRY[n])
            or r.get("fn_src_md5") != fn_src_md5(REGISTRY[n])
            or (
                args.retry_failed
                and str(r.get("status", "")).startswith("FAIL")
            )
        ]
        for n in stale:
            del results[n]
        print(
            f"resuming: {len(results)} recorded"
            + (f" ({len(stale)} stale rows invalidated)" if stale else ""),
            flush=True,
        )

    spark = get_spark(app_name="registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def flush():
        done = [r for r in results.values() if r.get("status") == "PASS"]
        payload = {
            "sf_dir": args.sf_dir,
            "n_total": len(REGISTRY),
            "n_recorded": len(results),
            "n_pass": len(done),
            "n_pass_rows_only": sum(
                1
                for r in results.values()
                if r.get("status") == "PASS_ROWS_ONLY"
            ),
            "n_pass_checksum": sum(
                1
                for r in results.values()
                if r.get("status") == "PASS_CHECKSUM"
            ),
            "n_oracle_timeout": sum(
                1
                for r in results.values()
                if r.get("status") == "ORACLE_TIMEOUT"
            ),
            "n_oracle_resource": sum(
                1
                for r in results.values()
                if r.get("status") == "ORACLE_RESOURCE"
            ),
            "n_fail": sum(
                1
                for r in results.values()
                if str(r.get("status", "")).startswith("FAIL")
            ),
            "spark_wall_total_sec": round(
                sum(r.get("spark_sec", 0) for r in results.values()), 1
            ),
            "queries": results,
        }
        tmp = args.out + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=1)
        os.replace(tmp, args.out)

    skip = {n for n in args.skip.split(",") if n}
    for i, name in enumerate(sorted(REGISTRY)):
        if i % shard_n != shard_k or name in results or name in skip:
            continue
        spec = REGISTRY[name]
        rec: dict = {
            "oracle_md5": oracle_md5(spec),
            "fn_src_md5": fn_src_md5(spec),
            # declared comparison-mode entitlement (QuerySpec.decimal_faithful):
            # False = output carries raw float arithmetic, quantized checksum
            # is the EXPECTED large-result mode; True = bit-exact columns only
            "decimal_faithful": spec.decimal_faithful,
        }
        t0 = time.perf_counter()
        cs = None
        srow_cs = None
        try:
            # count first: the result-set size decides the comparison mode
            # (a query can be scale-correct yet produce a result too large
            # to hash driver-side — simhash_near_pairs emits 87M pairs at
            # sf10; collecting that is a HARNESS limit, not an engine one)
            n_spark = spec.fn(spark, args.sf_dir).count()
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            rec["spark_rows"] = n_spark
            sdf = (
                spec.fn(spark, args.sf_dir).toPandas()
                if n_spark <= args.max_compare_rows
                else None
            )
            if sdf is None:
                # r9 advisor: the Spark-side checksum must run OUTSIDE the
                # oracle watchdog/try — it is ENGINE work; running it after
                # the watchdog starts eats the oracle's timeout budget and
                # an engine OOM would masquerade as ORACLE_RESOURCE
                cs = _checksum_exprs(
                    sorted(
                        (f.name, f.dataType.simpleString())
                        for f in spec.fn(spark, args.sf_dir).schema.fields
                    )
                )
                if cs is not None:
                    sp_row = cs[0]
                    srow_cs = (
                        spec.fn(spark, args.sf_dir)
                        .selectExpr(f"{sp_row} AS _r")
                        .selectExpr(
                            "cast(sum(cast(conv(substr(md5(_r), 1, 15), "
                            "16, 10) as decimal(38, 0))) as string) AS cs"
                        )
                        .first()["cs"]
                    )
        except Exception as e:  # noqa: BLE001 — recorded, sweep continues
            msg = str(e)
            if (
                "SparkContext was shut down" in msg
                or "stopped SparkContext" in msg
            ):
                # the JVM died (host OOM pressure): every later query would
                # cascade into the same FAIL — abort the RUN and let the
                # resume loop restart with a fresh context instead of
                # flushing garbage rows over real results
                print(
                    f"[{i + 1}] {name}: SparkContext dead — aborting run "
                    "for clean restart",
                    flush=True,
                )
                sys.exit(3)
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            rec["status"] = f"FAIL: spark: {type(e).__name__}: {e}"[:500]
            results[name] = rec
            flush()
            print(f"[{i + 1}] {name}: {rec['status']}", flush=True)
            continue
        con = duck_connection(args.sf_dir)
        # The host OOM-killer is the real timeout at sf10: one unbounded
        # oracle (observed 48 GB RSS) takes down every concurrent Spark
        # driver on the box.  Cap the oracle's memory and give it a spill
        # dir — a too-slow spilling oracle is then caught honestly by the
        # watchdog as ORACLE_TIMEOUT instead of killing the sweep.
        con.execute(
            f"SET memory_limit='{os.environ.get('SWEEP_DUCK_MEM', '20GB')}'"
        )
        # per-PROCESS spill dir: concurrent shard sweeps sharing one
        # temp_directory collide on DuckDB's generic temp file names
        # (observed: "Could not read enough bytes from duckdb_temp_storage-
        # 2.tmp" corrupting an innocent oracle)
        spill = f"/tmp/duck_spill_{os.getpid()}"
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        interrupted = threading.Event()

        # duckdb's interrupt must come from another thread while the query
        # runs; Event.wait returns False on timeout → interrupt
        def watchdog_run(c=con, ev=interrupted):
            if not ev.wait(args.oracle_timeout):
                try:
                    c.interrupt()
                except Exception:  # noqa: BLE001 — connection already gone
                    pass

        wt = threading.Thread(target=watchdog_run, daemon=True)
        wt.start()
        t1 = time.perf_counter()
        try:
            if sdf is None:
                if cs is not None:
                    # full-value order-independent checksum: the Spark-side
                    # scalar (srow_cs) was computed in the engine phase
                    # above; only the ORACLE runs under the watchdog here
                    du_row = cs[1]
                    drow = con.execute(
                        "SELECT COUNT(*), CAST(SUM(('0x' || "
                        "substr(md5(_r), 1, 15))::BIGINT) AS VARCHAR) "
                        f"FROM (SELECT {du_row} AS _r FROM ({spec.oracle}))"
                    ).fetchone()
                    interrupted.set()
                    rec["oracle_sec"] = round(time.perf_counter() - t1, 2)
                    rec["oracle_rows"] = drow[0]
                    if cs[2]:
                        rec["checksum_mode"] = "quantized_1e6"
                        if spec.decimal_faithful:
                            # audit flag: a query DECLARED bit-exact fell
                            # back to the tolerance rendering — either the
                            # declaration or the schema drifted; visible in
                            # the artifact, not silently absorbed
                            rec["checksum_mode_undeclared"] = True
                    ok_rows = drow[0] == rec["spark_rows"]
                    ok_cs = (
                        srow_cs is not None
                        and drow[1] is not None
                        and int(srow_cs) == int(drow[1])
                    ) or (srow_cs is None and drow[1] is None)
                    rec["status"] = (
                        "PASS_CHECKSUM"
                        if ok_rows and ok_cs
                        else "FAIL: "
                        + (
                            f"rows {rec['spark_rows']} != {drow[0]} "
                            if not ok_rows
                            else f"checksum {srow_cs} != {drow[1]} "
                        )
                        + "(checksum mode)"
                    )
                else:
                    # rows-only mode: the schema has types with no
                    # cross-engine rendering at all (DECIMAL, arrays,
                    # structs); compare cardinalities (the honest weaker
                    # check, marked distinctly so the artifact shows which)
                    n_oracle = con.execute(
                        f"SELECT COUNT(*) FROM ({spec.oracle})"
                    ).fetchone()[0]
                    interrupted.set()
                    rec["oracle_sec"] = round(time.perf_counter() - t1, 2)
                    rec["oracle_rows"] = n_oracle
                    rec["status"] = (
                        "PASS_ROWS_ONLY"
                        if n_oracle == rec["spark_rows"]
                        else f"FAIL: rows {rec['spark_rows']} != {n_oracle} "
                        "(rows-only mode)"
                    )
            else:
                ddf = con.execute(spec.oracle).fetchdf()
                interrupted.set()
                rec["oracle_sec"] = round(time.perf_counter() - t1, 2)
                try:
                    assert_frames_match(sdf, ddf, name)
                    rec["status"] = "PASS"
                except AssertionError as e:
                    rec["status"] = f"FAIL: {e}"[:500]
        except Exception as e:  # noqa: BLE001 — interrupt or duckdb error
            interrupted.set()
            rec["oracle_sec"] = round(time.perf_counter() - t1, 2)
            msg = str(e).lower()
            if "interrupt" in msg or rec["oracle_sec"] >= args.oracle_timeout:
                rec["status"] = "ORACLE_TIMEOUT"
            elif (
                "out of memory" in msg
                or "no space left" in msg
                or "could not read enough bytes" in msg
                or "temp_storage" in msg
            ):
                # the ORACLE exhausted its memory cap / spill disk — the
                # Spark side finished; same honest weaker-marker class as
                # ORACLE_TIMEOUT, distinct from a value mismatch
                rec["status"] = "ORACLE_RESOURCE"
                rec["oracle_err"] = str(e)[:200]
            else:
                rec["status"] = f"FAIL: duckdb: {type(e).__name__}: {e}"[:500]
        finally:
            con.close()
        # cap driver RSS growth across 200 queries (a late-sweep
        # duck_connection died on allocation once the big-pairs results
        # had been through pandas — release eagerly)
        import gc

        sdf = None
        try:
            del ddf
        except NameError:
            pass
        gc.collect()
        rec["recorded_at"] = round(time.time(), 2)
        results[name] = rec
        flush()
        print(
            f"[{i + 1}/{len(REGISTRY)}] {name}: {rec['status']} "
            f"(spark {rec.get('spark_sec')}s, oracle {rec.get('oracle_sec')}s)",
            flush=True,
        )
    flush()
    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    print(f"DONE: {n_pass}/{len(results)} PASS", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
