"""Merge shard out-files from `sweep_registry.py --shard K/N` into the
single round artifact with recomputed summary counts.

Usage:
    python scripts/merge_sweep_shards.py --out SCALE_SWEEP_SF10.json \
        SWEEP_SHARD_0.json SWEEP_SHARD_1.json SWEEP_SHARD_2.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zeta_etl_spark.queries import REGISTRY  # noqa: E402

def _is_pass(rec: dict) -> bool:
    return str(rec.get("status", "")).startswith("PASS")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("shards", nargs="+")
    args = ap.parse_args()

    # ONE WRITER PER FILE includes the merger (r8 incident: the merged
    # dict got written back over every per-shard file, destroying shard
    # provenance — three byte-identical "shards").  The merge target must
    # never be one of its inputs.
    out_real = os.path.realpath(args.out)
    for path in args.shards:
        if os.path.realpath(path) == out_real:
            sys.exit(
                f"refusing to merge: --out {args.out} is also a shard "
                "input; shard files are read-only to the merger"
            )

    results: dict[str, dict] = {}
    sf_dir = None
    for path in args.shards:
        with open(path) as fh:
            d = json.load(fh)
        sf_dir = sf_dir or d.get("sf_dir")
        for name, rec in d.get("queries", {}).items():
            prev = results.get(name)
            if prev is None:
                results[name] = rec
                continue
            # duplicate rows across shards (registry drift shifted parity):
            # keep the LATER record by recorded_at — never "the stronger
            # status" (r9 advisor: an early PASS must not mask a later
            # genuine FAIL).  Rows predating the timestamp field rank
            # earliest.  A PASS/FAIL disagreement is surfaced loudly.
            if _is_pass(rec) != _is_pass(prev):
                print(
                    f"WARNING: conflicting records for {name!r}: "
                    f"{prev.get('status')} (at {prev.get('recorded_at')}) "
                    f"vs {rec.get('status')} (at {rec.get('recorded_at')}) "
                    "— keeping the later; investigate the shard runs",
                    file=sys.stderr,
                )
            if rec.get("recorded_at", 0) >= prev.get("recorded_at", 0):
                results[name] = rec

    payload = {
        "sf_dir": sf_dir,
        "n_total": len(REGISTRY),
        "n_recorded": len(results),
        "n_pass": sum(1 for r in results.values() if r.get("status") == "PASS"),
        "n_pass_rows_only": sum(
            1 for r in results.values() if r.get("status") == "PASS_ROWS_ONLY"
        ),
        "n_pass_checksum": sum(
            1 for r in results.values() if r.get("status") == "PASS_CHECKSUM"
        ),
        "n_oracle_timeout": sum(
            1 for r in results.values() if r.get("status") == "ORACLE_TIMEOUT"
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
        "queries": {k: results[k] for k in sorted(results)},
    }
    tmp = args.out + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, args.out)
    print(
        f"merged {len(args.shards)} shards: {payload['n_recorded']}/"
        f"{payload['n_total']} recorded, {payload['n_pass']} pass, "
        f"{payload['n_pass_checksum']} checksum, "
        f"{payload['n_pass_rows_only']} rows-only, "
        f"{payload['n_oracle_timeout']} oracle-timeout, "
        f"{payload['n_oracle_resource']} oracle-resource, "
        f"{payload['n_fail']} fail"
    )


if __name__ == "__main__":
    main()
