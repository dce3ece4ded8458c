"""Print the sweep headline claim COMPUTED from the committed artifact.

Two rounds running (r8, r9) shipped COVERAGE/ROUND_NOTES/commit-message
prose that contradicted the committed sweep artifact's own counters
(r9: "0 resource errors" vs ``n_oracle_resource: 2`` in the file).  The
fix is mechanical: every headline claim string is GENERATED from the
artifact, never typed.  Usage:

    python scripts/claims_from_artifact.py SCALE_SWEEP_SF10.json

prints a one-line claim suitable for COVERAGE.md / ROUND_NOTES / commit
messages, plus the named non-green rows (so a claim of "0 X" can only
appear when the artifact records 0 X).
"""

from __future__ import annotations

import json
import sys


def claim_line(path: str) -> str:
    with open(path) as fh:
        d = json.load(fh)
    q = d.get("queries", {})
    # recompute every counter from the rows — never trust the stored
    # summary either (it is rewritten per-query, but a hand-edited file
    # must not be able to lie through this script)
    counts = {
        "pass": 0,
        "checksum": 0,
        "rows_only": 0,
        "oracle_timeout": 0,
        "oracle_resource": 0,
        "fail": 0,
    }
    non_green: list[str] = []
    for name, rec in sorted(q.items()):
        st = str(rec.get("status", ""))
        if st == "PASS":
            counts["pass"] += 1
        elif st == "PASS_CHECKSUM":
            counts["checksum"] += 1
        elif st == "PASS_ROWS_ONLY":
            counts["rows_only"] += 1
            non_green.append(f"{name}={st}")
        elif st == "ORACLE_TIMEOUT":
            counts["oracle_timeout"] += 1
            non_green.append(f"{name}={st}")
        elif st == "ORACLE_RESOURCE":
            counts["oracle_resource"] += 1
            non_green.append(f"{name}={st}")
        else:
            counts["fail"] += 1
            non_green.append(f"{name}={st[:80]}")
    n_rec = len(q)
    n_total = d.get("n_total", n_rec)
    line = (
        f"{path}: {n_rec}/{n_total} recorded — "
        f"{counts['pass']} PASS + {counts['checksum']} PASS_CHECKSUM "
        f"(full-value), {counts['rows_only']} rows-only, "
        f"{counts['oracle_timeout']} oracle-timeout, "
        f"{counts['oracle_resource']} oracle-resource, "
        f"{counts['fail']} FAIL; "
        f"spark wall {round(sum(r.get('spark_sec', 0) for r in q.values()), 1)}s"
    )
    if non_green:
        line += "\n  non-green rows: " + ", ".join(non_green)
    return line


if __name__ == "__main__":
    for p in sys.argv[1:] or ["SCALE_SWEEP_SF10.json"]:
        print(claim_line(p))
