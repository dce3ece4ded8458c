#!/bin/bash
# Restart-on-crash loop for sweep_registry.py.
#
# The r8 incident history this encodes:
# - the driver python RATCHETS RSS across ~200 DuckDB oracles (glibc never
#   returns arenas) and can be OOM-killed while the current query is
#   innocent — so the sweep must be cheap to restart, and this loop
#   restarts it (resume skips recorded rows; the staleness gate re-validates
#   each row's oracle_md5 at every resume).
# - MALLOC_ARENA_MAX=2 slows the ratchet; SWEEP_DUCK_MEM caps any one
#   oracle (exhaustion records as ORACLE_RESOURCE, not a host OOM).
# - completion is decided from the OUT FILE vs the current registry —
#   never from exit codes through a pipeline (the r8 session-4 bug).
#
# Usage: scripts/run_sweep_until_done.sh [OUT.json] [SF_DIR] [ORACLE_TIMEOUT]
set -u
OUT="${1:-SCALE_SWEEP_SF10.json}"
SF="${2:-/root/repo/.scale/sf10}"
TIMEOUT="${3:-900}"
cd "$(dirname "$0")/.." || exit 1
export MALLOC_ARENA_MAX=2
export SWEEP_DUCK_MEM="${SWEEP_DUCK_MEM:-24GB}"
# localCheckpoint blocks from ~300 queries accumulate in executor storage
# faster than the async ContextCleaner drains them; 16g (the default) hit
# a task heap OOM mid-sweep at sf10 where the query itself was innocent
export SPARK_DRIVER_MEMORY="${SPARK_DRIVER_MEMORY:-48g}"

check_done() {
  python - "$OUT" <<'EOF'
import json, sys
sys.path.insert(0, ".")
from zeta_etl_spark.queries import REGISTRY
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    print(0)
    raise SystemExit
ok = d.get("n_recorded") == len(REGISTRY) and set(
    d.get("queries", {})
) == set(REGISTRY)
print(1 if ok else 0)
EOF
}

for attempt in $(seq 1 40); do
  stdbuf -oL python scripts/sweep_registry.py \
    --sf-dir "$SF" --out "$OUT" --oracle-timeout "$TIMEOUT" --retry-failed
  rc=$?
  if [ "$(check_done)" = "1" ]; then
    echo "SWEEP COMPLETE after attempt $attempt"
    exit 0
  fi
  echo "attempt $attempt ended rc=$rc, not complete — restarting in 10s"
  sleep 10
done
echo "SWEEP DID NOT COMPLETE after 40 attempts"
exit 1
