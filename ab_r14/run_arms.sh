#!/bin/bash
# A/B the two global session knobs (VERDICT r13 next-1).
# Each arm: full bench.py (3 reps, sentinel-normalized), output preserved per-arm.
cd /root/repo
run_arm() {
  local name=$1 smj=$2 localmap=$3 objagg=$4
  echo "=== arm $name smj=$smj localmap=$localmap objagg=$objagg $(date +%T) ==="
  SPARK_GRAFT_PREFER_SMJ=$smj SPARK_GRAFT_SHJ_LOCALMAP=$localmap SPARK_GRAFT_OBJ_AGG_FALLBACK=$objagg \
    python bench.py > ab_r14/arm_${name}.stdout 2> ab_r14/arm_${name}.stderr
  cp bench_out.json ab_r14/arm_${name}_detail.json
  tail -1 ab_r14/arm_${name}.stdout
}
run_arm shj_agg    false 128m 4096   # HEAD defaults
run_arm smj_agg    true  0    4096   # revert SHJ knobs only
run_arm shj_stock  false 128m 128    # revert objAgg only
run_arm smj_stock  true  0    128    # all stock (pre-r13 config)
echo "ALL ARMS DONE $(date +%T)"
