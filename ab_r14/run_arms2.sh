#!/bin/bash
# Arms 2-4 re-run from the pristine HEAD worktree (arm 1 completed before
# any code edit and is kept).  Arm 2 re-measured clean.
cd /root/before_r14
run_arm() {
  local name=$1 smj=$2 localmap=$3 objagg=$4
  echo "=== arm $name smj=$smj localmap=$localmap objagg=$objagg $(date +%T) ==="
  SPARK_GRAFT_PREFER_SMJ=$smj SPARK_GRAFT_SHJ_LOCALMAP=$localmap SPARK_GRAFT_OBJ_AGG_FALLBACK=$objagg \
    python bench.py > /root/repo/ab_r14/arm_${name}.stdout 2> /root/repo/ab_r14/arm_${name}.stderr
  cp bench_out.json /root/repo/ab_r14/arm_${name}_detail.json
  tail -1 /root/repo/ab_r14/arm_${name}.stdout
}
run_arm smj_agg    true  0    4096
run_arm shj_stock  false 128m 128
run_arm smj_stock  true  0    128
echo "ALL ARMS DONE $(date +%T)"
