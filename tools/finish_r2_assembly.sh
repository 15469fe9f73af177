#!/bin/bash
# Round-2 scaling assembly (32-partition protocol): the probe pair +
# bank_r2d's five pairs (all six run back-to-back under identical
# conditions), convergence + resume legs pulled from the bench output,
# BENCH_SCALING.json + BASELINE.md §4 regenerated from the same artifact.
set -euo pipefail
S=/tmp/spark_graft_scaling
B=$S/bank_r2d

python - <<'EOF'
import json
d = json.load(open("/tmp/spark_graft_scaling/bench_32_r2.json"))
if d.get("convergence_run_4N"):
    json.dump(d["convergence_run_4N"],
              open("/tmp/spark_graft_scaling/conv_4n.json", "w"))
if d.get("resume_check_4N"):
    json.dump(d["resume_check_4N"],
              open("/tmp/spark_graft_scaling/resume_4n.json", "w"))
print("tool-run pairs:", [p["efficiency"] for p in d.get("pairs", [])])
EOF

CONV=""
RES=""
[ -f $S/conv_4n.json ] && CONV="--convergence $S/conv_4n.json"
[ -f $S/resume_4n.json ] && RES="--resume-json $S/resume_4n.json"

python /root/repo/tools/assemble_scaling.py \
  "$S/probe32_lo.json" \
  "$B/lo_0.json" "$B/lo_1.json" "$B/lo_2.json" "$B/lo_3.json" "$B/lo_4.json" \
  --hi "$S/probe32_hi.json" \
       "$B/hi_0.json" "$B/hi_1.json" "$B/hi_2.json" "$B/hi_3.json" "$B/hi_4.json" \
  --orders "N->4N,N->4N,4N->N,N->4N,4N->N,N->4N" \
  $CONV $RES \
  --note "Partitions fixed at 32 (data-sized: E/(P*V)=0.6 puts BOTH levels in the incompressible partial-aggregation regime AND the multi-wave scheduling regime — see docs/SCALING_NOTES.md s9; the earlier 8-partition legs made every 4N stage a single wave, so one noisy-neighbor task extended the whole stage only at the big level). All six 32-partition pairs ever run are included; no pair discarded." \
  --out /root/repo/BENCH_SCALING.json

python /root/repo/tools/update_baseline_md.py
