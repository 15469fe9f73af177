#!/bin/bash
# Round-2 scaling assembly: ALL back-to-back pairs run at the final protocol
# (fixed-partitions 32, local[2] vs local[8], whole-job pinning) — the probe
# pair, bank_r2d pair 0, and bank_r2e pairs 0-2 — plus the convergence and
# resume legs from tools/run_conv_resume.py.  BENCH_SCALING.json and
# BASELINE.md §4 are regenerated from the same artifact.
set -euo pipefail
S=/tmp/spark_graft_scaling

CONV=""
RES=""
[ -f $S/conv_4n.json ] && CONV="--convergence $S/conv_4n.json"
[ -f $S/resume_4n.json ] && RES="--resume-json $S/resume_4n.json"

python /root/repo/tools/assemble_scaling.py \
  "$S/probe32_lo.json" "$S/bank_r2d/lo_0.json" \
  "$S/bank_r2e/lo_0.json" "$S/bank_r2e/lo_1.json" "$S/bank_r2e/lo_2.json" \
  --hi "$S/probe32_hi.json" "$S/bank_r2d/hi_0.json" \
       "$S/bank_r2e/hi_0.json" "$S/bank_r2e/hi_1.json" "$S/bank_r2e/hi_2.json" \
  --orders "N->4N,N->4N,N->4N,4N->N,N->4N" \
  --fixed-partitions 32 \
  $CONV $RES \
  --note "Partitions fixed at 32 (data-sized: E/(P*V)=0.6 puts BOTH levels in the incompressible partial-aggregation regime AND >=4 scheduling waves at the big level — docs/SCALING_NOTES.md s9; at P=8 every 4N stage was a single wave, so one noisy-neighbor task extended the whole stage only at the big level, measured 0.72-0.79). ALL five back-to-back pairs run at this final protocol are included, none discarded; the earlier P=8 pairs are retained in the notes as the measured failure mode." \
  --context-md "Supplementary convergence leg (the absolute 1e-6 threshold is coarse at 6M vertices where ranks are O(1e-7)): to tol 1e-9 L-inf the same job converges at superstep 9 — 23.3 s/step, 164.8 supersteps/hour on an otherwise-idle box (raw leg embedded in BENCH_SCALING.json as convergence_run_4N_tol1e9). Honest context for this FAILED gate: the five pairs span 0.653-0.859 because this shared host's noisy-neighbor bands moved WITHIN pairs this session (the same commit measured per-pair 0.835-0.840 in the previous session's calmer windows, and the one calm-window pair this session measured 0.859). Solving the two-level equations per pair gives ~9-10 s/superstep of parallelism-independent wall at both levels — far above the known ~0.5 s driver floor — which is exactly what ambient memory-bandwidth/disk sharing looks like and what a real N-vs-4N cluster of separate machines does not pay. A simultaneous-pair instrument (tools/bench_scaling_sim.py: both levels pinned to disjoint blocks in the SAME window) was built and measured 0.687, but shares aggregate disk/DRAM bandwidth asymmetrically (the 4N leg demands 4x), so it bounds from below rather than gates. Next session, first moves: event-log the ~10 s/step residual (tools/analyze_eventlog.py) on an idle box and re-run the 5-pair protocol there." \
  --out /root/repo/BENCH_SCALING.json

# embed the supplementary tol=1e-9 convergence leg for provenance
python - <<'EOF'
import json
d = json.load(open("/root/repo/BENCH_SCALING.json"))
try:
    d["convergence_run_4N_tol1e9"] = json.load(
        open("/tmp/spark_graft_scaling/conv_1e9.json"))
    json.dump(d, open("/root/repo/BENCH_SCALING.json", "w"), indent=2)
    print("embedded conv_1e9 leg")
except FileNotFoundError:
    print("no conv_1e9 leg found; skipped")
EOF

python /root/repo/tools/update_baseline_md.py
