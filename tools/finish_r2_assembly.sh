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
  --context-md "Supplementary convergence leg (the absolute 1e-6 threshold is coarse at 6M vertices where ranks are O(1e-7)): to tol 1e-9 L-inf the same job converges at superstep 9 — 23.3 s/step, 164.8 supersteps/hour on an otherwise-idle box (raw leg embedded in BENCH_SCALING.json as convergence_run_4N_tol1e9). Honest context for this FAILED gate: the five pairs span 0.653-0.859 because this shared host's noisy-neighbor bands moved WITHIN pairs this session (the same commit measured per-pair 0.835-0.840 in the previous session's calmer windows, and the one calm-window pair this session measured 0.859). Event-log attribution (docs/SCALING_NOTES.md s10, instrumented legs at this exact protocol) shows per-superstep core-busy of 99%/94-95% at N/4N, GC <=2%, zero fetch-wait, 0.2-0.7 s driver gap — an engine-side ceiling of ~0.93-0.95 — while the task-seconds of the IDENTICAL superstep swing 1.0x-1.6x with the minute-scale ambient window (matched stages: 104.4 vs 104.3 task-s in a calm window -> pair efficiency 0.93; 94.1 vs 147.5 in a noisy one -> 0.65). The shortfall is co-tenant bandwidth/disk inflation landing on whichever leg is running, which a real N-vs-4N fleet of separate machines does not pay. A simultaneous-pair instrument (tools/bench_scaling_sim.py: both levels pinned to disjoint blocks in the SAME window) was built and measured 0.687, but shares aggregate disk/DRAM bandwidth asymmetrically (the 4N leg demands 4x), so it bounds from below rather than gates. Next session, first move: re-run the 5-pair protocol in a verified-calm window (60 s calibration probe before each pair, trace reported alongside)." \
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
