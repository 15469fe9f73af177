#!/bin/bash
# Round-3 finish sequence (run AFTER tools/calm_scaling.py terminates):
# regenerate BENCH_SCALING.json from the FULL calm-window bank (all
# attempts, final per-level calm verdicts), fold the 1e-9 convergence legs
# and the bench-scale resume triple back in, regenerate BASELINE.md §4 from
# the same artifact, and print the gate numbers. The context paragraph is
# generated from the final calm JSON so attempt/acceptance counts can never
# drift from the data.
set -euo pipefail
S=/tmp/spark_graft_scaling
REPO=/root/repo

# Prefer the sequential probe-gated to-tolerance pair if it was run
# (tools/run_conv_seq.py); fall back to the concurrent-window legs.
CONV_LO=$S/conv_lo_1e9.json
CONV_HI=$S/conv_hi_1e9.json
if [ -f $S/conv_lo_1e9_seq.json ] && [ -f $S/conv_hi_1e9_seq.json ]; then
  CONV_LO=$S/conv_lo_1e9_seq.json
  CONV_HI=$S/conv_hi_1e9_seq.json
fi

CTX=$(python - <<'EOF'
import json, statistics
d = json.load(open("/tmp/spark_graft_scaling/calm_r3.json"))
att = d["attempts"]
calm = [a for a in att if a["calm"]]
rej = [a for a in att if not a["calm"]]
effs = sorted(a["efficiency"] for a in calm)
med = statistics.median(effs)
print(
    "Round-3 calm-window campaign (tools/calm_scaling.py, resumable; "
    f"{len(att)} attempted pairs across the round): the PRE-REGISTERED "
    "per-level probe acceptance rule (leg calm iff its probe median >= "
    "0.92x the best probe median observed for that level across the whole "
    f"campaign) accepted {len(calm)} pairs - efficiencies {effs}, median "
    f"{med:.3f}. All {len(rej)} rejected attempts are reported verbatim "
    "under calm_window.rejected_attempts (their efficiencies: "
    f"{[a['efficiency'] for a in rej]} - rejection is probe-based and "
    "efficiency-blind, so the rule discards passing and failing pairs "
    "alike). Calm verdicts are recomputed over ALL attempts at campaign "
    "end because the per-level best evolves. Raw probe trace: "
    "BENCH_SCALING_PROBE.jsonl; per-leg raw JSONs reproducible via "
    "tools/calm_scaling.py --resume."
)
EOF
)

python $REPO/tools/assemble_calm.py \
  --calm $S/calm_r3.json \
  --bank $S/bank_r3 \
  --conv-lo "$CONV_LO" \
  --conv-hi "$CONV_HI" \
  --resume-json $S/resume_4n.json \
  --context-md "$CTX" \
  --out $REPO/BENCH_SCALING.json

python $REPO/tools/update_baseline_md.py $REPO/BENCH_SCALING.json $REPO/BASELINE.md

python - <<'EOF'
import json
d = json.load(open("/root/repo/BENCH_SCALING.json"))
print(json.dumps({
    "repeats": d["repeats"],
    "scaling_efficiency": d["scaling_efficiency"],
    "pass": d["pass"],
    "thr_N": d["throughput_N_supersteps_per_hour"],
    "thr_4N": d["throughput_4N_supersteps_per_hour"],
}, indent=1))
EOF
