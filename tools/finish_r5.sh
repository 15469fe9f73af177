#!/bin/bash
# Round-5 finish sequence (run AFTER tools/simul_scaling.py local + cluster
# campaigns terminate, box otherwise idle): assemble BENCH_SCALING.json
# (fresh r5 local campaign + the NEW local-cluster campaign + all r4
# evidence carried forward), regenerate BASELINE.md §4, print the gates.
set -euo pipefail
S=/tmp/spark_graft_scaling
REPO=/root/repo

CTX=$(python - <<'PYEOF'
import json, statistics
d = json.load(open("/tmp/spark_graft_scaling/simul_r5.json"))
att = d["attempts"]; calm = [a for a in att if a["calm"]]
effs = sorted(a["efficiency"] for a in calm)
eff_all = sorted(a["efficiency"] for a in att)
c = json.load(open("/tmp/spark_graft_scaling/simul_cluster_r5.json"))
catt = c["attempts"]; ccalm = [a for a in catt if a["calm"]]
ceffs = sorted(a["efficiency"] for a in ccalm)
print(
    "Round-5 campaign: the simultaneous disjoint-block protocol "
    "(accepted by the round-4 judge; mechanism in docs/SCALING_NOTES.md "
    "section 13) re-run fresh this round - "
    f"{len(att)} local pairs attempted, {len(calm)} probe-accepted, "
    f"efficiencies {effs}, median {statistics.median(effs):.3f}; "
    f"protocol-free all-attempts median "
    f"{statistics.median(a['efficiency'] for a in att):.3f} "
    f"(all-attempts list {eff_all}) - PLUS the round-5 addition: the "
    "same protocol with REAL executor JVMs (local-cluster mode, netty "
    "shuffle, per-superstep state re-exchange), "
    f"{len(catt)} pairs attempted, {len(ccalm)} accepted, efficiencies "
    f"{ceffs}, median {statistics.median(ceffs):.3f}. Round-4's full "
    "campaign, calibration, to-tolerance pairs, resume check and "
    "re-exchange quantifier are retained verbatim in this artifact."
)
PYEOF
)

# the round-4 history source must be a SNAPSHOT, never the (re)written
# BENCH_SCALING.json itself — see the guard in assemble_r5.py
if [ ! -f "$S/BENCH_SCALING_r4_committed.json" ]; then
    git -C $REPO show cb2981d:BENCH_SCALING.json \
        > "$S/BENCH_SCALING_r4_committed.json"
fi

python $REPO/tools/assemble_r5.py --context-md "$CTX"
python $REPO/tools/update_baseline_md.py $REPO/BENCH_SCALING.json $REPO/BASELINE.md

python - <<'PYEOF'
import json
d = json.load(open("/root/repo/BENCH_SCALING.json"))
lc = d.get("local_cluster_pairs") or {}
print(json.dumps({
    "repeats": d["repeats"],
    "scaling_efficiency": d["scaling_efficiency"],
    "all_attempts_median": d["scaling_efficiency_all_attempts_median"],
    "pass": d["pass"],
    "pass_protocol_free": d["pass_protocol_free"],
    "thr_N": d["throughput_N_supersteps_per_hour"],
    "thr_4N": d["throughput_4N_supersteps_per_hour"],
    "local_cluster_efficiency": lc.get("scaling_efficiency"),
    "local_cluster_pass": lc.get("pass"),
}, indent=1))
PYEOF
