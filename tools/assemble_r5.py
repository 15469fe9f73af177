#!/usr/bin/env python
"""Assemble the round-5 BENCH_SCALING.json.

Headline: a FRESH simultaneous disjoint-block campaign (same protocol the
round-4 judge accepted, tools/simul_scaling.py) PLUS the round-5 addition
— the same simultaneous protocol executed in **local-cluster mode**
(VERDICT r4 item 5): N = local-cluster[1,2] vs 4N = local-cluster[4,2],
REAL executor JVMs with separate heaps/GCs and netty shuffle between
processes, pinned to the same disjoint core blocks as the local pairs.
That is the multi-executor-faithful shape of the north rule's "N vs 4N
executors" — the gate must pass there too, not only in thread-count
emulation.

Carried forward verbatim from the committed round-4 artifact (nothing
discarded): the per-core capability calibration, the paired 1e-9
to-tolerance legs, the fresh-process resume check, the local-cluster
re-exchange quantifier, and the full back-to-back history (rounds 2-4).

Usage: python tools/assemble_r5.py [--context-md TEXT]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics

S = "/tmp/spark_graft_scaling"
KEY = "sec_per_superstep_median_step"


def load(path, required=False):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    if required:
        raise SystemExit(f"missing required artifact: {path}")
    return None


def pick(runs):
    srt = sorted(runs, key=lambda r: r[KEY])
    med = dict(srt[len(srt) // 2])
    med["steady_all"] = [r[KEY] for r in runs]
    med["steady_median"] = round(
        statistics.median(r[KEY] for r in runs), 3)
    med["steady_min"] = min(r[KEY] for r in runs)
    med["steady_max"] = max(r[KEY] for r in runs)
    return med


def campaign_tables(simul: dict, bank: str):
    """(pairs, level_N, level_4N, eff_median_calm, eff_median_all)."""
    attempts = simul["attempts"]
    calm = [a for a in attempts if a["calm"]]
    if not calm:
        raise SystemExit("no calm pairs in campaign")
    lo_runs, hi_runs, pairs = [], [], []
    for i, a in enumerate(calm):
        lo_runs.append(load(os.path.join(bank, f"lo_{a['attempt']}.json"),
                            required=True))
        hi_runs.append(load(os.path.join(bank, f"hi_{a['attempt']}.json"),
                            required=True))
        pairs.append({
            "repeat": i,
            "attempt": a["attempt"],
            "order": "simultaneous",
            "N_sec_per_superstep": a["N_sec_per_superstep"],
            "4N_sec_per_superstep": a["4N_sec_per_superstep"],
            "efficiency": a["efficiency"],
            "probe_pair_gbps": a["probe_pair"]["median_gbps"],
            "overlap_full": a.get("overlap_full"),
        })
    eff = statistics.median(p["efficiency"] for p in pairs)
    eff_all = statistics.median(a["efficiency"] for a in attempts)
    return pairs, pick(lo_runs), pick(hi_runs), eff, eff_all


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--simul", default=os.path.join(S, "simul_r5.json"))
    ap.add_argument("--bank", default=os.path.join(S, "bank_simul_r5"))
    ap.add_argument("--cluster-simul",
                    default=os.path.join(S, "simul_cluster_r5.json"))
    ap.add_argument("--cluster-bank",
                    default=os.path.join(S, "bank_cluster_r5"))
    # NOT /root/repo/BENCH_SCALING.json: that is also the OUTPUT path, so
    # a re-run of this assembler would read its own round-5 output as
    # "round 4" and silently relabel round-5 numbers as round-4 history.
    # The round-4 snapshot is extracted once from git (commit cb2981d) by
    # finish_r5.sh; the assembler refuses to proceed when prev == out.
    ap.add_argument("--prev",
                    default=os.path.join(
                        S, "BENCH_SCALING_r4_committed.json"),
                    help="round-4 artifact SNAPSHOT (evidence carried "
                         "forward + campaign history); must not be the "
                         "output path")
    ap.add_argument("--cluster-resume-json",
                    default=os.path.join(S, "resume_cluster_r5.json"))
    ap.add_argument("--probe-out",
                    default="/root/repo/BENCH_SCALING_PROBE.jsonl")
    ap.add_argument("--out", default="/root/repo/BENCH_SCALING.json")
    ap.add_argument("--context-md", default=None)
    args = ap.parse_args()

    if os.path.abspath(args.prev) == os.path.abspath(args.out):
        raise SystemExit(
            "--prev must be a round-4 SNAPSHOT, not the output path: "
            "reading the assembler's own output as 'round 4' would "
            "relabel round-5 numbers as round-4 history on re-run "
            "(extract it with: git show cb2981d:BENCH_SCALING.json)"
        )
    simul = load(args.simul, required=True)
    csim = load(args.cluster_simul)
    prev = load(args.prev, required=True)

    pairs, lo, hi, eff, eff_all = campaign_tables(simul, args.bank)
    attempts = simul["attempts"]
    calm = [a for a in attempts if a["calm"]]

    cluster_section = None
    if csim:
        cpairs, clo, chi, ceff, ceff_all = campaign_tables(
            csim, args.cluster_bank)
        cluster_section = {
            "protocol": csim["protocol"],
            "master_mode": "local-cluster",
            "lo_units": csim.get("lo_units"),
            "hi_units": csim.get("hi_units"),
            "cores_per_executor": csim.get("cores_per_executor"),
            "executor_mem_mb": csim.get("executor_mem_mb"),
            "lo_supersteps": csim["lo_supersteps"],
            "hi_supersteps": csim["hi_supersteps"],
            "fixed_partitions": csim["fixed_partitions"],
            "attempts_total": len(csim["attempts"]),
            "attempts_rejected": len(csim["attempts"])
            - sum(1 for a in csim["attempts"] if a["calm"]),
            "pairs": cpairs,
            "level_N": clo,
            "level_4N": chi,
            "scaling_efficiency": round(ceff, 3),
            "scaling_efficiency_all_attempts_median": round(ceff_all, 3),
            "target": 0.8,
            "pass": ceff >= 0.8,
            "pass_protocol_free": ceff_all >= 0.8,
        }

    # evidence carried forward from the committed round-4 artifact
    history = dict(prev.get("back_to_back_history") or {})
    history["round4_simultaneous_campaign"] = {
        "scaling_efficiency": prev.get("scaling_efficiency"),
        "scaling_efficiency_all_attempts_median": prev.get(
            "scaling_efficiency_all_attempts_median"),
        "pairs": prev.get("pairs"),
        "calm_window": prev.get("calm_window"),
        "level_N": prev.get("level_N"),
        "level_4N": prev.get("level_4N"),
        "context_md": prev.get("context_md"),
    }

    result = {
        "protocol": simul["protocol"],
        "mode": "simultaneous",
        "input": simul["input"],
        "fixed_supersteps": simul["lo_supersteps"],
        "hi_supersteps": simul["hi_supersteps"],
        "fixed_partitions": simul["fixed_partitions"],
        "repeats": len(pairs),
        "calm_window": {
            "calibration_ref_gbps": simul["calibration_ref_gbps"],
            "gate_frac": simul["gate_frac"],
            "level_frac": simul["level_frac"],
            "best_pair_probe_gbps": simul.get("best_pair_probe_gbps"),
            "attempts_total": len(attempts),
            "attempts_rejected": len(attempts) - len(calm),
            "rejected_attempts": [a for a in attempts if not a["calm"]],
            "probe_trace": os.path.basename(args.probe_out),
        },
        "pairs": pairs,
        "level_N": lo,
        "level_4N": hi,
        "throughput_N_supersteps_per_hour": round(
            3600.0 / lo["steady_median"], 1),
        "throughput_4N_supersteps_per_hour": round(
            3600.0 / hi["steady_median"], 1),
        "all_runs": {
            "N_steady_sec_per_superstep": lo["steady_all"],
            "4N_steady_sec_per_superstep": hi["steady_all"],
        },
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_all_attempts_median": round(eff_all, 3),
        "scaling_efficiency_level_median": round(
            (lo["steady_median"] / hi["steady_median"]) / 4.0, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "pass_protocol_free": eff_all >= 0.8,
        "local_cluster_pairs": cluster_section,
        "resume_check_local_cluster": load(args.cluster_resume_json),
        "percore_calibration": prev.get("percore_calibration"),
        "convergence_pairs_1e9": prev.get("convergence_pairs_1e9"),
        "resume_check_4N": prev.get("resume_check_4N"),
        "cluster_reexchange": prev.get("cluster_reexchange"),
        "back_to_back_history": history,
    }
    if args.context_md:
        result["context_md"] = args.context_md
    if args.probe_out and os.path.exists(simul.get("probe_trace", "")):
        import shutil
        shutil.copyfile(simul["probe_trace"], args.probe_out)
    else:
        # the scratch trace is gone (/tmp wipe): the committed probe file
        # would be a STALE prior round's — say so in the artifact rather
        # than letting readers verify acceptance against the wrong trace
        result["calm_window"]["probe_trace"] = (
            f"UNAVAILABLE (scratch trace {simul.get('probe_trace')} "
            "missing at assembly; any committed "
            f"{os.path.basename(args.probe_out)} is from a prior round)"
        )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    summary = {k: result[k] for k in (
        "scaling_efficiency", "scaling_efficiency_all_attempts_median",
        "repeats", "pass", "pass_protocol_free")}
    if cluster_section:
        summary["local_cluster_efficiency"] = (
            cluster_section["scaling_efficiency"])
        summary["local_cluster_pass"] = cluster_section["pass"]
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
