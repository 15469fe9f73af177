#!/usr/bin/env python
"""Assemble the round-4 BENCH_SCALING.json.

Headline: the SIMULTANEOUS disjoint-block campaign
(tools/simul_scaling.py) — both levels under one identical busy-core
host state, pre-registered probe acceptance, plus the PROTOCOL-FREE
all-attempts median (the round-4 robustness goal).

Also embedded, all committed evidence, nothing discarded:
  * the per-core capability calibration triptych
    (tools/percore_calibration.py) that measured the mechanism behind
    the back-to-back protocol's day-dependence;
  * the full back-to-back history: the round-3 calm campaign (13 pairs)
    and this round's back-to-back attempt + partition diagnostics;
  * paired 1e-9 to-tolerance legs under the simultaneous protocol
    (tools/conv_simul_r4.py);
  * the fresh mid-run checkpoint/resume check (tools/run_resume_r4.py).

Output keeps the keys tools/update_baseline_md.py renders.

Usage: python tools/assemble_r4.py [--context-md TEXT]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--simul", default=os.path.join(S, "simul_r4.json"))
    ap.add_argument("--bank", default=os.path.join(S, "bank_simul_r4"))
    ap.add_argument("--calib",
                    default=os.path.join(S, "percore_calibration.json"))
    ap.add_argument("--prev", default="/root/repo/BENCH_SCALING.json",
                    help="round-3 artifact (back-to-back history)")
    ap.add_argument("--b2b-bank", default=os.path.join(S, "bank_r4"),
                    help="this round's resumed back-to-back attempts")
    ap.add_argument("--conv",
                    default=os.path.join(S, "conv_simul_pairs.json"))
    ap.add_argument("--resume-json", default=os.path.join(S,
                                                          "resume_4n.json"))
    ap.add_argument("--reexchange",
                    default=os.path.join(S, "reexchange_r4.json"))
    ap.add_argument("--probe-out",
                    default="/root/repo/BENCH_SCALING_PROBE.jsonl")
    ap.add_argument("--out", default="/root/repo/BENCH_SCALING.json")
    ap.add_argument("--context-md", default=None)
    args = ap.parse_args()

    simul = load(args.simul, required=True)
    calib = load(args.calib)
    prev = load(args.prev)
    conv = load(args.conv)
    resume = load(args.resume_json)
    reex = load(args.reexchange)
    b2b_r4 = load(os.path.join(args.b2b_bank, "attempts.json"))

    attempts = simul["attempts"]
    calm = [a for a in attempts if a["calm"]]
    if not calm:
        raise SystemExit("no calm simultaneous pairs")

    lo_runs, hi_runs, pairs = [], [], []
    for i, a in enumerate(calm):
        lo_runs.append(load(
            os.path.join(args.bank, f"lo_{a['attempt']}.json"),
            required=True))
        hi_runs.append(load(
            os.path.join(args.bank, f"hi_{a['attempt']}.json"),
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
    lo, hi = pick(lo_runs), pick(hi_runs)
    eff = statistics.median(p["efficiency"] for p in pairs)
    eff_all = statistics.median(a["efficiency"] for a in attempts)

    history = {
        "note": (
            "Back-to-back paired protocol history (rounds 2-4): kept "
            "verbatim. The per-core calibration (this file, "
            "percore_calibration) measured why its reading depends on "
            "ambient host load — on an idle box 2 busy cores hold ~1.8x "
            "the per-core random-access throughput of 8 busy cores "
            "(shared LLC/memory latency), an asymmetry a real N->4N "
            "fleet of separate machines never pays and which the "
            "simultaneous protocol cancels by construction."
        ),
        "round3_calm_campaign": {
            "scaling_efficiency": prev.get("scaling_efficiency")
            if prev else None,
            "pairs": prev.get("pairs") if prev else None,
            "calm_window": prev.get("calm_window") if prev else None,
            "context_md": prev.get("context_md") if prev else None,
        } if prev else None,
        "round4_back_to_back_attempts": (
            b2b_r4.get("attempts")[13:] if b2b_r4 else None
        ),
        "round4_partition_diagnostics": {
            "P32_back_to_back": load(os.path.join(S, "bank_r4",
                                                  "attempts.json")),
            "P64_back_to_back": load(os.path.join(S,
                                                  "diag_P64_base.json")),
            "P32_simultaneous_partial_overlap": load(
                os.path.join(S, "diag_simul_P32.json")),
        },
    }
    # strip bulky raw legs from the partial-overlap diag
    d = history["round4_partition_diagnostics"][
        "P32_simultaneous_partial_overlap"]
    if d:
        d.pop("lo_raw", None)
        d.pop("hi_raw", None)
    d2 = history["round4_partition_diagnostics"]["P32_back_to_back"]
    if d2:
        # keep only this round's new attempt(s)
        d2["attempts"] = d2["attempts"][13:]

    if conv:
        for p in conv.get("pairs", []):
            p.pop("lo_raw", None)

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
        "percore_calibration": calib,
        "convergence_pairs_1e9": conv,
        "resume_check_4N": resume,
        "cluster_reexchange": reex,
        "back_to_back_history": history,
    }
    if args.context_md:
        result["context_md"] = args.context_md
    if args.probe_out and os.path.exists(simul.get("probe_trace", "")):
        import shutil
        shutil.copyfile(simul["probe_trace"], args.probe_out)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in (
        "scaling_efficiency", "scaling_efficiency_all_attempts_median",
        "repeats", "pass", "pass_protocol_free")}))


if __name__ == "__main__":
    main()
