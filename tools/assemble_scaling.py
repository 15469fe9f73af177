#!/usr/bin/env python
"""Assemble BENCH_SCALING.json from banked per-leg scaling_run outputs.

Same artifact schema as tools/bench_scaling.py, for runs where the legs
were executed (and banked to disk) individually — e.g. when a round
boundary forces committing whatever repeats have completed, instead of
losing an in-flight multi-repeat run that only writes at the very end.

Usage: python tools/assemble_scaling.py LEG_N.json... --hi LEG_4N.json...
       [--out /root/repo/BENCH_SCALING.json] [--note "..."]
"""

from __future__ import annotations

import argparse
import json
import statistics


def load(paths: list[str]) -> list[dict]:
    runs = []
    for p in paths:
        with open(p) as f:
            line = [l for l in f.read().splitlines() if l.startswith("{")][-1]
        runs.append(json.loads(line))
    return runs


def pick(runs: list[dict]) -> dict:
    key = "sec_per_superstep_median_step"
    srt = sorted(runs, key=lambda r: r[key])
    med = dict(srt[len(srt) // 2])
    med["steady_all"] = [r[key] for r in runs]
    med["steady_median"] = round(statistics.median(r[key] for r in runs), 3)
    med["steady_min"] = min(r[key] for r in runs)
    med["steady_max"] = max(r[key] for r in runs)
    med["mean_all"] = [r["sec_per_superstep"] for r in runs]
    return med


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lo", nargs="+", help="N-level leg JSON files")
    ap.add_argument("--hi", nargs="+", required=True)
    ap.add_argument("--out", default="/root/repo/BENCH_SCALING.json")
    ap.add_argument("--pages", type=int, default=6_000_000)
    ap.add_argument("--link-factor", type=int, default=6)
    ap.add_argument("--edges", default="/tmp/spark_graft_scaling/"
                    "edges_n6000000_lf6_seed42.parquet")
    ap.add_argument("--note", default="")
    ap.add_argument("--convergence", default=None,
                    help="optional convergence-leg JSON file")
    ap.add_argument("--resume-json", default=None,
                    help="optional resume-check JSON file")
    ap.add_argument("--fixed-partitions", type=int, default=None,
                    help="partition count the banked legs were run with "
                         "(scaling_run --fixed-partitions); recorded in the "
                         "artifact so BASELINE.md §4 states it correctly")
    ap.add_argument("--context-md", default=None,
                    help="verbatim markdown paragraph carried in the JSON "
                         "and rendered at the end of BASELINE.md §4 "
                         "(honest run context, stays with the artifact)")
    ap.add_argument("--orders", default=None,
                    help="comma-separated within-pair run order per repeat "
                         "(e.g. 'N->4N,4N->N,...') for the report table")
    args = ap.parse_args()

    lo_runs, hi_runs = load(args.lo), load(args.hi)
    # zip() would silently truncate a lopsided bank and the paired-gate
    # median would cover a subset of pairs while the level medians use all
    # runs — refuse instead of producing an internally inconsistent artifact
    if len(lo_runs) != len(hi_runs):
        raise SystemExit(
            f"unpaired bank: {len(lo_runs)} lo legs vs {len(hi_runs)} hi "
            "legs — every repeat needs both legs (lo_R.json AND hi_R.json)"
        )
    if args.orders and len(args.orders.split(",")) > len(lo_runs):
        raise SystemExit("--orders lists more pairs than the bank holds")
    lo, hi = pick(lo_runs), pick(hi_runs)
    n, n4 = lo["cores"], hi["cores"]
    thr_lo = 3600.0 / lo["steady_median"]
    thr_hi = 3600.0 / hi["steady_median"]
    eff_level = (thr_hi / thr_lo) / 4.0
    # paired gate (same as bench_scaling.py): legs banked as lo_R/hi_R are
    # index-paired back-to-back runs; the per-pair ratio cancels the host
    # window's common speed factor
    key = "sec_per_superstep_median_step"
    orders = args.orders.split(",") if args.orders else []
    pairs = [
        {"repeat": i,
         **({"order": orders[i]} if i < len(orders) else {}),
         "N_sec_per_superstep": l[key],
         "4N_sec_per_superstep": h[key],
         "efficiency": round(l[key] / (4.0 * h[key]), 3)}
        for i, (l, h) in enumerate(zip(lo_runs, hi_runs))
    ]
    eff = statistics.median(p["efficiency"] for p in pairs)

    conv = load([args.convergence])[0] if args.convergence else None
    resume = None
    if args.resume_json:
        with open(args.resume_json) as f:
            resume = json.load(f)

    result = {
        "protocol": (
            f"BASELINE.md §3: same job, same input, local[{n}] vs "
            f"local[{n4}], whole job (driver python + JVM, every thread) "
            "pinned to exactly that many cores. PAIRED design: per-pair "
            "efficiency = sec_N / (4*sec_4N) over index-paired "
            "back-to-back legs; gate = MEDIAN of per-pair efficiencies. "
            "Per-run number = steady-state sec/superstep (per-step median "
            "within the run)"
            + (f". {args.note}" if args.note else "")
        ),
        "mode": "local",
        "input": {"pages": args.pages, "link_factor": args.link_factor,
                  "seed": 42, "edges_parquet": args.edges},
        "fixed_supersteps": lo_runs[0]["supersteps"],
        "fixed_partitions": args.fixed_partitions,
        "repeats": len(lo_runs),
        "pairs": pairs,
        "level_N": lo,
        "level_4N": hi,
        "throughput_N_supersteps_per_hour": round(thr_lo, 1),
        "throughput_4N_supersteps_per_hour": round(thr_hi, 1),
        "all_runs": {
            "N_steady_sec_per_superstep":
                [r["sec_per_superstep_median_step"] for r in lo_runs],
            "4N_steady_sec_per_superstep":
                [r["sec_per_superstep_median_step"] for r in hi_runs],
        },
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_level_median": round(eff_level, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "convergence_run_4N": conv,
        "resume_check_4N": resume,
        **({"context_md": args.context_md} if args.context_md else {}),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in (
        "scaling_efficiency", "pass", "repeats",
        "throughput_N_supersteps_per_hour",
        "throughput_4N_supersteps_per_hour")}, indent=2))


if __name__ == "__main__":
    main()
