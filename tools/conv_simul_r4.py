#!/usr/bin/env python
"""Paired 1e-9 to-tolerance legs under the round-4 SIMULTANEOUS protocol
(VERDICT r3 item 8: fold the convergence-length metric into the paired
protocol with real statistical weight).

Each pair: the N leg (local[2], cores [0,2)) runs PageRank to tol=1e-9;
the 4N side (local[8], cores [8,16)) runs BACK-TO-BACK to-tolerance runs
in a loop until the N leg finishes, so every N superstep executes while
8 more cores are busy — the same identical-host-state control as
tools/simul_scaling.py.  Pair efficiency = N median-step / (4 × median
over all overlapping 4N runs' median-steps); convergence supersteps are
recorded per leg (both levels must converge at the same superstep — the
engine is deterministic).

Writes conv_simul_pairs.json into the scratch dir for
tools/assemble_r4.py.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import threading
import time

SCRATCH = "/tmp/spark_graft_scaling"
EDGES = os.path.join(SCRATCH, "edges_n6000000_lf6_seed42.parquet")
KEY = "sec_per_superstep_median_step"


def leg(units: int, steps: int, tol: float, offset: int) -> dict:
    cmd = [
        sys.executable, "/root/repo/tools/scaling_run.py",
        str(units), EDGES, str(steps), str(tol),
        "--master-mode", "local", "--fixed-partitions", "32",
        "--pin-offset", str(offset),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-1500:])
    return json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )


def one_pair(max_steps: int, tol: float) -> dict:
    res: dict = {"hi_runs": []}
    lo_done = threading.Event()

    def lo_thread():
        try:
            res["lo"] = leg(2, max_steps, tol, 0)
        finally:
            lo_done.set()

    def hi_thread():
        # loop 4N conv runs until the N leg finishes; every run that
        # STARTS before lo finishes counts as overlapping
        while not lo_done.is_set():
            run = leg(8, max_steps, tol, 8)
            res["hi_runs"].append(run)

    t1 = threading.Thread(target=lo_thread)
    t2 = threading.Thread(target=hi_thread)
    t1.start(); t2.start(); t1.join(); t2.join()
    lo = res["lo"]
    his = res["hi_runs"]
    hi_med = statistics.median(r[KEY] for r in his)
    return {
        "N_sec_per_superstep": lo[KEY],
        "4N_sec_per_superstep": round(hi_med, 3),
        "4N_runs": len(his),
        "efficiency": round(lo[KEY] / (4.0 * hi_med), 3),
        "converged_at_N": lo.get("converged_at"),
        "converged_at_4N": [r.get("converged_at") for r in his],
        "N_supersteps_per_hour": lo.get("supersteps_per_hour"),
        "4N_supersteps_per_hour": round(3600.0 / hi_med, 1),
        "lo_raw": lo,
        "hi_raw_medians": [r[KEY] for r in his],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--max-steps", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(SCRATCH,
                                                  "conv_simul_pairs.json"))
    args = ap.parse_args()
    pairs = []
    for i in range(args.pairs):
        p = one_pair(args.max_steps, args.tol)
        p["pair"] = i
        pairs.append(p)
        print(f"pair {i}: N={p['N_sec_per_superstep']} "
              f"4N={p['4N_sec_per_superstep']} eff={p['efficiency']} "
              f"conv@N={p['converged_at_N']}", file=sys.stderr)
    out = {
        "protocol": (
            "1e-9 to-tolerance pairs under the SIMULTANEOUS protocol: the "
            "N leg converges while the 4N side loops back-to-back "
            "to-tolerance runs on its disjoint core block, so both levels "
            "run under one identical busy-core host state; pair "
            "efficiency = N median-step / (4 x median over overlapping "
            "4N runs)"
        ),
        "tol": args.tol,
        "pairs": pairs,
        "efficiency_median": round(
            statistics.median(p["efficiency"] for p in pairs), 3
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"efficiency_median": out["efficiency_median"],
                      "pairs": len(pairs)}))


if __name__ == "__main__":
    main()
