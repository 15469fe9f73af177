#!/usr/bin/env python
"""Rebuild a calm-campaign bank from the committed BENCH_SCALING.json so
``tools/calm_scaling.py --resume`` can extend a prior round's campaign
after /tmp was wiped between rounds.

Every reconstructed number comes from the committed artifact: rejected
attempts are stored verbatim there; accepted pairs are stored in the
``pairs`` table with their probe medians (per-sample counts/minima of the
old probe windows are gone — ``verdicts()`` only uses the median, so the
acceptance rule recomputes identically).

Usage: python tools/restore_scaling_bank.py [bench_scaling.json] [bank_dir]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_SCALING.json"
    bank = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark_graft_scaling/bank_r4"
    )
    with open(src) as f:
        d = json.load(f)
    cw = d["calm_window"]
    attempts = []
    for a in cw["rejected_attempts"]:
        attempts.append(dict(a))
    for p in d["pairs"]:
        attempts.append(
            {
                "attempt": p["attempt"],
                "order": p["order"],
                "gate_probe_gbps": None,
                "N_sec_per_superstep": p["N_sec_per_superstep"],
                "4N_sec_per_superstep": p["4N_sec_per_superstep"],
                "efficiency": p["efficiency"],
                "probe_N": {"n": None, "median_gbps": p["probe_N_gbps"],
                            "min_gbps": None},
                "probe_4N": {"n": None, "median_gbps": p["probe_4N_gbps"],
                             "min_gbps": None},
                "calm": True,  # recomputed by verdicts() on resume
            }
        )
    attempts.sort(key=lambda a: a["attempt"])
    os.makedirs(bank, exist_ok=True)
    out = os.path.join(bank, "attempts.json")
    with open(out, "w") as f:
        json.dump(
            {"ref_gbps": cw["calibration_ref_gbps"], "attempts": attempts}, f
        )
    print(
        f"restored {len(attempts)} attempts "
        f"(ref {cw['calibration_ref_gbps']} GB/s) -> {out}"
    )


if __name__ == "__main__":
    main()
