#!/usr/bin/env python
"""Sequential probe-gated to-tolerance legs (tol 1e-9) at BOTH levels.

The round-3 concurrent conv legs (tools/run_conv_resume_r3.py phase A)
share one host window by construction, but concurrent memory-bandwidth
sharing taxes the wider level more, so their cross-level ratio is not a
scaling measurement (BASELINE.md §4 says so).  This tool produces the
defensible version: the two legs run SEQUENTIALLY back-to-back (4N first,
then N), inside one probe-gated calm window, with the same ambient
STREAM-triad probe as the calm campaign recording each leg's window.

Run ONLY when tools/calm_scaling.py is not running (both pin from core 0
and both read the host's bandwidth).

Writes conv_lo_1e9_seq.json / conv_hi_1e9_seq.json into the scratch dir;
pass them to tools/assemble_calm.py --conv-lo/--conv-hi.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from calm_scaling import (  # noqa: E402
    GATE_FRAC,
    PROBE_CORE,
    SCRATCH,
    probe_window,
    recent_probe_median,
    run_leg,
)

EDGES = os.path.join(SCRATCH, "edges_n6000000_lf6_seed42.parquet")
MAX_GATE_WAIT_S = 1800.0


def main() -> None:
    trace = os.path.join(SCRATCH, "conv_seq_probe.jsonl")
    if os.path.exists(trace):
        os.remove(trace)
    probe = subprocess.Popen(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "ambient_probe.py"),
         trace, "--core", str(PROBE_CORE)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # calibration ref: reuse the campaign's idle-box reference so a
        # noisy window can't silently loosen the gate
        ref = None
        bank_json = os.path.join(SCRATCH, "bank_r3", "attempts.json")
        if os.path.exists(bank_json):
            with open(bank_json) as f:
                ref = json.load(f).get("ref_gbps")
        time.sleep(66)
        fresh = recent_probe_median(trace, 64)
        if ref is None:
            ref = fresh
        print(f"ref={ref} fresh={fresh}", file=sys.stderr)

        waited = 0.0
        while True:
            m = recent_probe_median(trace)
            if m is not None and m >= GATE_FRAC * ref:
                break
            if waited >= MAX_GATE_WAIT_S:
                print(f"gate wait capped ({waited}s, probe {m}); running "
                      "anyway — probe stats recorded", file=sys.stderr)
                break
            time.sleep(60)
            waited += 60

        legs = {}
        for units, tag in ((8, "hi"), (2, "lo")):
            legs[tag] = run_leg(units, EDGES, 100, 32, tol=1e-9)
            p = probe_window(trace, legs[tag]["t_wall_start"],
                             legs[tag]["t_wall_end"])
            legs[tag]["probe"] = p
            legs[tag]["note"] = (
                "1e-9 L∞ tolerance; sequential back-to-back pair in one "
                f"probe-gated window (ambient probe median "
                f"{p['median_gbps']} GB/s during this leg)"
            )
            with open(os.path.join(SCRATCH,
                                   f"conv_{tag}_1e9_seq.json"), "w") as f:
                json.dump(legs[tag], f)
            print(f"{tag}: converged_at={legs[tag].get('converged_at')} "
                  f"{legs[tag].get('supersteps_per_hour')} steps/h "
                  f"probe={p['median_gbps']}", file=sys.stderr)

        key = "sec_per_superstep_median_step"
        eff = round(legs["lo"][key] / (4.0 * legs["hi"][key]), 3)
        print(f"sequential to-tolerance efficiency: {eff}", file=sys.stderr)
    finally:
        probe.terminate()


if __name__ == "__main__":
    main()
