#!/usr/bin/env python
"""Finish the scaling artifact after the median-of-5 protocol run:

1. Convergence leg — PageRank to 1e-6 L∞ at the 4N level on the same
   input (records converged_at + supersteps/hour including the stats
   action).
2. Resume leg — mid-run interruption + fresh-process resume from
   CheckpointStore snapshots at the 4N level; final ranks must agree to
   1e-6 (north-rule resumability at bench scale, VERDICT r1 #8).
3. Merge both into BENCH_SCALING.json and regenerate BASELINE.md §4 from
   that exact JSON (tools/update_baseline_md.py).

Usage: python tools/finish_scaling.py [BENCH_SCALING.json]
Reads the protocol parameters (mode, fixed_partitions, input, levels)
from the JSON itself so the legs match the committed run bit-for-bit.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo/tools")
import bench_scaling as bs


def main() -> None:
    jpath = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_SCALING.json"
    with open(jpath) as f:
        d = json.load(f)

    bs.MODE = d.get("mode", "local")
    bs.FIXED_PARTITIONS = d.get("fixed_partitions")
    edges_path = d["input"]["edges_parquet"]
    n4 = d["level_4N"]["cores"] if bs.MODE == "local" else d["level_4N"]["units"]
    steps = d["fixed_supersteps"]

    if not d.get("convergence_run_4N"):
        print("convergence leg (tol 1e-6 at 4N)...", file=sys.stderr)
        d["convergence_run_4N"] = bs.run_level(n4, edges_path, 100, tol=1e-6)
        with open(jpath, "w") as f:
            json.dump(d, f, indent=2)
        print(
            f"converged at {d['convergence_run_4N'].get('converged_at')}, "
            f"{d['convergence_run_4N'].get('supersteps_per_hour')} steps/h",
            file=sys.stderr,
        )

    if not d.get("resume_check_4N"):
        print("resume leg (interrupt + fresh-process resume at 4N)...",
              file=sys.stderr)
        d["resume_check_4N"] = bs.resume_check(
            n4, edges_path, steps,
            interrupt_at=max(2, steps * 6 // 10), ckpt_every=3,
        )
        with open(jpath, "w") as f:
            json.dump(d, f, indent=2)
        r = d["resume_check_4N"]
        print(
            f"resume: from={r['resumed_from']} maxdiff={r['max_abs_rank_diff']:.2e} "
            f"allclose={r['allclose_1e6']}",
            file=sys.stderr,
        )

    subprocess.run(
        [sys.executable, "/root/repo/tools/update_baseline_md.py", jpath],
        check=True,
    )
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
