#!/usr/bin/env python
"""Quantify the multi-executor state re-exchange cost (VERDICT r3 item 7):
one paired comparison at the 6M-page bench scale between

  * ``local[8]``               — single JVM, 8 cores (the gate protocol's
                                 4N level; state blocks stay in-process)
  * ``local-cluster[2,4,8g]``  — 2 REAL executor JVMs × 4 cores (netty
                                 shuffle between processes; the engine's
                                 ``preserve_partitioning=False`` branch
                                 re-exchanges vertex state every superstep)

Same edges, same fixed partitions, same total cores, run back-to-back in
one host window.  The delta in sec/superstep IS the per-superstep price of
the cluster-mode state re-exchange + process-boundary shuffle at this
scale — the number docs/SCALING_NOTES.md's cost model cites.

Run ONLY with the box otherwise idle.  Writes
/tmp/spark_graft_scaling/reexchange_r4.json and prints a markdown row.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from calm_scaling import run_leg  # noqa: E402

SCRATCH = "/tmp/spark_graft_scaling"
EDGES = os.path.join(SCRATCH, "edges_n6000000_lf6_seed42.parquet")
STEPS = 6
PARTS = 32


def main() -> None:
    t0 = time.time()
    single = run_leg(8, EDGES, STEPS, PARTS)
    cluster = run_leg(
        2, EDGES, STEPS, PARTS,
        extra=["--master-mode", "local-cluster", "--cores-per-executor",
               "4", "--executor-mem-mb", "8192"],
    )
    s, c = (single["sec_per_superstep_median_step"],
            cluster["sec_per_superstep_median_step"])
    out = {
        "protocol": (
            "back-to-back single host window; local[8] (1 JVM, 8 cores) "
            "vs local-cluster[2,4,8g] (2 executor JVMs x 4 cores, netty "
            "shuffle, per-superstep state re-exchange); same 119.8M-edge "
            f"input, {STEPS} supersteps, {PARTS} fixed partitions"
        ),
        "single_jvm_local8": single,
        "cluster_2x4": cluster,
        "sec_per_superstep_single": s,
        "sec_per_superstep_cluster": c,
        "reexchange_overhead_pct": round(100.0 * (c - s) / s, 1),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(SCRATCH, "reexchange_r4.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(
        f"| local[8] single JVM | {s} |\n"
        f"| local-cluster[2,4,8g] | {c} | "
        f"(+{out['reexchange_overhead_pct']}%)"
    )


if __name__ == "__main__":
    main()
