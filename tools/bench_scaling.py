#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors; sandbox protocol per BASELINE.md §3).

1. Build (once, parquet-cached) a deterministic Common-Crawl-style edge
   table: synth_pages(n, seed=42) → pages_to_edges (href extraction via
   pandas UDFs, xxhash64 ids) → (subject, object) parquet.
2. Run the IDENTICAL PageRank job (fixed superstep count — same work at both
   levels) via tools/scaling_run.py in a fresh JVM at local[N] and local[4N],
   shuffle partitions matched to the core count.
3. Report supersteps/hour at both + efficiency = (thr_4N / thr_N) / 4, and a
   to-1e-6 convergence run at 4N for the supersteps-to-convergence number.

Usage: python tools/bench_scaling.py [--pages 1500000] [--steps 10]
       [--n-cores 8] [--out /root/repo/BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

SCRATCH = "/tmp/spark_graft_scaling"


def build_edges(n_pages: int, link_factor: int = 1) -> str:
    path = os.path.join(SCRATCH, f"edges_n{n_pages}_lf{link_factor}_seed42.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    sys.path.insert(0, "/root/repo")
    from pregel_rs_spark.functions.extract import pages_to_edges
    from pregel_rs_spark.sources.io import get_spark
    from pregel_rs_spark.sources.synth import synth_pages

    spark = get_spark("edge-build", cores=24, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages(
        spark, n_pages, seed=42, partitions=96, link_factor=link_factor
    )
    edges = pages_to_edges(pages).select("subject", "object").distinct()
    edges.repartition(64).write.mode("overwrite").parquet(path)
    n_edges = spark.read.parquet(path).count()
    print(f"built {n_edges} edges from {n_pages} pages -> {path}", file=sys.stderr)
    spark.stop()
    return path


def run_level(cores: int, edges_path: str, steps: int, tol: float = 0.0) -> dict:
    cmd = [
        sys.executable,
        "/root/repo/tools/scaling_run.py",
        str(cores),
        edges_path,
        str(steps),
        str(tol),
    ]
    env = dict(os.environ)
    # local mode hosts driver + executor in one JVM; size the heap for the
    # cached edge table + two checkpointed states at 100M+ edge scale
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, check=True, env=env
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_500_000)
    ap.add_argument("--link-factor", type=int, default=6,
                    help="synth out-degree scale (6 -> mean ~16 links/page)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--n-cores", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3,
                    help="alternating repeats per level; min wall taken "
                         "(this shared host shows 2-3x noisy-neighbor drift)")
    ap.add_argument("--out", default="/root/repo/BENCH_SCALING.json")
    ap.add_argument("--skip-convergence", action="store_true")
    args = ap.parse_args()

    os.makedirs(SCRATCH, exist_ok=True)
    edges_path = build_edges(args.pages, args.link_factor)

    n, n4 = args.n_cores, args.n_cores * 4
    # Alternate levels across repeats so slow-host windows hit both levels
    # evenly; take the minimum wall per level (the least-interference
    # estimate of the machine's actual capability).
    lo_runs, hi_runs = [], []
    for r in range(args.repeats):
        lo_runs.append(run_level(n, edges_path, args.steps))
        hi_runs.append(run_level(n4, edges_path, args.steps))
        print(
            f"repeat {r}: N={lo_runs[-1]['sec_per_superstep']}s/step "
            f"4N={hi_runs[-1]['sec_per_superstep']}s/step",
            file=sys.stderr,
        )
    lo = min(lo_runs, key=lambda x: x["wall_s"])
    hi = min(hi_runs, key=lambda x: x["wall_s"])
    eff = (hi["supersteps_per_hour"] / lo["supersteps_per_hour"]) / 4.0

    conv = None
    if not args.skip_convergence:
        conv = run_level(n4, edges_path, 100, tol=1e-6)

    result = {
        "protocol": "BASELINE.md §3 (same job, same input, local[N] vs local[4N]); "
                    "min wall over alternating repeats per level",
        "input": {"pages": args.pages, "seed": 42, "edges_parquet": edges_path},
        "fixed_supersteps": args.steps,
        "repeats": args.repeats,
        "level_N": lo,
        "level_4N": hi,
        "all_runs": {
            "N_sec_per_superstep": [r["sec_per_superstep"] for r in lo_runs],
            "4N_sec_per_superstep": [r["sec_per_superstep"] for r in hi_runs],
        },
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "convergence_run_4N": conv,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
