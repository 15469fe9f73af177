#!/usr/bin/env python
"""Measure what the bucketed edge store buys the Pregel loop at bench
scale: PageRank (fixed supersteps) over the SAME 36M-edge input, once
from a plain parquet scan (the loop pays its startup edge
repartition+sort+persist) and once from the bucketed table with
``prepartitioned_edges=True`` (the write-time layout already matches the
loop's ``HashPartitioning(subject, P)``, so the startup exchange is
skipped).

Steady-state supersteps are expected to be equal — the layout changes
WHERE the edge shuffle happens (write time, once ever, vs job start,
every run), not the per-superstep plan.  The win is the startup leg:
job-start wall to loop-ready.  On a 100 TB table that startup exchange
is the single largest shuffle in the job and is paid by EVERY analytics
run against the graph; bucketing amortizes it to one write.

Both legs run in ONE session (the default in-memory catalog holds the
bucket spec; a metastore/Iceberg catalog plays that role on a cluster)
with ``spark.catalog.clearCache()`` between them; ``--order`` swaps leg
order so a drift-suspicious result can be cross-checked.

Usage:
  PYTHONPATH=/root/repo python tools/bench_bucketed.py \
      [--edges /tmp/spark_graft_scaling/edges_n6000000_lf6_seed42.parquet] \
      [--steps 6] [--cores 8] [--buckets 32] [--order plain-first] \
      [--out /tmp/bench_bucketed.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_leg(spark, edges_path: str, steps: int, bucketed: bool,
            table: str) -> dict:
    from pregel_rs_spark import GraphFrame
    from pregel_rs_spark.algorithms import pagerank
    from pregel_rs_spark.sources.bucketed import read_bucketed

    spark.catalog.clearCache()
    t0 = time.monotonic()
    if bucketed:
        edges = read_bucketed(spark, table)
    else:
        edges = spark.read.parquet(edges_path)
    g = GraphFrame.from_edges(edges)
    res = pagerank(
        g, tol=0.0, max_iterations=steps, prepartitioned_edges=bucketed,
    )
    res.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    per_step = [m.wall_seconds for m in res.pregel_metrics]
    steady = sorted(per_step[1:])
    return {
        "bucketed": bucketed,
        "wall_s": round(wall, 2),
        "per_step_walls": [round(w, 2) for w in per_step],
        # startup = everything outside steady supersteps 2..k (scan,
        # degree derivation, edge exchange, superstep-0 init, superstep 1)
        "startup_s": round(wall - sum(per_step[1:]), 2),
        "steady_median_s": round(steady[len(steady) // 2], 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--edges",
        default="/tmp/spark_graft_scaling/edges_n6000000_lf6_seed42.parquet",
    )
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--table", default="bench_edges_bucketed")
    ap.add_argument("--warehouse", default="/tmp/spark_graft_bucketed_bench")
    ap.add_argument("--order", choices=["plain-first", "bucketed-first"],
                    default="plain-first")
    ap.add_argument("--out", default="/tmp/bench_bucketed.json")
    args = ap.parse_args()

    from pregel_rs_spark.sources.bucketed import write_bucketed_edges
    from pregel_rs_spark.sources.io import get_spark

    spark = get_spark("bench-bucketed", cores=args.cores,
                      shuffle_partitions=args.buckets)
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"input": args.edges, "steps": args.steps,
                    "cores": args.cores, "buckets": args.buckets,
                    "order": args.order}
    t0 = time.monotonic()
    write_bucketed_edges(
        spark.read.parquet(args.edges), args.table,
        buckets=args.buckets, path=args.warehouse,
    )
    result["bucketed_write_s"] = round(time.monotonic() - t0, 2)

    legs = [False, True] if args.order == "plain-first" else [True, False]
    for b in legs:
        leg = run_leg(spark, args.edges, args.steps, b, args.table)
        result["bucketed_leg" if b else "plain"] = leg
    result["startup_saving_s"] = round(
        result["plain"]["startup_s"] - result["bucketed_leg"]["startup_s"], 2
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
