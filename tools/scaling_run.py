#!/usr/bin/env python
"""One scaling-protocol data point: PageRank on a pre-built edge table at a
given local[<cores>] parallelism.  Run as a subprocess by bench_scaling.py
(one JVM per parallelism level).

Usage: python tools/scaling_run.py <cores> <edges_parquet> <supersteps> [tol]

Prints one JSON line:
  {"cores": N, "supersteps": k, "wall_s": ..., "supersteps_per_hour": ...,
   "tol_mode": bool, "converged_at": k|null}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pregel_rs_spark import GraphFrame
from pregel_rs_spark.algorithms import pagerank
from pregel_rs_spark.sources.io import get_spark


def main() -> None:
    cores = int(sys.argv[1])
    edges_path = sys.argv[2]
    supersteps = int(sys.argv[3])
    tol = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    edges = spark.read.parquet(edges_path)
    g = GraphFrame.from_edges(edges)
    # warm: materialize degrees + one full pass so JIT/read are not timed
    g.vertices.count()

    t0 = time.monotonic()
    # tol<=0 → fixed-superstep throughput mode: no convergence tolerance,
    # so the engine skips the per-superstep stats action when it can.
    res = pagerank(g, tol=(tol if tol > 0 else None), max_iterations=supersteps)
    res.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    metrics = getattr(res, "pregel_metrics", [])
    steps = len(metrics)
    loop_s = sum(m.wall_seconds for m in metrics)
    converged = None
    if tol > 0 and metrics and metrics[-1].delta is not None \
            and metrics[-1].delta <= tol:
        converged = steps
    print(
        json.dumps(
            {
                "cores": cores,
                "supersteps": steps,
                # wall_s includes one-time prep (degree derivation, edge
                # cache build, superstep-0 init) + the result write;
                # supersteps/hour uses the in-loop superstep time, which is
                # what amortizes at real run lengths.
                "wall_s": round(wall, 2),
                "loop_s": round(loop_s, 2),
                "supersteps_per_hour": round(steps / (loop_s / 3600.0), 1),
                "sec_per_superstep": round(loop_s / max(steps, 1), 3),
                "tol_mode": tol > 0,
                "converged_at": converged,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
