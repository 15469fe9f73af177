#!/usr/bin/env python
"""One scaling-protocol data point: PageRank on a pre-built edge table at a
given local[<cores>] parallelism.  Run as a subprocess by bench_scaling.py
(one fresh JVM per data point — the in-sandbox analogue of one cluster
size / one job submission).

Modes:
  * plain      — fixed-superstep (or to-tolerance) throughput run
  * checkpoint — same, but writing CheckpointStore snapshots every
                 --ckpt-every supersteps to --ckpt-root (reliable-store
                 cadence at bench scale)
  * resume     — continue a previous checkpointed run mid-iteration
                 (--resume) to the full superstep count in a FRESH process,
                 evidencing the north rule's mid-run resumability

Prints one JSON line:
  {"cores": N, "supersteps": k, "wall_s": ..., "supersteps_per_hour": ...,
   "sec_per_superstep": ..., "tol_mode": bool, "converged_at": k|null,
   "resumed_from": k|null}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pregel_rs_spark import GraphFrame
from pregel_rs_spark.algorithms import pagerank
from pregel_rs_spark.sources.io import get_spark

CKPT_TOKEN = "scaling-pagerank-d0.85"  # config hash shared across legs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cores", type=int)
    ap.add_argument("edges_parquet")
    ap.add_argument("supersteps", type=int)
    ap.add_argument("tol", type=float, nargs="?", default=0.0)
    ap.add_argument("--ckpt-root", default=None)
    ap.add_argument("--ckpt-every", type=int, default=3)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ranks-out", default=None,
                    help="write final (vertex_id, rank) parquet here")
    args = ap.parse_args()

    spark = get_spark(
        f"scaling-{args.cores}", cores=args.cores,
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = spark.read.parquet(args.edges_parquet)
    g = GraphFrame.from_edges(edges)
    # warm: materialize degrees + one full pass so JIT/read are not timed
    g.vertices.count()

    store = None
    resumed_from = None
    if args.ckpt_root:
        from pregel_rs_spark.plans.checkpoint import CheckpointStore

        store = CheckpointStore(spark, args.ckpt_root, config_token=CKPT_TOKEN)
        if args.resume:
            latest = store.latest()
            resumed_from = latest[0] if latest else None

    t0 = time.monotonic()
    # tol<=0 → fixed-superstep throughput mode: no convergence tolerance,
    # so the engine skips the per-superstep stats action when it can.
    res = pagerank(
        g,
        tol=(args.tol if args.tol > 0 else None),
        max_iterations=args.supersteps,
        checkpoint_store=store,
        checkpoint_every=args.ckpt_every,
        resume=args.resume,
    )
    if args.ranks_out:
        res.select("vertex_id", "rank").write.mode("overwrite").parquet(
            args.ranks_out
        )
    else:
        res.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    metrics = getattr(res, "pregel_metrics", [])
    steps = len(metrics)
    loop_s = sum(m.wall_seconds for m in metrics)
    converged = None
    if args.tol > 0 and metrics and metrics[-1].delta is not None \
            and metrics[-1].delta <= args.tol:
        converged = metrics[-1].superstep
    print(
        json.dumps(
            {
                "cores": args.cores,
                "supersteps": steps,
                # wall_s includes one-time prep (degree derivation, edge
                # cache build, superstep-0 init) + the result write;
                # supersteps/hour uses the in-loop superstep time, which is
                # what amortizes at real run lengths.
                "wall_s": round(wall, 2),
                "loop_s": round(loop_s, 2),
                "supersteps_per_hour": round(steps / (loop_s / 3600.0), 1)
                if steps else None,
                "sec_per_superstep": round(loop_s / max(steps, 1), 3),
                "tol_mode": args.tol > 0,
                "converged_at": converged,
                "resumed_from": resumed_from,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
