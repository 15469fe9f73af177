#!/usr/bin/env python
"""Convergence + mid-run-resume legs for BENCH_SCALING, run CONCURRENTLY on
disjoint pinned core blocks (convergence on cores [0,8), the resume triple
on cores [8,16)) — neither number is the scaling gate (those are the paired
efficiency legs), so sharing the host between them only costs their absolute
wall clock, honestly reported.

Writes conv_4n.json and resume_4n.json into the scratch dir for
tools/finish_r2_assembly.sh / assemble_scaling.py --convergence/--resume-json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading

sys.path.insert(0, "/root/repo")

SCRATCH = "/tmp/spark_graft_scaling"
EDGES = os.path.join(SCRATCH, "edges_n6000000_lf6_seed42.parquet")


def leg(units, steps, tol, offset, extra=None):
    cmd = [
        sys.executable, "/root/repo/tools/scaling_run.py",
        str(units), EDGES, str(steps), str(tol),
        "--master-mode", "local", "--fixed-partitions", "32",
        "--pin-offset", str(offset),
    ] + (extra or [])
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "24g")
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=3600, check=True, env=env)
    return json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1])


def convergence(out: dict) -> None:
    out["conv"] = leg(8, 100, 1e-6, 0)


def resume_triple(out: dict) -> None:
    import duckdb

    root = os.path.join(SCRATCH, "resume_check")
    shutil.rmtree(root, ignore_errors=True)
    full_ranks = os.path.join(root, "ranks_full")
    res_ranks = os.path.join(root, "ranks_resumed")
    ck_full = os.path.join(root, "ck_full")
    ck_int = os.path.join(root, "ck_interrupted")
    steps, interrupt_at, ckpt_every = 6, 3, 3

    full = leg(8, steps, 0.0, 8,
               ["--ckpt-root", ck_full, "--ckpt-every", str(ckpt_every),
                "--ranks-out", full_ranks])
    interrupted = leg(8, interrupt_at, 0.0, 8,
                      ["--ckpt-root", ck_int, "--ckpt-every",
                       str(ckpt_every)])
    resumed = leg(8, steps, 0.0, 8,
                  ["--ckpt-root", ck_int, "--ckpt-every", str(ckpt_every),
                   "--resume", "--ranks-out", res_ranks])
    row = duckdb.sql(
        f"""
        SELECT max(abs(a.rank - b.rank)) AS d, count(*) AS n,
               (SELECT count(*) FROM '{full_ranks}/*.parquet') AS na,
               (SELECT count(*) FROM '{res_ranks}/*.parquet') AS nb
        FROM '{full_ranks}/*.parquet' a
        JOIN '{res_ranks}/*.parquet' b USING (vertex_id)
        """
    ).fetchone()
    d, joined, na, nb = float(row[0]), int(row[1]), int(row[2]), int(row[3])
    out["resume"] = {
        "executors": 8, "supersteps": steps,
        "interrupted_at": interrupt_at, "ckpt_every": ckpt_every,
        "resumed_from": resumed.get("resumed_from"),
        "resumed_supersteps_run": resumed["supersteps"],
        "vertices": joined,
        "rows_match": joined == na == nb,
        "max_abs_rank_diff": d,
        "allclose_1e6": d <= 1e-6 and joined == na == nb,
        "full_run": full, "interrupted_run": interrupted,
        "resumed_run": resumed,
        "note": "ran concurrently with the convergence leg on a disjoint "
                "pinned core block; equality check is wall-time-independent",
    }


def main() -> None:
    res: dict = {}
    t1 = threading.Thread(target=convergence, args=(res,))
    t2 = threading.Thread(target=resume_triple, args=(res,))
    t1.start(); t2.start()
    t1.join(); t2.join()
    with open(os.path.join(SCRATCH, "conv_4n.json"), "w") as f:
        json.dump({**res["conv"],
                   "note": "ran concurrently with the resume triple on a "
                           "disjoint pinned core block"}, f)
    with open(os.path.join(SCRATCH, "resume_4n.json"), "w") as f:
        json.dump(res["resume"], f)
    print("converged_at:", res["conv"].get("converged_at"),
          "resume allclose:", res["resume"]["allclose_1e6"])


if __name__ == "__main__":
    main()
