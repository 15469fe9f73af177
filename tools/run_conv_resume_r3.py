#!/usr/bin/env python
"""Round-3 convergence + resume legs for BENCH_SCALING.

Phase A — to-tolerance legs at BOTH levels (VERDICT r2 #9): PageRank to
tol=1e-9 L∞ (at 6 M vertices ranks are O(1e-7), so 1e-6 is coarse; 1e-9
makes the supersteps/hour metric robust to vertex-count scaling).  The two
legs run CONCURRENTLY on disjoint pinned blocks (N on cores [0,2), 4N on
[8,16)) so both sample the same host window — the to-tolerance efficiency
reported from them is window-matched by construction.

Phase B — mid-run resume triple at the 4N level (sequential, cores [0,8)):
full run vs (interrupted at 3) + (fresh-process resume to 6); final ranks
must agree to 1e-6 L∞.

Writes conv_lo_1e9.json / conv_hi_1e9.json / resume_4n.json into the
scratch dir for tools/assemble_calm.py.
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
                       timeout=5400, check=True, env=env)
    return json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])


def main() -> None:
    res: dict = {}

    def conv(units, offset, tag):
        res[tag] = leg(units, 100, 1e-9, offset)

    t1 = threading.Thread(target=conv, args=(2, 0, "lo"))
    t2 = threading.Thread(target=conv, args=(8, 8, "hi"))
    t1.start(); t2.start()
    t1.join(); t2.join()
    note = ("1e-9 L∞ tolerance; ran concurrently with the other level "
            "on a disjoint pinned core block (same host window)")
    with open(os.path.join(SCRATCH, "conv_lo_1e9.json"), "w") as f:
        json.dump({**res["lo"], "note": note}, f)
    with open(os.path.join(SCRATCH, "conv_hi_1e9.json"), "w") as f:
        json.dump({**res["hi"], "note": note}, f)
    print("conv lo:", res["lo"].get("converged_at"),
          res["lo"].get("supersteps_per_hour"), "steps/h;",
          "conv hi:", res["hi"].get("converged_at"),
          res["hi"].get("supersteps_per_hour"), "steps/h", file=sys.stderr)

    import duckdb

    root = os.path.join(SCRATCH, "resume_check")
    shutil.rmtree(root, ignore_errors=True)
    full_ranks = os.path.join(root, "ranks_full")
    res_ranks = os.path.join(root, "ranks_resumed")
    ck_full = os.path.join(root, "ck_full")
    ck_int = os.path.join(root, "ck_interrupted")
    steps, interrupt_at, ckpt_every = 6, 3, 3

    full = leg(8, steps, 0.0, 0,
               ["--ckpt-root", ck_full, "--ckpt-every", str(ckpt_every),
                "--ranks-out", full_ranks])
    interrupted = leg(8, interrupt_at, 0.0, 0,
                      ["--ckpt-root", ck_int, "--ckpt-every",
                       str(ckpt_every)])
    resumed = leg(8, steps, 0.0, 0,
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
    out = {
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
    }
    with open(os.path.join(SCRATCH, "resume_4n.json"), "w") as f:
        json.dump(out, f)
    print("resume allclose:", out["allclose_1e6"],
          "max diff:", d, file=sys.stderr)


if __name__ == "__main__":
    main()
