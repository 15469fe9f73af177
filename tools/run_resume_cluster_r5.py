#!/usr/bin/env python
"""Round-5 mid-run resume check in LOCAL-CLUSTER mode — the north rule's
"resumable from checkpoint with per-partition lineage + metrics"
evidenced with REAL executor JVMs (the same multi-executor shape the
round-5 scaling gate now runs in): full 6-superstep run vs (interrupted
at 3) + (fresh-process resume to 6), all three legs as
local-cluster[4,2] — four 2-core executor JVMs, netty shuffle,
per-superstep state re-exchange through `preserve_partitioning=False`.
Final ranks must agree to 1e-6 L∞ (the local-mode checks of rounds 2-4
measured 0.0; this confirms the exchange-on-resume path is also exact
when state crosses process boundaries).

Run ONLY when no other Spark job is on the box.  Writes
resume_cluster_r5.json into the scratch dir.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SCRATCH = "/tmp/spark_graft_scaling"
EDGES = os.path.join(SCRATCH, "edges_n6000000_lf6_seed42.parquet")


def leg(units, steps, tol, extra=None):
    cmd = [
        sys.executable, "/root/repo/tools/scaling_run.py",
        str(units), EDGES, str(steps), str(tol),
        "--master-mode", "local-cluster", "--cores-per-executor", "2",
        "--executor-mem-mb", "8192", "--fixed-partitions", "32",
        "--pin-offset", "8",
    ] + (extra or [])
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "8g")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                       env=env)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )


def main() -> None:
    import duckdb

    root = os.path.join(SCRATCH, "resume_check_cluster_r5")
    shutil.rmtree(root, ignore_errors=True)
    full_ranks = os.path.join(root, "ranks_full")
    res_ranks = os.path.join(root, "ranks_resumed")
    ck_full = os.path.join(root, "ck_full")
    ck_int = os.path.join(root, "ck_interrupted")
    steps, interrupt_at, ckpt_every = 6, 3, 3

    full = leg(4, steps, 0.0,
               ["--ckpt-root", ck_full, "--ckpt-every", str(ckpt_every),
                "--ranks-out", full_ranks])
    interrupted = leg(4, interrupt_at, 0.0,
                      ["--ckpt-root", ck_int, "--ckpt-every",
                       str(ckpt_every)])
    resumed = leg(4, steps, 0.0,
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
    # an empty join (disjoint/empty ranks parquet after a partial write)
    # yields max(...) = NULL: report a FAIL verdict, don't crash on
    # float(None)
    d = float(row[0]) if row[0] is not None else float("inf")
    joined, na, nb = int(row[1]), int(row[2]), int(row[3])
    out = {
        "master_mode": "local-cluster",
        "executors": 4, "cores_per_executor": 2, "supersteps": steps,
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
    with open(os.path.join(SCRATCH, "resume_cluster_r5.json"), "w") as f:
        json.dump(out, f)
    print("cluster resume allclose:", out["allclose_1e6"], "max diff:", d)


if __name__ == "__main__":
    main()
