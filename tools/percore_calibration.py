#!/usr/bin/env python
"""Per-core capability calibration: how much per-core throughput does
this host lose as the number of BUSY cores grows from 2 to 8?

Three probes, each run as K independent single-core processes pinned to
cores 0..K-1 (no shared Python state, no GIL coupling), fixed work per
process, mean wall compared between K=2 and K=8:

  * cpu    — integer ALU loop (no memory traffic): isolates frequency /
             hypervisor scheduling effects
  * stream — NumPy triad over 100 MB arrays: sequential DRAM bandwidth
  * gather — random-index gather over a 200 MB array: LLC / memory-
             LATENCY bound, the access pattern of hash aggregation and
             hash joins (the Pregel superstep's dominant kernels)

``percore_ratio_8v2`` = wall(2-core run) / wall(8-core run); 1.0 means
8 busy cores each retain full 2-busy-core capability.  Round-4 measured
values on this host (idle, Firecracker VM, 32 vCPU):

    cpu 0.993 · stream 0.899 · gather 0.558

i.e. an idle box gives 2 busy cores ~1.8x the per-core random-access
throughput of 8 busy cores — so a single-box back-to-back local[2] vs
local[8] comparison UNDERSTATES the scaling of a real N->4N fleet of
separate machines (constant per-node LLC/bandwidth per core) by up to
that factor on gather-bound phases, with zero engine deficit.  This is
the measured mechanism behind the day-dependence of the back-to-back
paired protocol (docs/SCALING_NOTES.md §13) and the motivation for the
simultaneous disjoint-block protocol (tools/simul_scaling.py), which
runs both levels under one identical busy-core state.

Run with the box otherwise idle.  Writes JSON to stdout and to
/tmp/spark_graft_scaling/percore_calibration.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CPU_WORK = """
import time
t0 = time.time()
x = 0
for i in range(60_000_000):
    x += i * i & 1023
print(time.time() - t0)
"""

STREAM_WORK = """
import time, numpy as np
a = np.ones(12_500_000); b = np.ones(12_500_000) * 2
c = np.empty(12_500_000)
t0 = time.time()
for _ in range(40):
    np.add(a, b, out=c); np.multiply(c, 1.0000001, out=c)
print(time.time() - t0)
"""

GATHER_WORK = """
import time, numpy as np
rng = np.random.default_rng(7)
N = 25_000_000  # 200 MB of int64
idx = rng.integers(0, N, size=N // 4)
a = np.arange(N)
t0 = time.time()
s = 0
for _ in range(8):
    s += int(a[idx][::1000001].sum())
print(time.time() - t0)
"""


def run(n_cores: int, work: str) -> float:
    ps = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", work],
            stdout=subprocess.PIPE, text=True,
        )
        for i in range(n_cores)
    ]
    walls = [
        float(p.communicate()[0].strip().splitlines()[-1]) for p in ps
    ]
    return sum(walls) / len(walls)


def main() -> None:
    out = {}
    for tag, work in (
        ("cpu", CPU_WORK), ("stream", STREAM_WORK), ("gather", GATHER_WORK)
    ):
        w2 = run(2, work)
        w8 = run(8, work)
        out[tag] = {
            "wall_2core": round(w2, 2),
            "wall_8core": round(w8, 2),
            "percore_ratio_8v2": round(w2 / w8, 3),
        }
    os.makedirs("/tmp/spark_graft_scaling", exist_ok=True)
    with open("/tmp/spark_graft_scaling/percore_calibration.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
