#!/usr/bin/env python
"""Ambient host-speed probe for the scaling campaign (BASELINE.md §3).

A single-threaded STREAM-triad-style loop over warm 100 MB buffers, pinned
to one core OUTSIDE every pinned job block.  Memory bandwidth is the
resource the event-log attribution identified as the noise channel
(docs/SCALING_NOTES.md §10: identical tasks inflate with co-tenant
memory/disk traffic, core-busy stays ≥94 %), so the probe's GB/s is a
direct sensor of the ambient window quality that a CPU-busy loop would
miss.  Writes one JSONL line {"ts": epoch, "gbps": x} every ~2 s.

Runs until killed (or --duration).  Usage:
    python tools/ambient_probe.py /tmp/probe.jsonl --core 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

N = 12_500_000  # 3 buffers x 100 MB


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--core", type=int, default=20,
                    help="pin here; must be outside every job block "
                         "(legs use [0,2) and [8,16), driver block 28-31)")
    ap.add_argument("--duration", type=float, default=0.0,
                    help="seconds to run (0 = until killed)")
    args = ap.parse_args()

    os.sched_setaffinity(0, {args.core})
    a = np.empty(N)
    b = np.empty(N)
    c = np.empty(N)
    b[:] = 1.0
    c[:] = 2.0
    a[:] = 0.0  # touch every page before timing

    t_stop = time.time() + args.duration if args.duration else None
    with open(args.out, "a", buffering=1) as f:
        while t_stop is None or time.time() < t_stop:
            t = time.time()
            iters = 0
            # ~2 s of triad per sample
            while time.time() - t < 2.0:
                np.add(b, c, out=a)
                np.multiply(a, 1.5, out=a)
                iters += 1
            dt = time.time() - t
            gbps = iters * 4 * 8 * N / dt / 1e9
            f.write(json.dumps({"ts": round(t, 2),
                                "gbps": round(gbps, 3)}) + "\n")


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        sys.exit(0)
