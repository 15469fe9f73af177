#!/usr/bin/env python
"""Per-stage / per-job accounting from a Spark event log (diagnostic legs
of the scaling protocol: ``tools/scaling_run.py --event-log DIR``).

Answers "where does a superstep's wall time go at each cluster size":
for every job (one PageRank superstep ≈ one checkpoint job) it prints
wall, the gap to the previous job (driver-serial floor), and for every
stage the task-time sum, GC, shuffle bytes, max/median task skew and the
idle core-seconds (stage_wall × cores − task_time) that stage barriers
leave on the table.

Usage: python tools/analyze_eventlog.py /tmp/evt8/app-... [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import statistics
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--min-job-wall", type=float, default=1.0,
                    help="only detail jobs with wall >= this many seconds")
    args = ap.parse_args()

    stage_tasks: dict[int, list[dict]] = defaultdict(list)
    stage_info: dict[int, dict] = {}
    jobs: list[dict] = []
    job_stages: dict[int, list[int]] = {}

    with open(args.log) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerTaskEnd":
                tm = ev.get("Task Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                stage_tasks[ev["Stage ID"]].append({
                    "run": tm.get("Executor Run Time", 0),
                    "gc": tm.get("JVM GC Time", 0),
                    "deser": tm.get("Executor Deserialize Time", 0),
                    "rser": tm.get("Result Serialization Time", 0),
                    "sr_bytes": (sr.get("Local Bytes Read", 0)
                                 + sr.get("Remote Bytes Read", 0)),
                    "fetch_wait": sr.get("Fetch Wait Time", 0),
                    "sw_bytes": sw.get("Shuffle Bytes Written", 0),
                    "sw_time": sw.get("Shuffle Write Time", 0),  # ns
                })
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:60],
                    "ntask": si.get("Number of Tasks"),
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                }
            elif e == "SparkListenerJobStart":
                job_stages[ev["Job ID"]] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
                jobs.append({"id": ev["Job ID"],
                             "start": ev["Submission Time"]})
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == ev["Job ID"]:
                        j["end"] = ev["Completion Time"]

    prev_end = None
    for j in sorted(jobs, key=lambda j: j["start"]):
        if "end" not in j:
            continue
        wall = (j["end"] - j["start"]) / 1e3
        gap = (j["start"] - prev_end) / 1e3 if prev_end else 0.0
        prev_end = j["end"]
        if wall < args.min_job_wall:
            continue
        print(f"\njob {j['id']}: wall {wall:7.2f}s  (driver gap before: "
              f"{gap:5.2f}s)")
        for sid in sorted(job_stages.get(j["id"], [])):
            tasks = stage_tasks.get(sid)
            si = stage_info.get(sid)
            if not tasks or not si or not si.get("sub"):
                continue
            swall = (si["done"] - si["sub"]) / 1e3
            run = sum(t["run"] for t in tasks) / 1e3
            gc = sum(t["gc"] for t in tasks) / 1e3
            deser = sum(t["deser"] + t["rser"] for t in tasks) / 1e3
            fetch = sum(t["fetch_wait"] for t in tasks) / 1e3
            swt = sum(t["sw_time"] for t in tasks) / 1e9
            srb = sum(t["sr_bytes"] for t in tasks) / 2**20
            swb = sum(t["sw_bytes"] for t in tasks) / 2**20
            walls = sorted(t["run"] for t in tasks)
            mx = walls[-1] / 1e3
            md = statistics.median(walls) / 1e3
            idle = swall * args.cores - run - deser
            print(f"  stage {sid:4d} [{len(tasks):3d} tasks] wall {swall:6.2f}s"
                  f"  task-run {run:7.1f}s  gc {gc:5.1f}s  ser/deser "
                  f"{deser:5.1f}s  fetchwait {fetch:5.1f}s  shufW-t {swt:5.1f}s"
                  f"  idle {idle:6.1f}cs  skew mx/md {mx:6.2f}/{md:6.2f}"
                  f"  shufR {srb:7.1f}M shufW {swb:7.1f}M  {si['name']}")


if __name__ == "__main__":
    main()
