#!/usr/bin/env python
"""Core-occupancy timeline from a Spark event log.

stage_profile.py shows WHERE executor time goes; this shows WHEN cores
sit idle — the driver-floor view. Builds a 100 ms-resolution busy-core
curve from task launch/finish intervals, plus a job table, and prints
the low-occupancy windows (>1 s below half the cores) with the jobs
active in each window. This is the measurement behind the per-iteration
fixed-floor work in BENCH/BASELINE.md.

Usage: python tools/timeline_profile.py <eventlog-dir> [cores]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from stage_profile import _open_log  # noqa: E402


def main() -> None:
    import glob
    import os

    ev_dir = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tasks = []  # (launch_ms, finish_ms)
    jobs = {}  # id -> {submit, end, desc, stages}
    stage_job = {}
    stage_name = {}
    paths = sorted(
        glob.glob(os.path.join(ev_dir, "*"))
        + glob.glob(os.path.join(ev_dir, "eventlog_v2_*", "events_*"))
    )
    for path in paths:
        if path.endswith(".inprogress") or os.path.isdir(path) or "appstatus" in path:
            continue
        with _open_log(path) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerTaskEnd":
                    ti = e.get("Task Info", {})
                    tasks.append((ti["Launch Time"], ti["Finish Time"], e.get("Stage ID")))
                elif ev == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    desc = e.get("Properties", {}).get("spark.job.description", "")
                    sids = [s["Stage ID"] for s in e.get("Stage Infos", [])]
                    for s in e.get("Stage Infos", []):
                        stage_name[s["Stage ID"]] = s.get("Stage Name", "")
                    jobs[jid] = {
                        "submit": e["Submission Time"], "end": None,
                        "desc": desc[:60], "stages": sids,
                    }
                    for sid in sids:
                        stage_job[sid] = jid
                elif ev == "SparkListenerJobEnd":
                    if e["Job ID"] in jobs:
                        jobs[e["Job ID"]]["end"] = e["Completion Time"]
    if not tasks:
        raise SystemExit("no tasks in event log")
    t0 = min(t[0] for t in tasks)
    t1 = max(t[1] for t in tasks)
    # 100ms-resolution busy-core curve
    n = int((t1 - t0) // 100) + 2
    busy = [0.0] * n
    for lo, hi, _sid in tasks:
        a, b = lo - t0, hi - t0
        ia, ib = int(a // 100), int(b // 100)
        if ia == ib:
            busy[ia] += (b - a) / 100.0
            continue
        busy[ia] += (100 - a % 100) / 100.0
        for i in range(ia + 1, ib):
            busy[i] += 1.0
        busy[ib] += (b % 100) / 100.0

    print(f"wall {round((t1 - t0) / 1000, 1)}s, cores {cores}, "
          f"mean busy {round(sum(busy) / len(busy), 2)}")

    # low-occupancy windows
    lows = []
    start = None
    for i, v in enumerate(busy):
        if v < cores / 2:
            if start is None:
                start = i
        else:
            if start is not None and i - start >= 10:
                lows.append((start, i))
            start = None
    if start is not None and len(busy) - start >= 10:
        lows.append((start, len(busy)))

    def jobs_active(lo_ms, hi_ms):
        out = []
        for jid, j in jobs.items():
            if j["submit"] is None or j["end"] is None:
                continue
            if j["submit"] - t0 < hi_ms and j["end"] - t0 > lo_ms:
                out.append((jid, j["desc"]))
        return out

    total_low = sum((b - a) for a, b in lows) / 10.0
    print(f"{len(lows)} low-occupancy windows (<{cores / 2} cores busy, >=1s), "
          f"total {round(total_low, 1)}s:")
    for a, b in lows:
        mean = sum(busy[a:b]) / (b - a)
        active = jobs_active(a * 100, b * 100)
        label = "; ".join(d or f"job{j}" for j, d in active[:3]) or "NO JOB RUNNING (driver-only)"
        print(f"  {a / 10:8.1f}s -> {b / 10:8.1f}s ({(b - a) / 10:6.1f}s, mean {mean:4.1f} busy): {label}")


if __name__ == "__main__":
    main()
