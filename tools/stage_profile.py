"""Offline per-stage profiler over Spark event logs.

Aggregates SparkListenerTaskEnd metrics per stage — executor run/CPU
time, GC, shuffle read/write, input bytes, peak task time — and prints
the top stages by total executor time. This is the tool form of the
analysis that found the round-1/2 performance bugs (cache convoys,
Python-UDF recompute across jobs, BLAS oversubscription): the driver's
wall clock hides WHERE executor time goes; the event log doesn't.

Usage:
    SPARK_GRAFT_EVENTLOG=/tmp/spark-events <run any engine workload>
    python tools/stage_profile.py /tmp/spark-events [top_n]

Reads every app log in the directory (plain or zstd-compressed, the
engine's default). No Spark needed to analyze — pure JSON + pyarrow.

Reading the numbers: `cpu_s` is JVM thread CPU only. A stage whose tasks
are mapInPandas/pandas-UDF shows run_s >> cpu_s because the JVM task
thread BLOCKS while the Python worker computes — that gap is Python work
(or politeness sleeps when delay_s > 0), not executor idleness. Verified
on a 2-core crawl leg: the fetch stage shows 275 s run / 5.6 s cpu —
all of it blob decode in the workers.
"""

from __future__ import annotations

import io
import json
import os
import sys
from collections import defaultdict


_UNSUPPORTED_CODECS = (".lz4", ".snappy")


def _open_log(path: str):
    if path.endswith(".zstd"):
        import pyarrow as pa

        raw = pa.CompressedInputStream(pa.OSFile(path, "rb"), "zstd").read()
        return io.StringIO(raw.decode("utf-8", errors="replace"))
    if path.endswith(_UNSUPPORTED_CODECS):
        raise SystemExit(
            f"{path}: unsupported event-log codec (only zstd/uncompressed "
            f"are handled; re-run with spark.eventLog.compression.codec=zstd)"
        )
    return open(path, encoding="utf-8", errors="replace")


def profile_dir(ev_dir: str) -> list[dict]:
    """Per-stage aggregate rows across every event log under ``ev_dir``,
    sorted by total executor run time descending."""
    stages: dict[tuple, dict] = defaultdict(
        lambda: {
            "tasks": 0, "failed": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
            "input_mb": 0.0, "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
            "spill_mb": 0.0, "max_task_ms": 0, "name": "",
        }
    )
    logs = []
    for fname in sorted(os.listdir(ev_dir)):
        fpath = os.path.join(ev_dir, fname)
        if os.path.isdir(fpath) and fname.startswith("eventlog_v2_"):
            # Spark 4 rolling layout: a dir of events_<n>_<app>[.codec]
            logs += [
                (fname, os.path.join(fpath, f))
                for f in sorted(os.listdir(fpath))
                if f.startswith("events_")
            ]
        elif os.path.isfile(fpath) and not fname.endswith(".inprogress"):
            logs.append((fname, fpath))
    for fname, fpath in logs:
        with _open_log(fpath) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    # key by attempt too: a resubmitted stage (fetch
                    # failure) must not merge with its first attempt
                    key = (fname, si["Stage ID"], si.get("Stage Attempt ID", 0))
                    stages[key]["name"] = si.get("Stage Name", "")
                elif kind == "SparkListenerTaskEnd":
                    key = (fname, ev["Stage ID"], ev.get("Stage Attempt ID", 0))
                    s = stages[key]
                    reason = ev.get("Task End Reason", {}).get("Reason")
                    if reason != "Success":
                        # failed/killed attempts surface as a count, not
                        # as executor time — retries would otherwise
                        # inflate the very ranking this tool exists for
                        s["failed"] += 1
                        continue
                    m = ev.get("Task Metrics")
                    if not m:
                        continue
                    run = m.get("Executor Run Time", 0)
                    s["tasks"] += 1
                    s["run_ms"] += run
                    s["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                    s["gc_ms"] += m.get("JVM GC Time", 0)
                    s["input_mb"] += m.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6
                    s["shuffle_read_mb"] += (
                        m.get("Shuffle Read Metrics", {}).get("Local Bytes Read", 0)
                        + m.get("Shuffle Read Metrics", {}).get("Remote Bytes Read", 0)
                    ) / 1e6
                    s["shuffle_write_mb"] += (
                        m.get("Shuffle Write Metrics", {}).get("Shuffle Bytes Written", 0) / 1e6
                    )
                    s["spill_mb"] += m.get("Disk Bytes Spilled", 0) / 1e6
                    s["max_task_ms"] = max(s["max_task_ms"], run)
    rows = [
        {"app": k[0], "stage": k[1], "attempt": k[2], **v}
        for k, v in stages.items()
        if v["tasks"] > 0 or v["failed"] > 0
    ]
    rows.sort(key=lambda r: r["run_ms"], reverse=True)
    return rows


def main() -> None:
    ev_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rows = profile_dir(ev_dir)
    total = sum(r["run_ms"] for r in rows)
    print(f"{len(rows)} stages, total executor run time {total/1000:.1f}s\n")
    hdr = (
        f"{'stage':>8} {'tasks':>6} {'fail':>4} {'run_s':>8} {'cpu_s':>8} {'gc_s':>6} "
        f"{'in_MB':>8} {'shR_MB':>8} {'shW_MB':>8} {'spill':>6} {'maxT_s':>7}  name"
    )
    print(hdr)
    for r in rows[:top_n]:
        # skew smell: one task dominating the stage (max_task ~ run/1)
        label = f"{r['stage']}" if r["attempt"] == 0 else f"{r['stage']}.r{r['attempt']}"
        print(
            f"{label:>8} {r['tasks']:>6} {r['failed']:>4} {r['run_ms']/1000:>8.2f} "
            f"{r['cpu_ms']/1000:>8.2f} {r['gc_ms']/1000:>6.2f} "
            f"{r['input_mb']:>8.1f} {r['shuffle_read_mb']:>8.1f} "
            f"{r['shuffle_write_mb']:>8.1f} {r['spill_mb']:>6.1f} "
            f"{r['max_task_ms']/1000:>7.2f}  {r['name'][:60]}"
        )


if __name__ == "__main__":
    main()
