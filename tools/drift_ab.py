#!/usr/bin/env python
"""Same-window A/B for the query-suite drift on unchanged operators
(round-4 verdict #4).

Rounds 2 -> 4 showed ngram_jaccard_pairs 1.81 -> 2.67 s, sessionize
0.38 -> 0.53, minhash_lsh_dups 1.28 -> 1.69 on operators with ZERO code
diffs since round 2. Two hypotheses: (a) the round-4 session-conf
additions (warm worker daemon module + PYTHONPATH export) regressed the
query suite, or (b) the sandbox's hour-scale host drift defeats
cross-round comparison. This tool separates them by construction: it
runs the SAME query subset in fresh JVM children, interleaved

    A (daemon on)  B (daemon off)  A  B

within one machine window, each child reporting per-query best-of-3
warm timings. If (a), B beats A consistently; if (b), A == B within
noise and the cross-round delta is exonerated as host drift.

Usage: python tools/drift_ab.py [--reps 2] [--cores 32]
Writes one JSON line to stdout; prose conclusion goes to BENCH/BASELINE.md
by hand (the verdict asks for a written exoneration or a fix).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# drifted queries + stable controls (round-2 vs round-4 history)
QUERIES = [
    "ngram_jaccard_pairs",  # 1.81 -> 2.67 s (drifted)
    "minhash_lsh_dups",     # 1.28 -> 1.69 s (drifted)
    "sessionize",           # 0.38 -> 0.53 s (drifted)
    "simhash",              # shuffle-heavy control
    "ann_ivf_topk",         # Python-boundary control
    "seed_dedup_sort",      # stable control
    "dedup_exact",          # stable control
]
PASSES = 3


def child(cores: int, sf_dir: str) -> None:
    from film_crawler_spark.operators.caching import cache_scope
    from film_crawler_spark.queries import REGISTRY
    from film_crawler_spark.session import get_spark

    spark = get_spark(
        app_name="fcs-drift-ab",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    for _ in range(PASSES):
        for name in QUERIES:
            fn = REGISTRY[name][0]
            t0 = time.time()
            with cache_scope():
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            timings[name] = min(timings.get(name, dt), dt)
    spark.stop()
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    results: dict[str, list[dict]] = {"daemon_on": [], "daemon_off": []}
    arms = (("daemon_on", "1"), ("daemon_off", "0"))
    for rep in range(args.reps):
        # counterbalance the within-rep order (A,B then B,A ...): the
        # machine warms monotonically across children, so a fixed order
        # hands the second arm a systematic advantage — the first run of
        # this tool showed exactly that bias (the last child of 4 was
        # always the fastest regardless of arm)
        order = arms if rep % 2 == 0 else arms[::-1]
        for arm, env_val in order:
            env = {**os.environ, "SPARK_GRAFT_WARM_DAEMON": env_val}
            # arm B must not inherit arm A's PYTHONPATH export
            if env_val == "0":
                env.pop("PYTHONPATH", None)
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(args.cores), sf_dir],
                capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
            )
            if proc.returncode != 0:
                print(proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"{arm} child failed")
            t = json.loads(proc.stdout.strip().splitlines()[-1])
            results[arm].append(t)
            print(f"[drift_ab] rep {rep + 1} {arm}: {t} "
                  f"({time.time() - t0:.0f}s wall)", file=sys.stderr, flush=True)

    summary = {"queries": {}, "reps": args.reps, "cores": args.cores}
    for q in QUERIES:
        on = min(r[q] for r in results["daemon_on"])
        off = min(r[q] for r in results["daemon_off"])
        # paired within-rep deltas: each rep's two children are adjacent
        # in time, so their difference cancels the slow inter-rep drift
        rep_deltas = [
            round(a[q] - b[q], 3)
            for a, b in zip(results["daemon_on"], results["daemon_off"])
        ]
        summary["queries"][q] = {
            "daemon_on": on,
            "daemon_off": off,
            "on_minus_off": round(on - off, 3),
            "rep_deltas": rep_deltas,
        }
    # a conf regression must show daemon_on slower in EVERY rep of a
    # drifted query AND by more than ~10% of its runtime; anything less
    # is indistinguishable from the sandbox's run-to-run noise
    consistent = [
        q for q, v in summary["queries"].items()
        if all(d > 0.1 * v["daemon_off"] for d in v["rep_deltas"])
    ]
    deltas = [v["on_minus_off"] for v in summary["queries"].values()]
    summary["max_abs_delta"] = max(abs(d) for d in deltas)
    summary["consistently_slower_with_daemon"] = consistent
    summary["conclusion"] = (
        f"conf-induced slowdown on {', '.join(consistent)} "
        f"(daemon_on slower in every rep by >10%)"
        if consistent
        else "no consistent conf effect: cross-round drift is host drift"
    )
    # persist for bench.py's report generator: BENCH/BASELINE.md is
    # regenerated on every bench run, so the drift verdict must live in
    # an artifact the generator reads rather than hand-edited prose
    out = os.path.join(REPO, "BENCH", "drift_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
