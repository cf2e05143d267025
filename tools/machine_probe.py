#!/usr/bin/env python
"""Hardware scaling control for the bench's N->4N criterion.

Runs the crawl's per-blob work (synthesize -> encode -> decode -> phash,
exactly the hot loop of the fetch UDF) in plain OS processes — no Spark,
no JVM, no Arrow — at several process counts. The per-core throughput
curve this prints is the MACHINE's ceiling for that workload profile
(DRAM bandwidth, turbo scaling); the engine cannot scale better than the
box it runs on, so the bench compares its own efficiency against this
control when choosing the parallelism pair (see bench.py CORES_PAIR).

Measured on the 32-core sandbox (2026-08): ~1.0 efficiency per added
core up to 8 processes; 8->32 drops to ~0.71 (6.6 -> 9.3 core-ms/blob)
— a pure-hardware effect, reproduced with zero engine code in the loop.
"""

from __future__ import annotations

import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.update({k: "1" for k in (
    "OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS",
)})


def work(args: tuple[int, int]) -> int:
    lo, hi = args
    from film_crawler_spark.functions.images import decode_image, phash64
    from film_crawler_spark.sources.synthetic_site import SiteConfig, SyntheticSite

    s = SyntheticSite(SiteConfig())
    tot = 0
    for i in range(lo, hi):
        rm = f"rm{i:09d}0"
        b = s.image_bytes(rm, "ori")
        px, _fmt = decode_image(b)
        tot += phash64(px) & 1
    return tot


def run(nproc: int, n: int = 12000) -> float:
    per = n // nproc
    chunks = [(i * per, (i + 1) * per) for i in range(nproc)]
    t0 = time.time()
    with Pool(nproc) as p:
        p.map(work, chunks)
    dt = time.time() - t0
    print(
        f"nproc={nproc:3d}: {dt:6.1f}s  ({n / dt:8.0f} blobs/s, "
        f"{dt * nproc / n * 1000:.2f} core-ms/blob)",
        flush=True,
    )
    return n / dt


def main() -> None:
    # optional trailing "n=<blobs>" arg sizes the sample (bench legs use
    # a smaller sample at low core counts: throughput converges within a
    # few thousand blobs and the probe's job is adjacency, not precision)
    args = sys.argv[1:]
    n = 12000
    if args and args[-1].startswith("n="):
        n = int(args.pop()[2:])
    counts = [int(x) for x in (args or ["1", "2", "8", "32"])]
    thr = {c: run(c, n) for c in counts}
    for a, b in zip(counts, counts[1:]):
        eff = thr[b] / (thr[a] * b / a)
        print(f"efficiency {a}->{b}: {eff:.2f}")


if __name__ == "__main__":
    main()
