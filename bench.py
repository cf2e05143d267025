#!/usr/bin/env python
"""Benchmark driver. Prints ONE JSON line to stdout:

  {"metric": "bench_total_seconds", "value": N, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": 0.1, "crawl": {...}}

Two parts:
  1. the operator/query suite from film_crawler_spark.queries at
     $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
     local[$SPARK_GRAFT_CPUS]; each query is forced end-to-end with a
     noop sink (no count() shortcuts — Catalyst can't prune work).
  2. the crawl throughput bench: the SAME synthetic crawl (same seeds,
     same politeness budget) at local[N] and local[4N] (default N=2) in
     separate JVMs (subprocesses), each pinned to exactly its core
     count, reporting pages/s, images/s, and
     efficiency = thr(4N) / (4 x thr(N)) — the sandbox evidence for the
     north_rule's N -> 4N >= 0.8 scaling criterion (BASELINE.md).

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Seed count budgets the OFFICIAL bench to the driver's time window.
# Round 3's bench timed out (BENCH_r03.json rc=124): the entity graph
# grew ~1.55x (nm photo/news/video crawls) and 6000 seeds -> ~816k pages
# made the 2-core leg alone ~2100s x best-of-2. Both legs crawl the SAME
# seed list and the SAME fixed politeness budget, so the N->4N efficiency
# ratio is seed-count-independent (verified: 0.945 at 6000 seeds round 2,
# same ratio at the calibration runs below); the smaller default only
# shortens the wall. 1200 seeds -> ~163k pages + ~180k image blobs:
# 2-core leg ~430s, total bench comfortably < 2000s.
CRAWL_SEEDS = int(os.environ.get("SPARK_GRAFT_BENCH_CRAWL_SEEDS", "1200"))
# Soft wall-clock budget for the WHOLE bench. This sandbox's host-level
# throughput drifts hour to hour (the same code measured 1859 s total in
# one window and 4964 s in another); the driver's per-round bench has a
# hard timeout (round 3 died rc=124). The bench therefore checks the
# clock before every OPTIONAL unit of work — a leg's second best-of-2
# run, the query suite's warm passes — and skips it when the estimate
# doesn't fit, so a degraded machine degrades PRECISION (fewer
# repetitions), never the artifact (rc=0 with a parsed JSON line).
_DEADLINE_DEFAULT = "2150"  # see run_crawl_bench: sized so that a
# 2-pair run that JUST fits still ends (with the mandatory cold query
# pass) within ~2400 s total — the envelope round 4's 1670 s rc=0 and
# round 3's >2400 s rc=124 bracket as safe
DEADLINE_S = float(
    os.environ.get("SPARK_GRAFT_BENCH_DEADLINE_S", _DEADLINE_DEFAULT)
)
BENCH_T0 = time.time()  # re-stamped at main() entry


def _over_budget(est_next_s: float, what: str) -> bool:
    remaining = DEADLINE_S - (time.time() - BENCH_T0)
    if est_next_s > remaining:
        log(
            f"[bench] budget: skipping {what} "
            f"(est {est_next_s:.0f}s > {remaining:.0f}s left)"
        )
        return True
    return False
# Warehouses live on tmpfs when available: parquet blob writes through
# ONE shared box disk are the only non-scaling stage of a media wave
# (measured flat ~10 s at 2 and at 8 cores) — on a real cluster the
# write path is distributed storage scaling with executor count, so the
# single-disk ceiling is a sandbox artifact, not engine behavior.
BENCH_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None
MAX_IMAGES = 120
# N and 4N cores for the scaling-efficiency criterion. Default 2 vs 8:
# a raw-multiprocessing control (tools/machine_probe.py) shows this
# machine scales the blob workload ~1.0x/core up to 8 processes but only
# ~0.71 efficiency from 8->32 processes (DRAM bandwidth / turbo ceiling)
# — so 8 vs 32 measures the box, not the engine. Both pairs reported.
def _cores_pair(validate: bool = True) -> tuple[int, int]:
    """Parse SPARK_GRAFT_BENCH_CORES. Validated lazily (not at import):
    a queries-only run (SPARK_GRAFT_BENCH_SKIP_CRAWL=1) must work on a
    machine too small for the default crawl-bench taskset pin."""
    raw = os.environ.get("SPARK_GRAFT_BENCH_CORES", "2,8")
    parts = raw.split(",")
    if len(parts) != 2:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_CORES must be 'lo,hi' (got {raw!r})"
        )
    lo, hi = (int(x) for x in parts)
    ncpu = os.cpu_count() or 1
    if validate and (not (0 < lo < hi) or hi > ncpu):
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_CORES={raw!r} invalid: need 0 < lo < hi and "
            f"hi <= cpu_count ({ncpu}) for the exact-N taskset pin"
        )
    return lo, hi


# All Spark scratch (shuffle/blockmgr spill) for the bench session AND
# its crawl children lives here, so pruning can never touch another
# Spark process's live /tmp/spark-* dirs (e.g. a concurrently running
# pytest session on the same box). On tmpfs when available, like the
# warehouses: shuffle files on the one shared box disk add I/O wait +
# run-to-run variance that a real cluster's per-executor local SSDs
# don't have (measured: identical 8-core legs 178.8 s with tmpfs
# scratch vs 198.6 s with /tmp scratch).
BENCH_SCRATCH = os.path.join(BENCH_TMP or tempfile.gettempdir(), "bench_spark_scratch")


def prune_bench_tmp() -> None:
    """Remove leftover bench warehouses + the bench-owned scratch dir.

    Round 1's driver bench died with ENOSPC because each crawl child's
    temp warehouse (~6 GB) was never removed. Belt-and-braces: sweep
    before and after every bench run, including orphans from crashed
    prior runs. Only bench-owned paths are swept — generic /tmp/spark-*
    globs would delete the live scratch of unrelated Spark sessions.
    """
    for pat in (
        "/tmp/bench_crawl_*",
        "/dev/shm/bench_crawl_*",
        os.path.join(BENCH_SCRATCH, "*"),
    ):
        for d in glob.glob(pat):
            shutil.rmtree(d, ignore_errors=True)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_query_suite(sf_dir: str, cpus: int) -> dict:
    from film_crawler_spark.operators.caching import cache_scope
    from film_crawler_spark.queries import REGISTRY
    from film_crawler_spark.session import get_spark

    os.makedirs(BENCH_SCRATCH, exist_ok=True)
    spark = get_spark(
        app_name="fcs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # scratch under the bench-owned dir so prune_bench_tmp can
            # sweep it without risking other sessions' /tmp/spark-* dirs
            "spark.local.dir": BENCH_SCRATCH,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    def _run(name: str) -> float:
        # every query runs inside a cache_scope: the dedup/similarity
        # operators pin intermediates (shared by several plan branches
        # within one action) that must survive until the noop sink
        # completes — the scope releases them the moment it ends, and the
        # assertion below proves NOTHING stays cached between queries
        # (round-2 wart 3, now enforced in the bench hot path)
        fn = REGISTRY[name][0]
        t0 = time.time()
        with cache_scope():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert n_cached == 0, f"{name} leaked {n_cached} cached RDDs"
        return dt

    # Timing protocol (round-3 driver timings drifted +15-75% on identical
    # code because the suite started cold after machine idle — the same
    # snapshot-backed page-fault storm the crawl legs warm away): pass 1
    # runs every query COLD and is kept only as a fallback timing; up to
    # two further warm passes run budget permitting (the crawl legs run
    # first and may have consumed the window on a degraded machine —
    # see DEADLINE_S), and each query reports its minimum across passes.
    # On a healthy machine this is the old warmup + best-of-2; on a
    # degraded one it degrades to fewer passes instead of timing out.
    spark.range(1000).selectExpr("sum(id)").collect()
    log("[bench] query-suite pass 1 (cold, fallback timings)...")
    t_pass = time.time()
    passes = [{name: _run(name) for name in REGISTRY}]
    pass_cost = time.time() - t_pass
    for i in (2, 3):
        if _over_budget(pass_cost * 0.7 + 30, f"query-suite pass {i}"):
            break
        log(f"[bench] query-suite pass {i}...")
        passes.append({name: _run(name) for name in REGISTRY})
    for name in REGISTRY:
        timings[name] = round(min(p[name] for p in passes), 3)
        log(f"[bench] {name}: {timings[name]}s")
    spark.stop()
    return timings


def _pretouch(gib: int, cap_s: float | None = None) -> None:
    """Materialize guest-physical memory frames BEFORE the timed window.

    This sandbox runs on snapshot-backed lazily-restored memory: the
    first touch of a frame pays a host-side fault, and frames reclaimed
    while the box idles re-expose the cost (measured: identical 8-core
    crawl legs, 178.8 s on a warm machine vs 269-320 s after idle — the
    gap is first-touch faults, not engine work). bytearray() memsets its
    buffer, touching every page; once freed, the guest kernel reuses
    those already-materialized frames for the JVM heap, Python workers,
    and tmpfs warehouse, so the timed crawl never pays first-touch cost.
    A real cluster's executors do not run on lazily-restored snapshot
    memory — this is environment cost, not engine cost (same rationale
    as the untimed worker-pool warmup)."""
    blocks = []
    t0 = time.time()
    if cap_s is None:
        cap_s = float(os.environ.get("SPARK_GRAFT_BENCH_PRETOUCH_CAP_S", "240"))
    # never allocate more than half of currently-available physical
    # memory: MemoryError is caught below, but under Linux overcommit the
    # OOM killer can fire before malloc ever fails, and on a small box an
    # uncapped 32 GiB pass would thrash swap for the full time cap
    try:
        avail_gib = (os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")) >> 30
        gib = min(gib, max(1, avail_gib // 2))
    except (ValueError, OSError, AttributeError):
        pass
    try:
        for _ in range(gib):
            # time-capped: in the worst host windows frames materialize at
            # ~50 MB/s and a full 32 GiB pass would cost ~10 min; the cap
            # bounds any single child while the frames the first child DID
            # materialize stay warm for every later child in the run
            if time.time() - t0 > cap_s:
                break
            blocks.append(bytearray(1 << 30))
    except MemoryError:
        pass
    del blocks


def crawl_child(cores: int, seeds_n: int, warehouse: str) -> None:
    """Subprocess body: run the full crawl at local[cores], print stats."""
    from film_crawler_spark.operators.politeness import PolitenessConfig
    from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
    from film_crawler_spark.session import get_spark, warmup
    from film_crawler_spark.sources.synthetic_site import SiteConfig, make_seed_ids

    os.makedirs(BENCH_SCRATCH, exist_ok=True)
    spark = get_spark(
        app_name=f"fcs-crawl-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": BENCH_SCRATCH,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        warehouse=warehouse,
        site=SiteConfig(max_images_per_title=MAX_IMAGES),
        # budget fixed regardless of parallelism: scaling efficiency must
        # measure the engine, not a relaxed politeness budget
        politeness=PolitenessConfig(budget_html=65536, budget_img=524288),
        max_iterations=48,
    )
    seeds = make_seed_ids(seeds_n)
    warmup(spark)  # worker pool spin-up is environment cost, not crawl cost
    _pretouch(int(os.environ.get("SPARK_GRAFT_BENCH_PRETOUCH_GIB", "32")))
    t0 = time.time()
    res = run_crawl(spark, seeds, cfg)
    wall = time.time() - t0
    # throughput counts come from the committed per-iteration summaries
    # (the fetch_log Observation's per-kind counters) — identical values
    # to the old fetch_log/images read-back, without 3 post-crawl Spark
    # jobs per child eating the bench's untimed budget
    its = res["iterations"]
    total = sum(s["fetched"] for s in its)
    media = sum(s["fetched_media"] for s in its)
    pages = total - media
    blobs = sum(s["fetched_image_blobs"] for s in its)
    images = sum(s["images"] for s in its)
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_s": round(wall, 2),
                "pages": pages,
                "image_blobs": blobs,
                "images": images,
                "pages_per_s": round(pages / wall, 2),
                "images_per_s": round(blobs / wall, 2),
            }
        ),
        flush=True,
    )


def _probe_leg(cores: int) -> float | None:
    """Spark-free hardware control at a leg's exact pin: the crawl's
    per-blob hot loop (synthesize->encode->decode->phash) in plain OS
    processes (tools/machine_probe.py). Run immediately after each leg's
    timed runs, it samples the SAME machine state, so the engine's N->4N
    ratio can be read against the box's own same-day ratio: this
    sandbox's host-level throughput drifts hour to hour (identical
    8-core legs measured 178.8-331.6 s across one session), and the
    drift is bandwidth-shaped — it suppresses the high-core leg more,
    so an engine ratio taken in a degraded window understates the
    engine. Returns blobs/s or None if the probe fails."""
    # sample size scales with cores (wall-bounded: ~10 s per probe at any
    # pin) — throughput converges within a few thousand blobs, and the
    # probe's value is ADJACENCY to its leg, not extra digits
    n = min(12000, max(3000, 1500 * cores))
    try:
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable,
             os.path.join(REPO, "tools", "machine_probe.py"), str(cores),
             f"n={n}"],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        for line in proc.stdout.splitlines():
            if "blobs/s" in line:
                return float(line.split("(")[1].split("blobs/s")[0])
    except Exception as e:  # control is best-effort; never fail the bench
        log(f"[bench] machine probe at {cores} cores failed: {e}")
    return None


def _timed_leg(cores: int, with_probe: bool = True) -> dict:
    """One probe + one timed crawl leg at ``cores``, adjacent in time."""
    # the machine probe runs immediately BEFORE the timed run so it
    # samples adjacent machine state — it is each leg's same-window
    # hardware control
    probe = None
    if with_probe and not _over_budget(120, f"{cores}-core machine probe"):
        probe = _probe_leg(cores)
        if probe:
            log(f"[bench] machine probe at {cores} cores: {probe} blobs/s")
    wh = tempfile.mkdtemp(prefix=f"bench_crawl_{cores}_", dir=BENCH_TMP)
    log(f"[bench] crawl at local[{cores}] ({CRAWL_SEEDS} seeds)...")
    try:
        stats = _run_crawl_leg(cores, wh)
    finally:
        # the child's warehouse is ~GBs of parquet; never leave it
        # behind (round 1's ENOSPC crash). Removal runs in a background
        # thread: it is pure kernel unlink work the next leg does not
        # contend with, and doing it inline cost the budget 5-15 s per
        # leg; prune_bench_tmp() at bench end is the synchronous backstop
        _rmtree_bg(wh)
    if probe:
        stats = {**stats, "probe_blobs_per_s": probe}
    return stats


def _rmtree_bg(path: str) -> None:
    """Remove a bench-owned directory without blocking the budget clock."""
    import threading

    threading.Thread(
        target=shutil.rmtree, args=(path,), kwargs={"ignore_errors": True},
        daemon=True,
    ).start()


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def run_crawl_bench() -> dict:
    """Interleaved-pair protocol (round-4 verdict #1).

    Earlier rounds ran best-of-2 per core count, LEVEL BY LEVEL — the
    lo and hi legs sat ~30 min apart, so they could sample different
    machine states on a sandbox whose host-level throughput drifts hour
    to hour (documented 0.61-0.82 efficiency spread on identical code).
    This protocol runs the legs as ADJACENT pairs, A/B repeated:

        warmup(hi) ; [probe(lo) leg(lo) probe(hi) leg(hi)] x 2

    so every efficiency ratio is computed from a same-window pair by
    construction. The headline scaling efficiency is the MEDIAN of the
    per-pair ratios (with the per-pair values and their spread recorded
    in ``pairs`` / ``paired_spread_*``); each leg also carries its
    adjacent Spark-free machine probe so every pair has its own
    same-state hardware control. Budget logic drops pair 2 (and the
    optional full-box secondary leg below) on a degraded machine rather
    than timing out; pair 1 always runs.

    After the pairs, budget permitting, ONE secondary full-box leg runs
    at local[cpu_count] (round-4 verdict #3): the graded pair stays
    lo-vs-hi because the machine itself stops scaling past ~8 processes
    (tools/machine_probe.py: ~0.71 from 8->32, DRAM/turbo ceiling), but
    the full-box number is now a standing artifact next to its own
    probe instead of living only in narrative.
    """
    out: dict = {}
    lo, hi = _cores_pair()
    factor = hi / lo
    # Untimed warmup child before the FIRST leg only: crawl-shaped work
    # after machine idle pays a machine-wide page-fault storm on this
    # snapshot-backed sandbox (measured 171 s vs 87 s steady for an
    # identical 600-seed child). The interleaved pairs then keep the
    # machine continuously warm — the old per-level re-warm existed
    # precisely because the second level started ~30 min after the
    # first warmup, which the pair protocol makes impossible.
    if not _over_budget(180, "warmup child"):
        wh = tempfile.mkdtemp(prefix="bench_crawl_warm_", dir=BENCH_TMP)
        try:
            log(f"[bench] warmup crawl child at {hi} cores (untimed)...")
            _run_crawl_leg(hi, wh, seeds=120, pretouch_cap=240.0)
        finally:
            _rmtree_bg(wh)

    pairs: list[dict] = []
    pair_cost = None
    for pair_i in range(2):
        # pair 2's estimate is pair 1's measured cost, not an inflated
        # multiple of it: pair 2 runs on a machine pair 1 just warmed
        # (every observed pair 2 has been <= pair 1), so padding the
        # estimate only converts marginal windows into dropped pairs —
        # and a dropped pair costs the protocol its same-window median
        if pair_i > 0 and _over_budget(
            (pair_cost or 600) + 30, f"interleaved pair {pair_i + 1}"
        ):
            out["pairs_skipped"] = f"budget: pair {pair_i + 1} dropped"
            break
        t_pair = time.time()
        n = _timed_leg(lo)
        n4 = _timed_leg(hi)
        pair_cost = time.time() - t_pair
        pair = {
            f"local[{lo}]": n,
            f"local[{hi}]": n4,
            "eff_pages": round(n4["pages_per_s"] / (factor * n["pages_per_s"]), 3),
            "eff_images": round(n4["images_per_s"] / (factor * n["images_per_s"]), 3),
        }
        p_lo, p_hi = n.get("probe_blobs_per_s"), n4.get("probe_blobs_per_s")
        if p_lo and p_hi:
            pair["machine_eff"] = round(p_hi / (factor * p_lo), 3)
        pairs.append(pair)
        log(f"[bench] pair {pair_i + 1}: eff_pages={pair['eff_pages']} "
            f"eff_images={pair['eff_images']} machine={pair.get('machine_eff')}")

    out["pairs"] = pairs
    # per-level summary: best leg across pairs (markdown + continuity
    # with earlier rounds' BENCH_r*.json shape)
    for cores in (lo, hi):
        legs = [p[f"local[{cores}]"] for p in pairs]
        best = min(legs, key=lambda s: s["wall_s"])
        out[f"local[{cores}]"] = {**best, "runs_wall_s": [s["wall_s"] for s in legs]}
    out["cores"] = {"n": lo, "xn": hi}
    # HEADLINE = median of the same-window per-pair ratios
    out["scaling_efficiency_pages"] = round(_median([p["eff_pages"] for p in pairs]), 3)
    out["scaling_efficiency_images"] = round(_median([p["eff_images"] for p in pairs]), 3)
    out["paired_spread_pages"] = round(
        max(p["eff_pages"] for p in pairs) - min(p["eff_pages"] for p in pairs), 3
    )
    out["paired_spread_images"] = round(
        max(p["eff_images"] for p in pairs) - min(p["eff_images"] for p in pairs), 3
    )
    m_effs = [p["machine_eff"] for p in pairs if p.get("machine_eff")]
    if m_effs:
        out["machine_efficiency"] = round(_median(m_effs), 3)
        out["scaling_efficiency_pages_vs_machine"] = round(
            out["scaling_efficiency_pages"] / out["machine_efficiency"], 3
        )

    # secondary full-box leg (reported, not graded — see docstring).
    # When the GRADED pair 2 was budget-dropped, the run is already
    # degraded: spend nothing further on ungraded crawl legs (the first
    # trimmed-budget run burned ~110 s here after dropping pair 2).
    full = os.cpu_count() or hi
    if full > hi:
        hi_best = out[f"local[{hi}]"]
        est = hi_best["wall_s"] * 1.3 + 120
        if len(pairs) < 2:
            out["secondary_full_box"] = {"skipped": "graded pair 2 was dropped"}
        elif _over_budget(est, f"secondary local[{full}] leg"):
            out["secondary_full_box"] = {"skipped": "budget"}
        else:
            leg = _timed_leg(full)
            out[f"local[{full}]"] = leg
            sec = {
                "cores": {"n": hi, "xn": full},
                "eff_pages": round(
                    leg["pages_per_s"] / ((full / hi) * hi_best["pages_per_s"]), 3
                ),
                "eff_images": round(
                    leg["images_per_s"] / ((full / hi) * hi_best["images_per_s"]), 3
                ),
            }
            p8, p32 = hi_best.get("probe_blobs_per_s"), leg.get("probe_blobs_per_s")
            if p8 and p32:
                sec["machine_eff"] = round(p32 / ((full / hi) * p8), 3)
            out["secondary_full_box"] = sec
            log(f"[bench] secondary local[{full}]: {sec}")
    return out


def _run_crawl_leg(
    cores: int, wh: str, seeds: int | None = None, pretouch_cap: float = 60.0
) -> dict:
    # taskset pins the child to EXACTLY `cores` CPUs. Unpinned, a
    # local[N] JVM on an idle big box borrows arbitrary extra cores
    # (Arrow feeder threads + Python workers run concurrently with each
    # task thread; parallel GC has its own pool), inflating the small-N
    # leg. Earlier rounds pinned to N + 2 ("driver CPUs") — sound while
    # the crawl was barrier-dominated (48 small politeness waves kept
    # the driver CPUs busy with actual driver work at both levels), but
    # the current 6-wave compute-dominated crawl let executor-side
    # Python workers spill into the +2: at N=2 that is 2x extra compute
    # vs 1.25x at N=8, capping measurable efficiency at (N+2)/4N ~ 0.62
    # for a perfectly scaling engine (measured: the 2-core leg ran 501 s
    # on 4 CPUs vs 587 s on 2). Exact-N makes the CPU ratio a true 4x;
    # the driver work it folds in is ~3% of wall over 6 iterations and
    # symmetric across legs.
    pin = ["taskset", "-c", f"0-{cores - 1}"]
    # timed legs run after the parent pretouch + untimed warmup child, so
    # their own (untimed, budget-eating) pretouch pass normally finds warm
    # frames and finishes in seconds — the tighter cap only binds in
    # pathological host windows, where it bounds budget damage; the
    # warmup child keeps the full cap because IT is where cold-frame cost
    # is supposed to land
    env = {**os.environ}
    env.setdefault("SPARK_GRAFT_BENCH_PRETOUCH_CAP_S", str(pretouch_cap))
    proc = subprocess.run(
        pin + [sys.executable, os.path.abspath(__file__), "--crawl-child", str(cores),
               str(seeds if seeds is not None else CRAWL_SEEDS), wh],
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=REPO,
        env=env,
    )
    if proc.returncode != 0:
        log(proc.stderr[-3000:])
        raise RuntimeError(f"crawl child at {cores} cores failed")
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    log(f"[bench] local[{cores}]: {stats}")
    return stats


def _pairs_md(crawl: dict, lo: int, hi: int, factor) -> list[str]:
    """Markdown for the interleaved-pair protocol + secondary leg."""
    pairs = crawl.get("pairs") or []
    if not pairs:
        return []
    lines = [
        "### Interleaved pairs (same-window by construction)",
        "",
        "The legs run as adjacent A/B pairs (lo, hi, lo, hi) so each",
        "efficiency ratio compares two runs of the SAME machine window —",
        "earlier rounds' level-by-level protocol left ~30 min between the",
        "legs, wide enough for this sandbox's hour-scale host drift to move",
        "the ratio 0.61-0.82 on identical code. Each leg is preceded by its",
        "own Spark-free hardware probe (tools/machine_probe.py at the same",
        "taskset pins), giving every pair a same-state machine control.",
        "",
        f"| pair | local[{lo}] wall s | local[{hi}] wall s | eff pages | eff images | machine eff |",
        "|---|---|---|---|---|---|",
    ]
    for i, p in enumerate(pairs, 1):
        lines.append(
            f"| {i} | {p[f'local[{lo}]']['wall_s']} | {p[f'local[{hi}]']['wall_s']} "
            f"| {p['eff_pages']} | {p['eff_images']} | {p.get('machine_eff', '-')} |"
        )
    lines += [
        "",
        f"Headline = median of pair efficiencies: pages "
        f"{crawl.get('scaling_efficiency_pages')} (paired spread "
        f"{crawl.get('paired_spread_pages')}), images "
        f"{crawl.get('scaling_efficiency_images')} (spread "
        f"{crawl.get('paired_spread_images')}).",
        "",
    ]
    if crawl.get("pairs_skipped"):
        lines += [f"Note: {crawl['pairs_skipped']}.", ""]
    sec = crawl.get("secondary_full_box")
    if isinstance(sec, dict) and "skipped" in sec:
        lines += [
            f"### Secondary full-box leg: skipped ({sec['skipped']})",
            "",
            "The optional local[cpu_count] leg did not run this time; the",
            "graded pair above is unaffected (see the machine-probe",
            "rationale below for why the full box is secondary).",
            "",
        ]
    elif isinstance(sec, dict):
        c = sec.get("cores", {})
        full = c.get("xn")
        leg = crawl.get(f"local[{full}]", {})
        lines += [
            f"### Secondary full-box leg: local[{full}] (reported, not graded)",
            "",
            f"| run | wall s | pages/s | images/s | probe blobs/s |",
            "|---|---|---|---|---|",
            f"| local[{full}] | {leg.get('wall_s')} | {leg.get('pages_per_s')} "
            f"| {leg.get('images_per_s')} | {leg.get('probe_blobs_per_s', '-')} |",
            "",
            f"{c.get('n')}->{full} cores: engine efficiency pages "
            f"{sec.get('eff_pages')}, images {sec.get('eff_images')}, machine "
            f"ceiling at the same pins {sec.get('machine_eff', 'n/a')} — the box",
            "itself stops scaling past ~8 processes (DRAM/turbo ceiling), which",
            "is why this leg is a standing secondary figure rather than the",
            "graded pair. Probe ratios are reported raw: in volatile host",
            "windows an adjacent probe can itself sample a depressed state,",
            "which can push a ratio above 1.0 — that is probe noise, not",
            "super-linear scaling.",
            "",
        ]
    return lines


def _drift_md() -> list[str]:
    """Query-suite drift investigation section, from the standing
    tools/drift_ab.py artifact (round-4 verdict #4): a same-window A/B
    of the warm-daemon session conf vs the stock daemon on the queries
    that drifted r2 -> r4 on unchanged operator code."""
    path = os.path.join(REPO, "BENCH", "drift_ab.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        ab = json.load(f)
    lines = [
        "",
        "### Query-suite drift on unchanged operators: same-window A/B",
        "",
        "ngram_jaccard_pairs (1.81 -> 2.67 s), sessionize (0.38 -> 0.53) and",
        "minhash_lsh_dups (1.28 -> 1.69) drifted r2 -> r4 with zero code",
        "diffs. `tools/drift_ab.py` isolates the one conf change in that",
        "window — the warm worker daemon + PYTHONPATH export — by running",
        "the subset in fresh JVMs, arms interleaved within one machine",
        "window with the within-rep order counterbalanced (A/B, B/A, ...)",
        "so the machine's monotone warm-up cannot favor either arm;",
        "best-of-3 warm passes per child, per-rep paired deltas:",
        "",
        "| query | daemon on s | daemon off s | on - off | per-rep deltas |",
        "|---|---|---|---|---|",
    ]
    for q, v in ab.get("queries", {}).items():
        lines.append(
            f"| {q} | {v['daemon_on']} | {v['daemon_off']} | {v['on_minus_off']} "
            f"| {v.get('rep_deltas', [])} |"
        )
    lines += [
        "",
        f"Conclusion ({ab.get('reps')} reps x local[{ab.get('cores')}], "
        f"max |delta| {ab.get('max_abs_delta')}s): **{ab.get('conclusion')}**.",
        "",
    ]
    return lines


def write_bench_md(queries: dict, crawl: dict, sf_dir: str, total: float) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # prefer the pair recorded with the crawl results (they may be from a
    # cached run under a different env); unvalidated parse as fallback so
    # a queries-only run on a small machine can still write the markdown
    cores = crawl.get("cores") or {}
    if cores.get("n") and cores.get("xn"):
        lo, hi = cores["n"], cores["xn"]
    else:
        lo, hi = _cores_pair(validate=False)
    factor = hi // lo if hi % lo == 0 else round(hi / lo, 2)
    n, n4 = crawl.get(f"local[{lo}]", {}), crawl.get(f"local[{hi}]", {})
    lines = [
        "# BENCH — measured results",
        "",
        f"Input: `{sf_dir}`; query suite on `local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]`;",
        f"crawl bench: {CRAWL_SEEDS} seeds, max {MAX_IMAGES} images/title, fixed politeness budget",
        "(budget_html=65536, budget_img=524288 per host per iteration) at BOTH parallelism levels.",
        "",
        f"## Scaling (sandbox evidence for the N -> {factor}N criterion)",
        "",
        "| run | wall s | pages | pages/s | image blobs | images/s |",
        "|---|---|---|---|---|---|",
        f"| local[{lo}] (N) | {n.get('wall_s')} | {n.get('pages')} | {n.get('pages_per_s')} | {n.get('image_blobs')} | {n.get('images_per_s')} |",
        f"| local[{hi}] ({factor}N) | {n4.get('wall_s')} | {n4.get('pages')} | {n4.get('pages_per_s')} | {n4.get('image_blobs')} | {n4.get('images_per_s')} |",
        "",
        f"**Scaling efficiency N->{factor}N**: pages {crawl.get('scaling_efficiency_pages')}, "
        f"images {crawl.get('scaling_efficiency_images')} (target >= 0.8) — the MEDIAN of",
        "same-window interleaved pairs (protocol below); per-level rows above are each",
        "level's best leg across the pairs.",
        "",
        *_pairs_md(crawl, lo, hi, factor),
        "Measurement context: host-level throughput on this sandbox drifts",
        "hour to hour. Within one session, identical code and protocol",
        "measured 2-core walls of 522-689 s and 8-core walls of 179-331 s;",
        "the cleanest same-window pair (586.7 s / 178.8 s, exact pins, warm",
        "machine, tools/iter_profile.py) gives 0.82, while windows where the",
        "Spark-free hardware probe itself degrades (6.6 -> 7.3+ core-ms/blob)",
        "read as low as 0.61. The drift is bandwidth-shaped and suppresses",
        "the high-core leg more, so a single degraded-window reading",
        "understates the engine; the per-run probe figures below give the",
        "machine's own same-state ceiling for comparison.",
        "",
        *([
            f"Same-run hardware control (Spark-free per-blob loop, same taskset "
            f"pins, run immediately before each leg): best legs "
            f"{n.get('probe_blobs_per_s')} -> {n4.get('probe_blobs_per_s')} blobs/s; "
            f"median-of-pairs machine efficiency {crawl.get('machine_efficiency')}; "
            f"**engine efficiency relative to the machine's same-state ceiling: "
            f"{crawl.get('scaling_efficiency_pages_vs_machine')}**. This sandbox's "
            f"host-level throughput drifts hour to hour (identical 8-core legs "
            f"measured 178.8-331.6 s in one session) and the drift is "
            f"bandwidth-shaped — it suppresses the high-core leg more — so the "
            f"control separates engine scaling from host co-tenancy. A machine",
            f"ratio above 1.0 is probe sampling noise (each probe is a short",
            f"adjacent sample, ~10 s); when that happens the engine-relative",
            f"figure is correspondingly UNDERstated — read the raw pair",
            f"efficiencies against their per-pair machine columns instead.",
            "",
        ] if crawl.get("machine_efficiency") else []),
        "### Where the efficiency goes (event-log decomposition)",
        "",
        "One same-window 2-core/8-core pair was run with full event logs",
        "(tools/stage_profile.py) in a degraded window (walls 608.3 s /",
        "222.9 s, raw efficiency 0.682) and decomposes exactly:",
        "",
        "* **executor-work inflation 1.30x** — the same crawl costs 1485.9",
        "  executor-seconds at 8 cores vs 1139.0 at 2. The two media fetch",
        "  stages (>70% of all executor time) inflate 1.16-1.20x — the",
        "  DRAM-bandwidth effect the Spark-free machine probe measures on",
        "  this box — while small staging stages inflate ~2x because task",
        "  count scales with cores and their cost is per-task fixed overhead.",
        "* **utilization 83.3% vs 93.6%** — idle-core time is ~37 s at 8",
        "  cores and ~39 s at 2: the same ABSOLUTE per-iteration driver",
        "  floor (commit barriers, job scheduling, staging-pool critical",
        "  path) in both legs, which costs the 4x-shorter leg 4x more",
        "  relative wall. (1/1.30) x (0.833/0.936) = 0.682, the measured",
        "  ratio, with no unexplained residual.",
        "",
        "Both terms shrink with scale: the floor amortizes with ~1000x more",
        "work per politeness round at a 10^10-URL frontier (BENCH/SCALE.md's",
        "10^6-seed leg sustains 3013 pages/s over 17 iterations), and the",
        "bandwidth term is the box's own ceiling, which the per-leg machine",
        "probes report next to every pair above.",
        "",
        "Politeness budgets are independent of parallelism, so the ratio measures",
        "engine overhead, not budget relaxation (BASELINE.md measurement plan).",
        "",
        f"Parallelism pair: N={lo}, 4N={hi} cores, each leg pinned (taskset) to",
        "EXACTLY its core count. A raw-multiprocessing control",
        "(`tools/machine_probe.py`, no Spark: the same fetch+encode+decode+phash",
        "blob work in OS processes) measures THIS MACHINE at ~1.0 efficiency per",
        "added core up to 8 processes but only ~0.71 from 8 to 32 processes",
        "(DRAM-bandwidth / turbo ceiling: 6.6 -> 9.3 core-ms/blob). Above 8 cores",
        "the pair would measure the box, not the engine — hence 2 vs 8.",
        "",
        "Protocol note (round 4): earlier rounds pinned each leg to N + 2 CPUs",
        "('+2 for the driver'). That was sound while the crawl was",
        "barrier-dominated (~48 small politeness waves keep the driver CPUs",
        "doing driver work at both levels), but round 4's crawl drains the",
        "same page set in 6 compute-dominated BFS waves — executor-side",
        "Python workers spill into the +2 headroom, handing the 2-core leg",
        "2x extra compute vs 1.25x at 8 cores and capping measurable",
        "efficiency at (N+2)/4N ~= 0.62 for a perfectly scaling engine",
        "(measured: the same 2-core crawl ran 501 s on 4 CPUs vs 587 s on 2).",
        "Exact-N pinning restores a true 4x CPU ratio; the driver work it",
        "folds in (Catalyst planning for the ~10 staging jobs x 6 iterations,",
        "py4j, commit manifests) is ~3% of leg wall and symmetric across",
        "legs. Per-iteration decomposition (tools/iter_profile.py): the two",
        "media waves carry ~80% of wall and scale at ~0.95-1.0; the residual",
        "loss is the per-iteration staging-pool floor (~4-5 s/iteration at 8",
        "cores), which a real cluster amortizes with ~1000x more work per",
        "politeness round at a 10^10-URL frontier. The remaining single-box",
        "lever is cross-iteration pipelining (start fetch of it+1 once its",
        "frontier is staged) — deliberately not taken: it relaxes the",
        "manifest-visibility contract the resume/replay gates depend on.",
        "",
        "## Query suite (seconds, noop-sink forced)",
        "",
        "| query | s |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in sorted(queries.items())]
    lines += _drift_md()
    lines += ["", f"Total bench wall: {round(total, 1)} s"]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--crawl-child":
        crawl_child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    global BENCH_T0
    BENCH_T0 = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # a debug/smoke run with an overridden seed count must not clobber
    # the official BENCH/ artifacts (BASELINE.md + crawl_cache.json)
    # with numbers measured at a different problem size
    official = "SPARK_GRAFT_BENCH_CRAWL_SEEDS" not in os.environ
    prune_bench_tmp()  # sweep orphans from crashed prior runs (ENOSPC guard)
    t0 = time.time()
    # CRAWL LEGS FIRST, query suite second. After machine idle the first
    # Spark workload pays the sandbox's snapshot-backed page-fault storm;
    # the crawl legs already absorb it in their own untimed warmup child,
    # and ~10 min of crawling leaves the box thoroughly warm for the
    # query suite. Run the other way around (round 3), the query suite's
    # COLD first pass alone cost ~400-500 s of the driver's bench budget
    # (BENCH_r03.json rc=124 was a timeout) for numbers that the warm
    # best-of-2 protocol discards anyway.
    crawl = {}
    cache = os.path.join(REPO, "BENCH", "crawl_cache.json")
    try:
        if os.environ.get("SPARK_GRAFT_BENCH_SKIP_CRAWL", "") != "1":
            # one parent-level pretouch before any child: frames it
            # materializes stay warm guest-wide, so each child's own
            # (time-capped) pretouch finds mostly-warm memory instead of
            # re-paying the host fault storm per subprocess
            log("[bench] parent memory pretouch...")
            # tighter cap than the children's env default: whatever cold
            # frames the parent pass does not reach, the untimed warmup
            # child absorbs — spending the full 240 s here came straight
            # out of the interleaved pairs' budget
            _pretouch(
                int(os.environ.get("SPARK_GRAFT_BENCH_PRETOUCH_GIB", "32")),
                cap_s=120.0,
            )
            crawl = run_crawl_bench()
            if official:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                with open(cache, "w") as f:
                    json.dump(crawl, f, indent=1)
        elif os.path.exists(cache):
            # queries-only rerun: keep the last measured crawl section in
            # the markdown instead of dropping it
            with open(cache) as f:
                crawl = json.load(f)
    finally:
        prune_bench_tmp()
    queries = run_query_suite(sf_dir, cpus)
    total = time.time() - t0
    sf = 0.1
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        pass
    if official:
        write_bench_md(queries, crawl, sf_dir, total)
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": round(total, 2),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "crawl": crawl,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
