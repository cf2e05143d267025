#!/usr/bin/env python
"""Per-iteration decomposition of the OFFICIAL bench crawl leg.

Runs exactly bench.py's crawl child (same site, politeness budget,
seed construction, taskset-equivalent core pin is the caller's job)
but prints every iteration's summary dict (wall_s, fetch_s, stage_s
per table, fetched/pending counts) so the fixed per-iteration floor
and the long-tail iterations are visible — the data behind the N->4N
efficiency tuning in BENCH/BASELINE.md.

Usage: taskset -c 0-9 python tools/iter_profile.py --cores 8 --seeds 1200
Prints one JSON line per iteration on stdout + a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=1200)
    ap.add_argument("--max-iterations", type=int, default=48)
    args = ap.parse_args()

    from film_crawler_spark.operators.politeness import PolitenessConfig
    from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
    from film_crawler_spark.session import get_spark, warmup
    from film_crawler_spark.sources.synthetic_site import SiteConfig, make_seed_ids

    wh = tempfile.mkdtemp(prefix="iterprof_", dir=TMP)
    scratch = tempfile.mkdtemp(prefix="iterprof_scratch_", dir=TMP)
    spark = get_spark(
        app_name=f"fcs-iterprof-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": scratch,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(
        warehouse=wh,
        site=SiteConfig(max_images_per_title=120),
        politeness=PolitenessConfig(budget_html=65536, budget_img=524288),
        max_iterations=args.max_iterations,
    )
    warmup(spark)
    from bench import _pretouch  # same untimed frame-materialization as the bench

    _pretouch(int(os.environ.get("SPARK_GRAFT_BENCH_PRETOUCH_GIB", "32")))
    t0 = time.time()
    res = run_crawl(spark, make_seed_ids(args.seeds), cfg)
    wall = time.time() - t0
    for s in res["iterations"]:
        print(json.dumps(s), flush=True)
    its = res["iterations"]
    pages = sum(s["fetched"] - s["fetched_media"] for s in its)
    blobs = sum(s["fetched_image_blobs"] for s in its)
    print(
        json.dumps(
            {
                "total": True,
                "cores": args.cores,
                "seeds": args.seeds,
                "wall_s": round(wall, 1),
                "pages": pages,
                "image_blobs": blobs,
                "pages_per_s": round(pages / wall, 2),
            }
        ),
        flush=True,
    )
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
