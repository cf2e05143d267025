#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north_rule: the whole
pipeline runs via ``spark-submit --py-files engine.zip``).

  python tools/make_pyfiles.py              # builds dist/engine.zip
  spark-submit --master local[8] \
      --py-files dist/engine.zip run_crawl.py \
      --seeds 50 --warehouse /tmp/wh --max-iterations 32

On a real cluster the same invocation takes --master yarn/k8s and the
warehouse moves to a shared filesystem; nothing in the engine changes.
When spark-submit provides the session, we adopt it instead of building
our own master URL.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=50, help="synthetic seed count")
    ap.add_argument("--seed-file", default=None, help="optional CSV of ids (tab-sep, col 0)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--max-iterations", type=int, default=32)
    ap.add_argument("--budget-html", type=int, default=256)
    ap.add_argument("--budget-img", type=int, default=2048)
    ap.add_argument("--max-images-per-title", type=int, default=120)
    ap.add_argument("--no-reverse", action="store_true")
    ap.add_argument(
        "--repair", action="store_true",
        help="re-enqueue the dead-letter backlog of an existing warehouse "
             "(the reference's remain.csv replay, main.py:95-115) instead "
             "of seeding a crawl",
    )
    ap.add_argument(
        "--supplement", default=None, metavar="KINDS",
        help="comma-separated page kinds to re-crawl over an existing "
             "warehouse: reviews,news (append-only-new-children, the "
             "reference's main_supplement_*) and/or ratings (time-series "
             "append, the re-runnable main_ratingsIMDB)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from film_crawler_spark.operators.politeness import PolitenessConfig
    from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
    from film_crawler_spark.sources.synthetic_site import SiteConfig, make_seed_ids

    from film_crawler_spark.session import engine_conf

    # spark-submit owns the master; the engine contributes its standard
    # conf (AQE, Arrow batch shapes, shuffle partitions) BEFORE session
    # creation so it applies under --py-files deployment too
    b = SparkSession.builder.appName("film_crawler_spark")
    for k, v in engine_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    if args.seed_file:
        # reference seed semantics: tab-sep CSV, column 0, no header
        # (spiders.py:85-99) — dedup+sort happen inside init_frontier.
        # The DataFrame flows into the frontier WITHOUT a driver collect
        # (a 10^6..10^10-row seed file never touches the driver).
        seed_ids = spark.read.csv(args.seed_file, sep="\t").select(
            F.col("_c0").alias("id")
        )
    else:
        seed_ids = make_seed_ids(args.seeds)

    cfg = CrawlConfig(
        warehouse=args.warehouse,
        site=SiteConfig(max_images_per_title=args.max_images_per_title),
        politeness=PolitenessConfig(budget_html=args.budget_html, budget_img=args.budget_img),
        max_iterations=args.max_iterations,
        reverse_seeds=not args.no_reverse,
    )
    if args.supplement:
        from film_crawler_spark.plans.supplement import run_supplement

        kinds = tuple(k.strip() for k in args.supplement.split(",") if k.strip())
        res = run_supplement(spark, cfg, kinds=kinds)
        print(json.dumps(res))
        spark.stop()
        return
    if args.repair:
        from film_crawler_spark.plans.repair import run_repair

        res = run_repair(spark, cfg, progress=True)
    else:
        res = run_crawl(spark, seed_ids, cfg, progress=True)
    print(json.dumps({"iterations": len(res["iterations"]), "total_wall_s": res["total_wall_s"]}))
    spark.stop()


if __name__ == "__main__":
    main()
