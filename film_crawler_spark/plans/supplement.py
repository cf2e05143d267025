"""Supplement crawl — append-only-new-children re-crawl of reviews/news.

The reference's supplement_reviews / supplement_news jobs
(spiders.py:4284-4530, 4531-4764) re-scrape a title's reviews/news page
after the main crawl and reconcile against the existing CSV (ori_len
delta accounting in save_reviews_csv/save_news_csv, spiders.py:4361-4378,
4607-4623). The engine's restatement is exact rather than length-based:

    re-fetch every committed reviews/news page  ->  parse all children
    ->  anti-join against the stored child identity  ->  append ONLY the
    rows not yet in the table, as a new committed iteration delta.

Child identity: reviews join on (tt, review_id) — the reference's rw id
(spiders.py:1454-1458 skip-by-id is the same key); news rows carry no id
on the site, so the key is (owner, title, url, date) content identity.

Everything is declarative DataFrame work: the re-fetch derives its URL
set from the committed body-free fetch_log (no driver-side URL lists),
politeness budgets are enforced by the same budget-bounded drain the
seed jobs use, and the appended delta commits through the same atomic
manifest as a crawl iteration — read_log('reviews'/'news') readers see
old + supplement rows seamlessly. Idempotent: a second supplement run
over an unchanged site appends zero rows.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from film_crawler_spark.operators import frontier as FR
from film_crawler_spark.operators import parse as P
from film_crawler_spark.operators.fetch import fetch_drain, fetch_log_projection
from film_crawler_spark.plans.crawl_loop import CrawlConfig
from film_crawler_spark.sources.tableio import TableIO


def run_supplement(
    spark: SparkSession,
    cfg: CrawlConfig,
    kinds: tuple[str, ...] = ("reviews", "news"),
) -> dict:
    """Re-crawl the warehouse's reviews/news pages and append only new
    child rows. Returns {'iteration': it, 'reviews_new': n, 'news_new': n,
    'refetched': n}."""
    io = TableIO(spark, cfg.warehouse)
    last = io.last_committed()
    if last is None:
        raise RuntimeError("supplement needs a committed crawl warehouse")
    it = last + 1
    t0 = time.time()

    flog = io.read_log("fetch_log")
    frontier_cols = [f.name for f in FR.FRONTIER_SCHEMA.fields]
    targets = (
        flog.filter(
            F.col("page_kind").isin(*kinds)
            & (F.col("status") == 200)
            & (~F.col("budget_denied"))
        )
        .select(*frontier_cols)
        .withColumn("attempts", F.lit(0))
        .dropDuplicates(["canon_url"])
    )

    fetched = fetch_drain(targets, cfg.site, cfg.politeness)
    ok = fetched.filter(F.col("status") == 200)

    staged: list[str] = []
    summary: dict = {"iteration": it}

    if "reviews" in kinds:
        parsed = P.extract_reviews(ok)
        existing = io.read_log("reviews")
        new = (
            parsed
            if existing is None
            else parsed.join(
                existing.select("tt", "review_id").distinct(),
                ["tt", "review_id"],
                "left_anti",
            )
        ).withColumn("iteration", F.lit(it))
        io.stage(new, "reviews", it)
        staged.append("reviews")
        summary["reviews_new"] = spark.read.parquet(io._tdir("reviews", it)).count()

    if "news" in kinds:
        parsed = P.extract_news(ok).withColumn("_owner", F.coalesce("tt", "nm"))
        existing = io.read_log("news")
        if existing is None:
            new = parsed
        else:
            # owner is coalesced on BOTH sides: tt/nm are each null on the
            # other entity's rows, and a plain multi-column anti-join would
            # treat null keys as never-matching (re-appending every person
            # news row on every run)
            seen_keys = (
                existing.select(
                    F.coalesce("tt", "nm").alias("_owner"), "title", "url", "date"
                ).distinct()
            )
            new = parsed.join(seen_keys, ["_owner", "title", "url", "date"], "left_anti")
        new = new.drop("_owner").withColumn("iteration", F.lit(it))
        io.stage(new, "news", it)
        staged.append("news")
        summary["news_new"] = spark.read.parquet(io._tdir("news", it)).count()

    # body-free lineage of the re-fetch, same shape as the crawl's
    # fetch_log (shared projection — the two writers must never drift).
    # The URLs are already in the seen set, so no seen delta.
    supp_log = fetch_log_projection(fetched, it)
    io.stage(supp_log, "fetch_log", it)
    staged.append("fetch_log")

    summary["refetched"] = supp_log.count()
    summary["wall_s"] = round(time.time() - t0, 3)
    # carry the crawl's manifest hint chain forward: a resumed
    # run_iteration(it+1) reads THIS summary for its seen/pending/robots
    # hints — dropping them would read seen_total=0, silently disable
    # bloom maintenance, and leave a stale bloom snapshot that re-admits
    # already-fetched URLs (a T7 exactly-once violation). The supplement
    # re-fetches only already-seen URLs and stages no frontier, so the
    # previous values pass through unchanged.
    prev = io.manifest(last).get("summary", {})
    for key in ("seen_total", "pending_next", "init_seeds", "n_robots"):
        if key in prev:
            summary[key] = prev[key]
    io.commit(it, staged, extra={"summary": summary, "supplement": True})
    return summary
