"""Supplement (append-only-new-children) semantics — the engine twin of
the reference's supplement_reviews / supplement_news jobs
(spiders.py:4284-4530, 4531-4764): after the main crawl, the site grows
new review/news children; a supplement run re-fetches those pages and
appends EXACTLY the new rows, leaving the stored prefix untouched, and a
second run over the unchanged site appends nothing."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from film_crawler_spark.operators.politeness import PolitenessConfig
from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
from film_crawler_spark.plans.supplement import run_supplement
from film_crawler_spark.sources.synthetic_site import SiteConfig, make_seed_ids
from film_crawler_spark.sources.tableio import TableIO

SITE = SiteConfig(max_images_per_title=10, max_images_per_person=5,
                  max_videos_per_title=5, max_videos_per_person=3)
POL = PolitenessConfig(budget_html=16, budget_img=200)
SEEDS = make_seed_ids(8)
EXTRA = 2


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("suppwh"))
    cfg = CrawlConfig(warehouse=wh, site=SITE, politeness=POL, max_iterations=32)
    run_crawl(spark, SEEDS, cfg)
    return wh


def _rows(io, table):
    return {
        tuple(r)
        for r in io.read_log(table)
        .drop("iteration")
        .collect()
    }


def test_supplement_appends_exactly_new_children(spark, warehouse):
    io = TableIO(spark, warehouse)
    before_reviews = _rows(io, "reviews")
    before_news = _rows(io, "news")
    flog = io.read_log("fetch_log")
    ok_pages = {
        k: flog.filter(
            (F.col("page_kind") == k) & (F.col("status") == 200)
            & (~F.col("budget_denied"))
        ).select("canon_url").distinct().count()
        for k in ("reviews", "news")
    }
    assert ok_pages["reviews"] and ok_pages["news"]

    grown = dataclasses.replace(SITE, supplement_extra=EXTRA)
    cfg = CrawlConfig(warehouse=warehouse, site=grown, politeness=POL)
    crawl_summary = io.manifest(io.last_committed())["summary"]
    s = run_supplement(spark, cfg)
    # the manifest hint chain must survive a supplement commit: a resumed
    # run_iteration reads seen_total/pending_next/n_robots from the LAST
    # summary — dropping them silently disables (then stales) bloom
    # maintenance, a T7 exactly-once violation
    supp_summary = io.manifest(io.last_committed())["summary"]
    for key in ("seen_total", "pending_next", "n_robots"):
        assert supp_summary[key] == crawl_summary[key], key
    assert s["reviews_new"] == EXTRA * ok_pages["reviews"]
    assert s["news_new"] == EXTRA * ok_pages["news"]

    after_reviews = _rows(io, "reviews")
    after_news = _rows(io, "news")
    # prefix untouched, new rows appended with continuing ordinals
    assert before_reviews <= after_reviews
    assert before_news <= after_news
    assert len(after_reviews) == len(before_reviews) + s["reviews_new"]
    assert len(after_news) == len(before_news) + s["news_new"]
    # person news pages are supplemented too (nm-keyed rows present)
    new_news = after_news - before_news
    nm_col = [f.name for f in io.read_log("news").schema.fields].index("nm")
    assert any(r[nm_col] for r in new_news)

    # idempotent: same grown site, second run appends nothing
    s2 = run_supplement(spark, cfg)
    assert s2["reviews_new"] == 0 and s2["news_new"] == 0
    assert _rows(io, "reviews") == after_reviews
    assert _rows(io, "news") == after_news


def test_supplement_ratings_time_series(spark, warehouse):
    """K2 ratings re-crawl (reference main_ratingsIMDB re-runs append a
    new time_stamped row per title, spiders.py:4941-4959, 5037): two
    supplement passes over the same site yield two extra dated rows per
    title, each pass at a later synthetic fetched_at — a rating history,
    NOT an idempotent dedup."""
    from film_crawler_spark.operators.parse import synthetic_fetch_time

    io = TableIO(spark, warehouse)
    cfg = CrawlConfig(warehouse=warehouse, site=SITE, politeness=POL)
    before = io.read_log("ratings").collect()
    by_tt: dict = {}
    for r in before:
        by_tt.setdefault(r["tt"], []).append(r)
    n_titles = len(by_tt)
    assert n_titles  # the module crawl fetched ratings pages

    s1 = run_supplement(spark, cfg, kinds=("ratings",))
    s2 = run_supplement(spark, cfg, kinds=("ratings",))
    assert s1["ratings_new"] == n_titles
    assert s2["ratings_new"] == n_titles

    after = io.read_log("ratings").collect()
    assert len(after) == len(before) + 2 * n_titles
    for tt, crawl_rows in by_tt.items():
        rows = sorted(
            (r for r in after if r["tt"] == tt), key=lambda r: r["fetched_at"]
        )
        assert len(rows) == len(crawl_rows) + 2
        # the two supplement rows carry THEIR run's iteration timestamp,
        # strictly after the crawl-time row(s)
        assert rows[-2]["fetched_at"] == synthetic_fetch_time(s1["iteration"])
        assert rows[-1]["fetched_at"] == synthetic_fetch_time(s2["iteration"])
        assert rows[-1]["fetched_at"] > rows[-2]["fetched_at"] > rows[0]["fetched_at"]
        # the rating payload itself is unchanged (same site)
        payload = lambda r: (
            r["tot_users"], r["weighted_avg"], r["rating_by_score"],
            r["arithmetic_mean"], r["median"], r["rating_by_users"],
        )
        assert payload(rows[-1]) == payload(rows[0])


def test_supplement_counts_ride_the_write_jobs(spark, warehouse):
    """The verdict-3 fix: per-table appended counts come from Observation
    metrics on the staging writes — a supplement run launches no
    read-back count jobs. Gate: the whole reviews+news run fits in the
    job budget of (1 target-derivation-free fetch_drain chain + one write
    job per staged table); a regression to read-back counts adds one job
    per table and trips the bound."""
    sc = spark.sparkContext
    io = TableIO(spark, warehouse)
    cfg = CrawlConfig(warehouse=warehouse, site=SITE, politeness=POL)
    sc.setJobGroup("supp_jobs", "supplement job-count gate")
    try:
        run_supplement(spark, cfg)  # reviews + news, zero new rows
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("supp_jobs")
    # measured at this fixture: 22 jobs (the budget-bounded fetch_drain
    # loop's per-pass isEmpty/dequeue/checkpoint chain + one write job
    # per staged table, counts observed in-job). The old read-back
    # pattern adds one count job per staged table (+3 here) — the bound
    # sits between the two.
    assert len(jobs) <= 24, f"supplement ran {len(jobs)} jobs: {sorted(jobs)}"
