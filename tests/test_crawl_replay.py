"""Golden replay tests — the BASELINE.json correctness gate.

The distributed engine and the serial reference simulator crawl the same
synthetic world under the same seed list and politeness budget; assert:

* exact fetch ordering per host (iteration by iteration),
* identical final URL-seen set,
* identical dead-letter set,
* per-row payload invariants: caption string equality and decoded-pixel
  fidelity (exact for PNG, PSNR>=40dB for lossy) vs the site's source
  pixels (input_hint).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from film_crawler_spark.functions.images import decode_image, psnr
from film_crawler_spark.operators.politeness import PolitenessConfig
from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
from film_crawler_spark.simulator import simulate
from film_crawler_spark.sources.synthetic_site import SiteConfig, SyntheticSite, make_seed_ids
from film_crawler_spark.sources.tableio import TableIO

SITE = SiteConfig(max_images_per_title=60)
POL = PolitenessConfig(budget_html=16, budget_img=200)
SEEDS = make_seed_ids(10)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    cfg = CrawlConfig(warehouse=wh, site=SITE, politeness=POL, max_iterations=32)
    run_crawl(spark, SEEDS, cfg)
    return TableIO(spark, wh)


@pytest.fixture(scope="module")
def sim():
    return simulate(SEEDS, SITE, POL, reverse_seeds=True, max_iterations=32)


def test_exact_fetch_order_per_host(crawled, sim):
    log = (
        crawled.read_log("fetch_log")
        .select("host", "iteration", "priority", "seq", "canon_url")
        .collect()
    )
    engine_order: dict[str, list[str]] = {}
    for r in sorted(log, key=lambda r: (r["iteration"], r["priority"], r["seq"])):
        engine_order.setdefault(r["host"], []).append(r["canon_url"])
    assert set(engine_order) == set(sim.fetch_order)
    for host in sim.fetch_order:
        assert engine_order[host] == sim.fetch_order[host], f"order mismatch on {host}"


def test_identical_seen_set(crawled, sim):
    engine_seen = {r["canon_url"] for r in crawled.read_log("seen").select("canon_url").collect()}
    assert engine_seen == sim.seen


def test_identical_dead_letter_set(crawled, sim):
    engine_dead = {
        (r["canon_url"], r["last_error"])
        for r in crawled.read_log("dead_letter").collect()
    }
    assert engine_dead == {(c, f"http_{s}") for c, s in sim.dead}


def test_caption_equality_and_image_set(crawled, sim):
    rows = crawled.read_log("images").select("image_id", "caption").collect()
    engine_caps = {r["image_id"]: r["caption"] for r in rows}
    sim_with_ori = {rm: v for rm, v in sim.images.items() if "ori" in v.get("renditions", {})}
    assert set(engine_caps) == set(sim_with_ori)
    for rm, v in sim_with_ori.items():
        assert engine_caps[rm] == v["caption"], rm


def test_pixel_invariants(crawled):
    site = SyntheticSite(SITE)
    rows = crawled.read_log("images").limit(40).collect()
    assert rows
    lossy_checked = lossless_checked = 0
    for r in rows:
        px, fmt = decode_image(bytes(r["bytes"]))
        assert fmt == r["fmt"] and px.shape[1] == r["w"] and px.shape[0] == r["h"]
        src = site.image_pixels(r["image_id"], "ori")
        if fmt == "png":
            assert np.array_equal(px, src)
            lossless_checked += 1
        else:
            assert psnr(src, px) >= 40.0
            lossy_checked += 1
    assert lossless_checked and lossy_checked


def test_renditions_complete(crawled, sim):
    from film_crawler_spark.plans.crawl_loop import renditions_view

    rend = (
        renditions_view(crawled)
        .groupBy("rm")
        .agg(F.collect_set("rendition").alias("rs"))
        .collect()
    )
    engine = {r["rm"]: set(r["rs"]) for r in rend}
    for rm, v in sim.images.items():
        if v.get("renditions"):
            assert engine.get(rm) == set(v["renditions"]), rm


def test_titles_match(crawled, sim):
    rows = crawled.read_log("titles").select("tt", "n_images").collect()
    assert {r["tt"]: r["n_images"] for r in rows} == sim.titles


def test_sections_match_ground_truth(crawled, sim):
    """F6 fan-out + §2.11 section parsers: every fetched section page's
    parsed rows equal the site's ground-truth rows, in page order."""
    from film_crawler_spark.operators.parse import SECTION_COLUMNS, section_view

    rows = crawled.read_log("sections").collect()
    engine: dict = {}
    for r in sorted(rows, key=lambda r: r["ord"]):
        engine.setdefault((r["tt"], r["section"]), []).append((r["f1"], r["f2"], r["f3"]))
    sim_nonempty = {k: v for k, v in sim.sections.items() if v}
    assert engine == sim_nonempty
    # typed views expose the reference CSV schemas (keywords.csv, ...)
    sec_df = crawled.read_log("sections")
    for sec, cols in SECTION_COLUMNS.items():
        v = section_view(sec_df, sec)
        assert v.columns == ["tt", "ord"] + cols


def test_reviews_match_ground_truth(crawled, sim):
    """S5 load-more reviews: parsed rows equal ground truth, in the
    newest-first reveal order, for every title whose reviews page was
    fetched successfully."""
    rows = crawled.read_log("reviews").collect()
    engine: dict = {}
    for r in sorted(rows, key=lambda r: r["ord"]):
        engine.setdefault(r["tt"], []).append(
            (r["review_id"], r["rating"], r["title"], r["name"], r["date"], r["text"], r["action"])
        )
    sim_nonempty = {k: v for k, v in sim.reviews.items() if v}
    assert engine == sim_nonempty


def test_persons_match_ground_truth(crawled, sim):
    """Cross-entity crawl (reference nmIMDB spider): every person page
    reached through a fullcredits link yields the ground-truth hero
    fields (person base.csv shape: id, name, jobs, born)."""
    rows = crawled.read_log("persons").collect()
    engine = {r["nm"]: (r["name"], r["jobs"], r["born"], r["n_credits"]) for r in rows}
    assert engine == sim.persons
    assert engine  # the fixture world must actually contain persons


def test_credits_match_ground_truth(crawled, sim):
    """F3 filmography pagination (ceil(n/50), reference spiders.py:2382-
    2407): credits equal ground truth in (page, ord) order per person."""
    rows = crawled.read_log("credits").collect()
    engine: dict = {}
    for r in sorted(rows, key=lambda r: (r["page"], r["ord"])):
        engine.setdefault(r["nm"], []).append((r["tt"], r["title"]))
    sim_nonempty = {k: [tuple(t) for t in v] for k, v in sim.credits.items() if v}
    assert engine == sim_nonempty


def test_metrics_lineage_present(crawled):
    m = crawled.read_log("metrics")
    assert {"iteration", "partition_id", "host", "kind", "status", "pages", "bytes"} <= set(m.columns)
    assert m.count() > 0


def test_robots_respected(crawled, sim):
    """No fetched URL may fall under a robots-disallowed prefix, and the
    engine records the denied seeds (north_rule robots handling)."""
    site = SyntheticSite(SITE)
    fetched = [r["canon_url"] for r in crawled.read_log("fetch_log").select("canon_url").collect()]
    for u in fetched:
        assert "/private/" not in u
    denied = crawled.read_log("robots_denied")
    blocked_seeds = {s for s in set(SEEDS) if site.is_private(s)}
    denied_tts = {
        r["canon_url"].split("/title/")[1].rstrip("/")
        for r in denied.collect()
    }
    assert denied_tts == blocked_seeds
