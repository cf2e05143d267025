"""Bloom seen-set guarantees + physical-choice invariance.

The north_rule's seen-set design (sharded Bloom pre-filter + exact
anti-join) must be *semantically invisible*: no false negatives ever
(a false negative = a lost URL), bounded false-positive rate (a false
positive = one wasted exact lookup), and a crawl run with every scale
knob flipped (Bloom probing on, salted dequeue on) must produce
bit-identical frontier ordering / seen set / results to the plain
small-scale plan.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from film_crawler_spark.operators.politeness import PolitenessConfig
from film_crawler_spark.operators.seen import BloomSeenSet, filter_unseen
from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
from film_crawler_spark.simulator import simulate
from film_crawler_spark.sources.synthetic_site import SiteConfig, make_seed_ids
from film_crawler_spark.sources.tableio import TableIO


def _hash_df(spark, values, n_shards=8, m_bits=1 << 16):
    bs = BloomSeenSet(n_shards, m_bits)
    df = spark.createDataFrame([(v,) for v in values], "canon_url string")
    return bs, df.select(
        "canon_url",
        bs.shard_col(F.col("canon_url")).alias("shard"),
        bs.hash_col(F.col("canon_url")).alias("url_hash"),
    )


def test_bloom_no_false_negatives_and_fpr(spark):
    seen_urls = [f"https://h{i % 7}.com/title/tt{i:07d}/" for i in range(2000)]
    other_urls = [f"https://h{i % 7}.com/title/tt{i:07d}/" for i in range(2000, 6000)]
    bs, seen = _hash_df(spark, seen_urls)
    bloom = bs.merge(None, seen.select("shard", "url_hash"))

    _, probe_seen = _hash_df(spark, seen_urls)
    hits = bs.probe(probe_seen, bloom).filter(~F.col("maybe_seen")).count()
    assert hits == 0  # every inserted key MUST report maybe_seen

    _, probe_other = _hash_df(spark, other_urls)
    fp = bs.probe(probe_other, bloom).filter(F.col("maybe_seen")).count()
    # 2000 keys over 8 shards x 64 KiB bitmaps, k=7 => FPR well under 1%
    assert fp / len(other_urls) < 0.01


def test_filter_unseen_equals_exact_anti_join(spark):
    seen_urls = [f"https://h.com/a{i}" for i in range(500)]
    cand_urls = [f"https://h.com/a{i}" for i in range(300, 900)]
    bs, seen = _hash_df(spark, seen_urls)
    bloom = bs.merge(None, seen.select("shard", "url_hash"))
    _, cand = _hash_df(spark, cand_urls)
    got = {
        r["canon_url"]
        for r in filter_unseen(cand, seen.select("canon_url"), bs, bloom).collect()
    }
    assert got == set(cand_urls) - set(seen_urls)


def test_filter_unseen_respects_lagging_bloom_delta(spark):
    """A URL fetched AFTER the bloom snapshot was built (the current
    iteration's seen delta) must not be re-enqueued even though the
    bloom reports it 'definitely unseen' (T7 exactly-once; the
    same-iteration re-discovery gap from round-1 ADVICE)."""
    committed = [f"https://h.com/a{i}" for i in range(200)]
    delta = [f"https://h.com/b{i}" for i in range(50)]  # fetched this iter
    cands = committed[150:] + delta[:30] + [f"https://h.com/c{i}" for i in range(40)]
    bs, seen = _hash_df(spark, committed)
    bloom = bs.merge(None, seen.select("shard", "url_hash"))  # lags: no delta
    all_seen = spark.createDataFrame(
        [(u,) for u in committed + delta], "canon_url string"
    )
    delta_df = spark.createDataFrame([(u,) for u in delta], "canon_url string")
    _, cand = _hash_df(spark, cands)
    got = {
        r["canon_url"]
        for r in filter_unseen(cand, all_seen, bs, bloom, delta_exact=delta_df).collect()
    }
    assert got == set(cands) - set(committed) - set(delta)
    # without the delta window, the delta URLs WOULD leak through (the bug)
    leaked = {
        r["canon_url"]
        for r in filter_unseen(cand, all_seen, bs, bloom).collect()
    }
    assert set(delta[:30]) & leaked  # documents why delta_exact exists


def test_filter_unseen_delta_bloom_false_positive(spark):
    """A delta URL that the bloom (wrongly or staleness-aside) reports
    maybe_seen=True while seen_exact lacks it must STILL be filtered by
    the delta anti-join — conditioning that join on ~maybe_seen let it
    survive both joins (round-2 ADVICE, T7 violation). Forced
    deterministically: the URL's hash is inserted into the bloom, but
    only the delta (not seen_exact) contains it."""
    committed = [f"https://h.com/a{i}" for i in range(100)]
    fp_url = "https://h.com/fp-this-iter"
    bs, seen = _hash_df(spark, committed + [fp_url])  # bloom sees fp_url
    bloom = bs.merge(None, seen.select("shard", "url_hash"))
    seen_exact = spark.createDataFrame([(u,) for u in committed], "canon_url string")
    delta_df = spark.createDataFrame([(fp_url,)], "canon_url string")
    _, cand = _hash_df(spark, committed[90:] + [fp_url, "https://h.com/new"])
    got = {
        r["canon_url"]
        for r in filter_unseen(cand, seen_exact, bs, bloom, delta_exact=delta_df).collect()
    }
    assert fp_url not in got
    assert got == {"https://h.com/new"}


@pytest.mark.parametrize("scale_knobs", [True])
def test_crawl_invariant_under_physical_choices(spark, tmp_path, scale_knobs):
    """Same crawl with Bloom probing active from iteration 1 and the
    salted two-phase dequeue forced on => identical fetch order, seen
    set and image count as the serial simulator (and therefore as the
    default-knob run, which the replay tests pin to the same oracle)."""
    site = SiteConfig(max_images_per_title=50)
    pol = PolitenessConfig(budget_html=32, budget_img=400)
    seeds = make_seed_ids(8)
    cfg = CrawlConfig(
        warehouse=str(tmp_path / "wh"),
        site=site,
        politeness=pol,
        max_iterations=24,
        bloom_probe_min_seen=0,  # Bloom path active as soon as possible
        salt_min_pending=0,      # salted dequeue always on
        n_salts=4,
    )
    run_crawl(spark, seeds, cfg)
    io = TableIO(spark, cfg.warehouse)
    sim = simulate(seeds, site, pol, reverse_seeds=True, max_iterations=24)

    log = io.read_log("fetch_log").select("host", "iteration", "priority", "seq", "canon_url").collect()
    engine_order: dict = {}
    for r in sorted(log, key=lambda r: (r["iteration"], r["priority"], r["seq"])):
        engine_order.setdefault(r["host"], []).append(r["canon_url"])
    assert engine_order == sim.fetch_order

    engine_seen = {r["canon_url"] for r in io.read_log("seen").select("canon_url").collect()}
    assert engine_seen == sim.seen

    n_ori = sum(1 for v in sim.images.values() if "ori" in v.get("renditions", {}))
    assert io.read_log("images").count() == n_ori
    # the bloom snapshot table must actually have been maintained
    assert io.read_snapshot("bloom") is not None
