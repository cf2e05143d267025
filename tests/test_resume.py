"""Checkpoint/resume: a crawl interrupted after k iterations and resumed
must converge to logically identical tables vs an uninterrupted run
(engine T3; reference counterpart: epoch checkpoint file,
spiders.py:215-218, 278-281 — the engine's manifest commit supersedes
the .bak dance)."""

from pyspark.sql import functions as F

from film_crawler_spark.operators.politeness import PolitenessConfig
from film_crawler_spark.plans.crawl_loop import CrawlConfig, run_crawl
from film_crawler_spark.sources.synthetic_site import SiteConfig, make_seed_ids
from film_crawler_spark.sources.tableio import TableIO

SITE = SiteConfig(max_images_per_title=30)
POL = PolitenessConfig(budget_html=8, budget_img=100)
SEEDS = make_seed_ids(6)


def _snapshot(io: TableIO) -> dict:
    out = {}
    for t, keys in [
        ("seen", ["canon_url"]),
        ("images", ["image_id", "caption", "phash", "w", "h", "fmt"]),
        ("fetch_log", ["iteration", "host", "priority", "seq", "canon_url", "status"]),
        ("dead_letter", ["url", "last_error"]),
    ]:
        df = io.read_log(t)
        out[t] = sorted(tuple(r) for r in df.select(*keys).collect())
    return out


def test_resume_equals_uninterrupted(spark, tmp_path):
    wh_a, wh_b = str(tmp_path / "a"), str(tmp_path / "b")
    # uninterrupted
    run_crawl(spark, SEEDS, CrawlConfig(warehouse=wh_a, site=SITE, politeness=POL, max_iterations=64))
    # interrupted after 2 iterations, then resumed (same warehouse)
    cfg_b = CrawlConfig(warehouse=wh_b, site=SITE, politeness=POL, max_iterations=2)
    run_crawl(spark, SEEDS, cfg_b)
    io_b = TableIO(spark, wh_b)
    assert io_b.last_committed() is not None and io_b.last_committed() < 30
    cfg_b2 = CrawlConfig(warehouse=wh_b, site=SITE, politeness=POL, max_iterations=64)
    run_crawl(spark, SEEDS, cfg_b2)

    snap_a, snap_b = _snapshot(TableIO(spark, wh_a)), _snapshot(io_b)
    for t in snap_a:
        assert snap_a[t] == snap_b[t], f"table {t} diverged after resume"


def test_compaction_invariance(spark, tmp_path):
    """Seen/caption log compaction is a physical choice only: a crawl
    compacting every 2 iterations must produce byte-identical logical
    tables vs one that never compacts, resume across a compaction
    boundary included — while reads touch O(compact_every) directories
    instead of O(crawl age)."""
    wh_n = str(tmp_path / "nocompact")
    wh_c = str(tmp_path / "compact")
    run_crawl(spark, SEEDS, CrawlConfig(
        warehouse=wh_n, site=SITE, politeness=POL, max_iterations=64, compact_every=0))
    # compacted run, interrupted right after a compaction boundary
    cfg1 = CrawlConfig(warehouse=wh_c, site=SITE, politeness=POL,
                       max_iterations=3, compact_every=2)
    run_crawl(spark, SEEDS, cfg1)
    run_crawl(spark, SEEDS, CrawlConfig(
        warehouse=wh_c, site=SITE, politeness=POL, max_iterations=64, compact_every=2))
    io_n, io_c = TableIO(spark, wh_n), TableIO(spark, wh_c)
    snap_n, snap_c = _snapshot(io_n), _snapshot(io_c)
    for t in snap_n:
        assert snap_n[t] == snap_c[t], f"table {t} diverged under compaction"
    # the base actually supersedes earlier delta dirs
    last = io_c.last_committed()
    n_dirs_c = len(io_c._committed_dirs("seen", upto=last))
    n_dirs_n = len(io_n._committed_dirs("seen", upto=io_n.last_committed()))
    assert n_dirs_c < n_dirs_n
    assert any(
        io_c.manifest(i).get("bases", {}).get("seen") == i
        for i in io_c.committed_iterations()
    )


def test_crawl_terminates_with_empty_frontier(spark, tmp_path):
    wh = str(tmp_path / "c")
    res = run_crawl(spark, SEEDS, CrawlConfig(warehouse=wh, site=SITE, politeness=POL, max_iterations=64))
    assert res["iterations"][-1]["pending_next"] == 0
    io = TableIO(spark, wh)
    pending = io.read_snapshot("frontier")
    assert pending.count() == 0
    # budget_denied never fires when dequeue caps == bucket budgets
    assert io.read_log("fetch_log").filter(F.col("budget_denied")).count() == 0
