"""The synthetic world must be deterministic, parseable, and honor the
reference's structural constants (48/page grid, ori-URL derivability,
skewed hosts, seeded error statuses)."""

import re

from film_crawler_spark.functions.images import decode_image, psnr
from film_crawler_spark.functions.urls import ori_url
from film_crawler_spark.sources.synthetic_site import PER_PAGE, SiteConfig, SyntheticSite, make_seed_ids


def test_determinism():
    a, b = SyntheticSite(), SyntheticSite()
    for tt in ["tt0000001", "tt0000050"]:
        u = a.title_url(tt)
        assert u == b.title_url(tt)
        assert a.fetch(u).text == b.fetch(u).text
        rm = a.rm_id(tt, 0)
        assert a.image_bytes(rm, "ori") == b.image_bytes(rm, "ori")


def test_pagination_consistency():
    site = SyntheticSite()
    tt = next(t for t in (f"tt{i:07d}" for i in range(1, 200)) if site.n_images(t) > PER_PAGE)
    n = site.n_images(tt)
    host = site.host_of_title(tt)
    total = 0
    pages = -(-n // PER_PAGE)
    for p in range(1, pages + 1):
        body = site.fetch(f"https://{host}/title/{tt}/mediaindex?page={p}").text
        links = re.findall(r"/mediaviewer/(rm\d+)", body)
        assert len(links) <= PER_PAGE
        total += len(links)
    assert total == n


def test_image_chain_and_psnr():
    site = SyntheticSite()
    tt = next(t for t in (f"tt{i:07d}" for i in range(1, 200)) if site.n_images(t) > 0)
    rm = site.rm_id(tt, 0)
    body = site.fetch(f"https://{site.host_of_title(tt)}/title/{tt}/mediaviewer/{rm}").text
    small = re.search(r'data-size="small" src="([^"]+)"', body).group(1)
    large = re.search(r'data-size="large" src="([^"]+)"', body).group(1)
    ori = ori_url(large)
    assert site.fetch(small).status == 200 or site.status_of(small, 1) != 200
    for url, size, wh in [(small, "small", (24, 32)), (large, "large", (72, 96)), (ori, "ori", (96, 128))]:
        r = SyntheticSite().fetch(url, attempt=10)  # attempt 10 heals any flaky 500
        if r.status != 200:
            continue
        px, fmt = decode_image(r.body)
        assert px.shape[:2] == wh
        if fmt == "dctq":
            assert psnr(site.image_pixels(rm, size), px) >= 40.0
        else:
            assert (px == site.image_pixels(rm, size)).all()
    assert "caption" in body and site.caption(tt, rm) in body


def test_host_skew():
    site = SyntheticSite()
    hosts = [site.host_of_title(f"tt{i:07d}") for i in range(1, 2001)]
    share0 = hosts.count("www.media-h0.com") / len(hosts)
    assert 0.4 < share0 < 0.6
    assert len(set(hosts)) == site.cfg.n_hosts


def test_error_model():
    site = SyntheticSite()
    urls = [site.title_url(f"tt{i:07d}") for i in range(1, 3001)]
    statuses = [site.status_of(u, 1) for u in urls]
    assert 0.005 < statuses.count(404) / len(statuses) < 0.05
    flaky = [u for u in urls if site.status_of(u, 1) == 500]
    assert flaky
    for u in flaky:
        # heals by max_heal_attempt+1, and 404s never heal
        assert site.status_of(u, site.cfg.max_heal_attempt + 1) == 200


def test_seed_generator_has_dupes_and_disorder():
    seeds = make_seed_ids(100)
    assert len(set(seeds)) < len(seeds)
    assert seeds != sorted(seeds)
    assert all(re.fullmatch(r"tt\d{7}", s) for s in seeds)
