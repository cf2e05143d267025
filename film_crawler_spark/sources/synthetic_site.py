"""Deterministic synthetic film site — the sandbox's HTTP stand-in.

The reference crawls a live site with ``requests``/Selenium (reference
spiders.py:135-154, 1508-1564). The sandbox has no network, so fetches
resolve against this pure function of (url, attempt): same URL, same
bytes, every run, every machine. That determinism is what makes the
"exact frontier ordering + identical seen set" assertions testable.

Site shape (mirrors the reference's film→photos traversal, §3.2 of
SURVEY.md):

  depth 0  /title/tt<id>/                 title page: hero fields, photo
                                          count ("N Photos" — drives the
                                          ceil(N/48) pagination of
                                          reference spiders.py:707-709)
  depth 1  /title/tt<id>/mediaindex?page=k   photo grid, <=48 rm links
  depth 2  /title/tt<id>/mediaviewer/rm<N>   caption + small/large URLs
  depth 3  https://img.media-h<j>.com/images/rm<N>.<SIZE>.<ext>
                                          image bytes (png or dctq)

Hosts are deliberately skewed: ~half of all titles live on host 0 (the
"hot host"), the rest spread uniformly — this exercises the salted-key
skew handling the north_rule demands. Errors are seeded: a slice of
URLs 404 permanently, another slice 500s until a per-URL heal attempt
(exercises the retry/dead-letter policy, reference spiders.py:116-133).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from film_crawler_spark.functions.images import dctq_encode, png_encode
from film_crawler_spark.functions.urls import murmur3_x86_32

PER_PAGE = 48  # reference spiders.py:177 PER_PAGE_OF_IMG
PER_PAGE_HIST = 50  # reference spiders.py:2052 PER_PAGE_OF_HIST (filmography)

# F6 subpage fan-out: each crawled title also fetches its section pages
# (reference spiders.py:310-329 builds 20 such URLs per title; this world
# models 10 of them — the ones whose extractions SURVEY §1.3 lists as
# fixed-schema CSVs). Order matters: it is the reference's construction
# order, and section ordinals continue after the mediaindex page ordinals.
SECTIONS = [
    "keywords", "companies", "awards", "quotes", "releaseinfo",
    "technical", "locations", "trivia", "plotsummary", "fullcredits",
]

ADJ = ["Silent", "Crimson", "Golden", "Broken", "Electric", "Midnight", "Paper", "Iron", "Hollow", "Distant"]
NOUN = ["Horizon", "Garden", "Station", "River", "Mirror", "Harvest", "Signal", "Empire", "Voyage", "Letter"]


def _h(s: str) -> int:
    return murmur3_x86_32(s.encode("utf-8")) & 0xFFFFFFFF


@dataclass(frozen=True)
class SiteConfig:
    """Knobs for the synthetic world. All content derives from (seed, id)."""

    seed: int = 42
    n_hosts: int = 4  # host 0 is hot (~50% of titles)
    hot_host_share: float = 0.5
    max_images_per_title: int = 120  # => up to 3 mediaindex pages
    p_404: float = 0.02  # permanent 404s
    p_500: float = 0.02  # flaky: 500 until heal_attempt
    max_heal_attempt: int = 3
    small_wh: tuple[int, int] = (32, 24)
    large_wh: tuple[int, int] = (96, 72)
    ori_wh: tuple[int, int] = (128, 96)
    lossy_q: float = 2.0  # keeps PSNR >= 40 dB even on noise


@dataclass
class FetchResult:
    status: int
    kind: str  # title | mediaindex | photo_detail | image_blob | error
    body: bytes = b""
    text: str = ""
    meta: dict = field(default_factory=dict)


class SyntheticSite:
    """Pure-function site resolver; safe to construct inside executors
    (cheap, stateless) — the fetch UDF builds one per partition."""

    def __init__(self, cfg: SiteConfig | None = None):
        self.cfg = cfg or SiteConfig()

    # -- identity / topology ------------------------------------------------

    def host_of_title(self, tt: str) -> str:
        h = _h(f"{self.cfg.seed}:host:{tt}")
        if (h % 1000) / 1000.0 < self.cfg.hot_host_share:
            return "www.media-h0.com"
        j = 1 + h % (self.cfg.n_hosts - 1) if self.cfg.n_hosts > 1 else 0
        return f"www.media-h{j}.com"

    def is_private(self, tt: str) -> bool:
        """~3% of titles live under /private/ — a robots-disallowed prefix
        (the reference has no robots handling; north_rule adds it)."""
        return _h(f"{self.cfg.seed}:priv:{tt}") % 100 < 3

    def title_url(self, tt: str) -> str:
        prefix = "/private" if self.is_private(tt) else ""
        return f"https://{self.host_of_title(tt)}{prefix}/title/{tt}/"

    def robots(self, host: str) -> dict:
        """Parsed robots.txt for a host: disallow prefixes + crawl delay.
        Deterministic; www hosts disallow /private/, image hosts allow all."""
        if host.startswith("www."):
            return {
                "disallow": ["/private/"],
                "crawl_delay_ms": 100 * (1 + _h(f"{self.cfg.seed}:cd:{host}") % 5),
            }
        return {"disallow": [], "crawl_delay_ms": 0}

    def title_name(self, tt: str) -> str:
        h = _h(f"{self.cfg.seed}:name:{tt}")
        return f"{ADJ[h % 10]} {NOUN[(h >> 4) % 10]} {1900 + (h >> 8) % 126}"

    def n_images(self, tt: str) -> int:
        return _h(f"{self.cfg.seed}:nimg:{tt}") % (self.cfg.max_images_per_title + 1)

    def rm_id(self, tt: str, idx: int) -> str:
        return f"rm{_h(f'{self.cfg.seed}:rm:{tt}:{idx}') % 10**9:09d}{idx % 10}"

    def caption(self, tt: str, rm: str) -> str:
        h = _h(f"{self.cfg.seed}:cap:{rm}")
        return (
            f"{self.title_name(tt)} — still {h % 97}: "
            f"{ADJ[(h >> 7) % 10].lower()} {NOUN[(h >> 11) % 10].lower()} scene"
        )

    def img_fmt(self, rm: str) -> str:
        return "png" if _h(f"{self.cfg.seed}:fmt:{rm}") % 2 == 0 else "dctq"

    def img_url(self, tt: str, rm: str, size: str) -> str:
        host = self.host_of_title(tt).replace("www.", "img.")
        ext = self.img_fmt(rm)
        spec = {"small": "UX32_CR0", "large": "UX96_CR0"}[size]
        return f"https://{host}/images/{rm}.{spec}.{ext}"

    # NOTE: the ori URL is never *constructed* by the crawler — it must be
    # derived from the large URL by the split('.')[:3]+[-1:] rule
    # (reference spiders.py:767-771); img_url yields exactly that shape.

    # -- error model ---------------------------------------------------------

    def status_of(self, url: str, attempt: int) -> int:
        h = _h(f"{self.cfg.seed}:status:{url}")
        r = (h % 10000) / 10000.0
        if r < self.cfg.p_404:
            return 404
        if r < self.cfg.p_404 + self.cfg.p_500:
            heal = 1 + (h >> 16) % self.cfg.max_heal_attempt
            if attempt < heal:
                return 500
        return 200

    # -- pixel content -------------------------------------------------------

    def image_pixels(self, rm: str, size: str) -> np.ndarray:
        """Deterministic pseudo-natural content. float32 + 1-D broadcasts
        on purpose: the original float64 mgrid version moved ~20 MB of
        temporaries per image, and at 32 concurrent fetch workers the
        resolver saturated DRAM bandwidth — inverting the engine's
        core-count scaling measurements."""
        w, h = {"small": self.cfg.small_wh, "large": self.cfg.large_wh, "ori": self.cfg.ori_wh}[size]
        rng = np.random.default_rng(_h(f"{self.cfg.seed}:px:{rm}"))
        f1, f2 = 3 + rng.integers(0, 20), 3 + rng.integers(0, 20)
        gx = (np.sin(np.arange(w, dtype=np.float32) / np.float32(f1)) * np.float32(60.0))
        gy = (np.cos(np.arange(h, dtype=np.float32) / np.float32(f2)) * np.float32(50.0))
        base = gy[:, None] + gx[None, :] + np.float32(128.0)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for c in range(3):
            gain = np.float32(rng.uniform(0.6, 1.2))
            off = np.float32(rng.uniform(-30, 30))
            chan = base * gain + off
            chan += rng.standard_normal((h, w), dtype=np.float32) * np.float32(2.0)
            np.clip(chan, 0.0, 255.0, out=chan)
            out[..., c] = chan.astype(np.uint8)
        return out

    def image_bytes(self, rm: str, size: str) -> bytes:
        px = self.image_pixels(rm, size)
        if self.img_fmt(rm) == "png":
            return png_encode(px)
        return dctq_encode(px, q=self.cfg.lossy_q)

    # -- page bodies ----------------------------------------------------------

    def _title_body(self, tt: str) -> str:
        n = self.n_images(tt)
        name = self.title_name(tt)
        h = _h(f"{self.cfg.seed}:hero:{tt}")
        rating = f"{1 + (h % 90) / 10.0:.1f}"
        meta = str(h % 101)
        return (
            f"<html><head><title>{name} - Films</title></head>\n"
            f'<body data-testid="hero">\n<h1>{name}</h1>\n'
            f'<span class="rating">{rating}/10</span>\n'
            f'<span class="metascore">{meta}</span>\n'
            f'<a href="/title/{tt}/mediaindex?page=1">photos</a>\n'
            f'<span class="image-count">{n:,} Photos</span>\n</body></html>'
        )

    def _mediaindex_body(self, tt: str, page: int) -> str:
        n = self.n_images(tt)
        first, last = (page - 1) * PER_PAGE, min(page * PER_PAGE, n)
        rows = [
            f'<a class="thumb" href="/title/{tt}/mediaviewer/{self.rm_id(tt, i)}">'
            f'<img src="{self.img_url(tt, self.rm_id(tt, i), "small")}"/></a>'
            for i in range(first, last)
        ]
        return (
            f"<html><body data-kind='mediaindex' data-page='{page}'>\n"
            + "\n".join(rows)
            + "\n</body></html>"
        )

    def _photo_detail_body(self, tt: str, rm: str) -> str:
        return (
            f"<html><body data-kind='photo'>\n"
            f'<div class="caption">{self.caption(tt, rm)}</div>\n'
            f'<img data-size="small" src="{self.img_url(tt, rm, "small")}"/>\n'
            f'<img data-size="large" src="{self.img_url(tt, rm, "large")}"/>\n'
            f"</body></html>"
        )

    # -- section pages (reference F6 subpage fan-out, spiders.py:310-329) ----

    def section_rows(self, tt: str, sec: str) -> list[tuple]:
        """Ground-truth rows for a title's section page, (f1, f2, f3)
        tuples — the deterministic stand-ins for the reference's section
        extractions (keywords/companies/awards/... CSVs, SURVEY §1.3).
        Tests compare the engine's *parsed* rows against these."""
        h = _h(f"{self.cfg.seed}:sec:{tt}:{sec}")
        n = h % 7  # 0..6 rows; some sections legitimately empty
        rows = []
        for i in range(n):
            g = _h(f"{self.cfg.seed}:sec:{tt}:{sec}:{i}")
            a, b_ = ADJ[g % 10], NOUN[(g >> 4) % 10]
            if sec == "keywords":
                rows.append((f"{a.lower()}-{b_.lower()}", None, None))
            elif sec == "companies":
                rows.append((["production", "distributor", "special effects", "other"][g % 4],
                             f"{a} {b_} Pictures", f"co{g % 10**7:07d}"))
            elif sec == "awards":
                rows.append((f"{a} Award", f"ev{g % 10**7:07d}", f"Best {b_}"))
            elif sec == "quotes":
                rows.append((f"{a} {b_}", f"We all remember the {b_.lower()} of {1900 + g % 126}.", None))
            elif sec == "releaseinfo":
                rows.append((["USA", "France", "Germany", "Japan", "Brazil"][g % 5],
                             f"{1970 + g % 50}-{1 + (g >> 8) % 12:02d}-{1 + (g >> 13) % 28:02d}",
                             ["premiere", None, "festival"][g % 3]))
            elif sec == "technical":
                rows.append((["Runtime", "Sound Mix", "Color", "Aspect Ratio", "Camera"][g % 5],
                             f"{a} {g % 300}", None))
            elif sec == "locations":
                rows.append((["studio", "on location"][g % 2], f"{b_} City, {a}land", None))
            elif sec == "trivia":
                rows.append((f"The {b_.lower()} scene took {1 + g % 40} takes.", None, None))
            elif sec == "plotsummary":
                rows.append((f"A {a.lower()} tale of the {b_.lower()}.", f"{a} {b_}", None))
            elif sec == "fullcredits":
                rows.append((f"nm{g % 10**7:07d}", f"{a} {b_}", f"The {NOUN[(g >> 9) % 10]}"))
        return rows

    # -- persons (reference nmIMDB spider, spiders.py:2121-2421) --------

    def host_of_person(self, nm: str) -> str:
        h = _h(f"{self.cfg.seed}:phost:{nm}")
        if (h % 1000) / 1000.0 < self.cfg.hot_host_share:
            return "www.media-h0.com"
        j = 1 + h % (self.cfg.n_hosts - 1) if self.cfg.n_hosts > 1 else 0
        return f"www.media-h{j}.com"

    def person_url(self, nm: str) -> str:
        return f"https://{self.host_of_person(nm)}/name/{nm}/"

    def person_name(self, nm: str) -> str:
        h = _h(f"{self.cfg.seed}:pname:{nm}")
        return f"{ADJ[h % 10]} {NOUN[(h >> 4) % 10]}"

    def person_jobs(self, nm: str) -> str:
        h = _h(f"{self.cfg.seed}:pjobs:{nm}")
        pool = ["Actor", "Director", "Writer", "Producer", "Composer"]
        return ", ".join(sorted({pool[h % 5], pool[(h >> 5) % 5]}))

    def person_born(self, nm: str) -> int:
        return 1920 + _h(f"{self.cfg.seed}:pborn:{nm}") % 90

    def n_credits(self, nm: str) -> int:
        return _h(f"{self.cfg.seed}:ncred:{nm}") % 120  # up to 3 filmo pages

    def credit_tt(self, nm: str, idx: int) -> tuple[str, str]:
        g = _h(f"{self.cfg.seed}:cred:{nm}:{idx}")
        tt = f"tt{g % 10**7:07d}"
        return tt, f"{ADJ[g % 10]} {NOUN[(g >> 4) % 10]} {1900 + (g >> 8) % 126}"

    def _person_body(self, nm: str) -> str:
        # filmography pagination mirrors reference PER_PAGE_OF_HIST=50
        # (spiders.py:2052, ceil fan-out at 2382-2407)
        return (
            f"<html><body data-kind='person'>\n<h1>{self.person_name(nm)}</h1>\n"
            f'<span class="jobs">{self.person_jobs(nm)}</span>\n'
            f'<span class="born">{self.person_born(nm)}</span>\n'
            f'<span class="credit-count">{self.n_credits(nm):,} credits</span>\n'
            f"</body></html>"
        )

    def _filmo_body(self, nm: str, page: int) -> str:
        n = self.n_credits(nm)
        first, last = (page - 1) * PER_PAGE_HIST, min(page * PER_PAGE_HIST, n)
        rows = []
        for i in range(first, last):
            tt, title = self.credit_tt(nm, i)
            rows.append(f'<li class="credit"><a href="/title/{tt}/">{title}</a></li>')
        return (
            f"<html><body data-kind='filmo' data-page='{page}'>\n"
            + "\n".join(rows)
            + "\n</body></html>"
        )

    # -- reviews: the load-more page (reference S5, spiders.py:1508-1564) --

    def n_reviews(self, tt: str) -> int:
        return _h(f"{self.cfg.seed}:nrev:{tt}") % 25

    def review_rows(self, tt: str) -> list[tuple]:
        """Ground-truth reviews, newest-first — the order the reference's
        click-load-more loop reveals them (spiders.py:1508-1564)."""
        rows = []
        for i in range(self.n_reviews(tt)):
            g = _h(f"{self.cfg.seed}:rev:{tt}:{i}")
            rows.append(
                (
                    f"rw{g % 10**7:07d}",                       # review id (ID)
                    str(1 + g % 10),                            # rating
                    f"{ADJ[g % 10]} {NOUN[(g >> 4) % 10]}!",    # title
                    f"{ADJ[(g >> 8) % 10].lower()}_viewer_{g % 997}",  # name
                    f"{2005 + g % 20}-{1 + (g >> 9) % 12:02d}-{1 + (g >> 14) % 28:02d}",  # date
                    f"I found the {NOUN[(g >> 5) % 10].lower()} utterly {ADJ[(g >> 12) % 10].lower()}.",  # text
                    str(g % 500),                               # action (helpful votes)
                )
            )
        return rows

    def _reviews_body(self, tt: str) -> str:
        """The FULLY-LOADED reviews page: the resolver emulates the
        reference's Selenium click-'load-more'-until-marker loop
        (spiders.py:1508-1564, 25 per click, 'loaded-all' marker at
        1544-1549) *inside* the fetch — one crawl URL, one seen-set
        entry, exactly as the reference's one browser visit. The marker
        is included so the parser can assert completeness."""
        rows = [
            f'<div class="review" data-id="{rid}"><span class="rv-rating">{rating}</span>'
            f'<span class="rv-title">{title}</span><span class="rv-name">{name}</span>'
            f'<span class="rv-date">{date}</span><p class="rv-text">{text}</p>'
            f'<span class="rv-action">{action}</span></div>'
            for rid, rating, title, name, date, text, action in self.review_rows(tt)
        ]
        return (
            f"<html><body data-kind='reviews'>\n"
            + "\n".join(rows)
            + "\n<div class='loaded-all'></div></body></html>"
        )

    def _section_body(self, tt: str, sec: str) -> str:
        cells = []
        for f1, f2, f3 in self.section_rows(tt, sec):
            # fullcredits rows carry the person link the crawler follows
            # (cross-entity discovery; reference cast hrefs spiders.py:1359-1419)
            link = f' data-link="{self.person_url(f1)}"' if sec == "fullcredits" else ""
            cells.append(
                f'<tr class="sec-row"{link}><td>{f1 if f1 is not None else ""}</td>'
                f"<td>{f2 if f2 is not None else ''}</td>"
                f"<td>{f3 if f3 is not None else ''}</td></tr>"
            )
        return (
            f"<html><body data-kind='section' data-sec='{sec}'>\n<table>\n"
            + "\n".join(cells)
            + "\n</table></body></html>"
        )

    # -- the resolver ----------------------------------------------------------

    def fetch(self, url: str, attempt: int = 1) -> FetchResult:
        """Resolve a URL to (status, body). Pure; attempt only affects the
        flaky-500 healing (reference retries 500 up to 20x,
        spiders.py:124-131)."""
        status = self.status_of(url, attempt)
        if status != 200:
            return FetchResult(status=status, kind="error")
        import re

        m = re.search(r"/title/(tt\d+)/mediaviewer/(rm\d+)", url)
        if m:
            return FetchResult(200, "photo_detail", text=self._photo_detail_body(m.group(1), m.group(2)))
        m = re.search(r"/name/(nm\d+)/filmosearch\?page=(\d+)", url)
        if m:
            return FetchResult(200, "filmo", text=self._filmo_body(m.group(1), int(m.group(2))))
        m = re.search(r"/name/(nm\d+)/?$", url)
        if m:
            return FetchResult(200, "person", text=self._person_body(m.group(1)))
        m = re.search(r"/title/(tt\d+)/reviews$", url)
        if m:
            return FetchResult(200, "reviews", text=self._reviews_body(m.group(1)))
        m = re.search(r"/title/(tt\d+)/(" + "|".join(SECTIONS) + r")$", url)
        if m:
            return FetchResult(
                200, "section", text=self._section_body(m.group(1), m.group(2)),
                meta={"sec": m.group(2)},
            )
        m = re.search(r"/title/(tt\d+)/mediaindex\?page=(\d+)", url)
        if m:
            return FetchResult(200, "mediaindex", text=self._mediaindex_body(m.group(1), int(m.group(2))))
        m = re.search(r"/title/(tt\d+)/?$", url)
        if m:
            return FetchResult(200, "title", text=self._title_body(m.group(1)))
        m = re.search(r"/images/(rm\d+)\.(?:(UX32_CR0|UX96_CR0)\.)?(png|dctq)$", url)
        if m:
            rm = m.group(1)
            size = {"UX32_CR0": "small", "UX96_CR0": "large", None: "ori"}[m.group(2)]
            return FetchResult(200, "image_blob", body=self.image_bytes(rm, size), meta={"rm": rm, "size": size})
        return FetchResult(404, "error")


def make_seed_ids(n: int, seed: int = 42) -> list[str]:
    """Deterministic seed id list WITH duplicates and shuffled order, to
    exercise the reference's dedup+sort (spiders.py:92-93)."""
    rng = np.random.default_rng(seed)
    ids = [f"tt{1 + int(i):07d}" for i in rng.choice(max(2, int(n * 0.9)), size=n, replace=True)]
    return ids
