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
PER_PAGE_VIDEO = 30  # reference spiders.py:178 PER_PAGE_OF_VIDEO
PER_PAGE_CO = 50  # reference spiders.py:3259 PER_PAGE_NUM_FILMS

# F6 subpage fan-out: each crawled title also fetches its section pages
# (reference spiders.py:310-329 builds 20 such URLs per title; this world
# models all 18 fixed-schema ones of SURVEY §1.3: the original 10 plus
# externalreviews/parentalguide/faqs/soundtracks/movieconnections/goofs/
# crazycredits/alternateversions, reference spiders.py:1008-1284).
# Order matters: it is the reference's construction order, and section
# ordinals continue after the mediaindex page ordinals.
SECTIONS = [
    "keywords", "companies", "awards", "quotes", "releaseinfo",
    "technical", "locations", "trivia", "plotsummary", "fullcredits",
    "externalreviews", "parentalguide", "faqs", "soundtracks",
    "movieconnections", "goofs", "crazycredits", "alternateversions",
]

# person aux subpages (reference nm spider, spiders.py:2211-2225:
# bio/otherworks/publicity/external_sites parses + person 6-col awards)
PSECTIONS = ["bio", "otherworks", "publicity", "externalsites", "awards"]

# media kinds share the media (unthrottled) budget pool — the reference
# sleeps before page requests only (spiders.py:136 vs 2981-2998, 3876-3897)
MEDIA_KINDS = ("image_blob", "video_blob")

# the seven seed-producing chart pages (reference getTopLowest,
# utils.py:97-271: top rated / top english / most popular / popular TV /
# top TV / top indian / lowest rated)
CHARTS = [
    "top", "top-english", "popular", "popular-tv", "top-tv",
    "top-indian", "bottom",
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
    max_videos_per_title: int = 75  # => up to 3 videogallery pages
    max_news_per_title: int = 12
    # person media are smaller than title media on the real site; separate
    # caps keep the synthetic world's person photo/video fan-out (the
    # reference's nm mediaindex/videogallery probes, spiders.py:2172-2207)
    # from doubling the crawl size
    max_images_per_person: int = 40  # usually 1 nm mediaindex page
    max_videos_per_person: int = 15
    # site growth for supplement runs (reference supplement_reviews/news,
    # spiders.py:4284-4764): N extra review/news children appear on every
    # page, appended AFTER the original rows — row content derives from
    # (id, index) only, so the original prefix is byte-identical and a
    # supplement crawl must append exactly these rows
    supplement_extra: int = 0
    max_co_titles: int = 120  # => up to 3 company search pages
    p_404: float = 0.02  # permanent 404s
    p_500: float = 0.02  # flaky: 500 until heal_attempt
    max_heal_attempt: int = 3
    small_wh: tuple[int, int] = (32, 24)
    large_wh: tuple[int, int] = (96, 72)
    ori_wh: tuple[int, int] = (128, 96)
    lossy_q: float = 2.0  # keeps PSNR >= 40 dB even on noise
    # P6 dual-layout: this share of title pages (and event pages) render
    # the ALTERNATE layout — the reference's try-old-selectors /
    # except-data-testid dispatch (spiders.py:339-362); event pages fall
    # back from DOM to an embedded-JSON widget (spiders.py:2775-2828)
    alt_layout_share: float = 0.4


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

    def n_images(self, owner: str) -> int:
        """Photo count for a title OR a person (the reference's nm spider
        probes nm/mediaindex for a count too, spiders.py:2172-2189)."""
        cap = (
            self.cfg.max_images_per_person
            if owner.startswith("nm")
            else self.cfg.max_images_per_title
        )
        return _h(f"{self.cfg.seed}:nimg:{owner}") % (cap + 1)

    def rm_id(self, owner: str, idx: int) -> str:
        return f"rm{_h(f'{self.cfg.seed}:rm:{owner}:{idx}') % 10**9:09d}{idx % 10}"

    def owner_name(self, owner: str) -> str:
        return self.person_name(owner) if owner.startswith("nm") else self.title_name(owner)

    def caption(self, owner: str, rm: str) -> str:
        h = _h(f"{self.cfg.seed}:cap:{rm}")
        return (
            f"{self.owner_name(owner)} — still {h % 97}: "
            f"{ADJ[(h >> 7) % 10].lower()} {NOUN[(h >> 11) % 10].lower()} scene"
        )

    def img_fmt(self, rm: str) -> str:
        return "png" if _h(f"{self.cfg.seed}:fmt:{rm}") % 2 == 0 else "dctq"

    def _host_of(self, owner: str) -> str:
        return (
            self.host_of_person(owner) if owner.startswith("nm") else self.host_of_title(owner)
        )

    def img_url(self, owner: str, rm: str, size: str) -> str:
        host = self._host_of(owner).replace("www.", "img.")
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

    def uses_alt_layout(self, entity_id: str) -> bool:
        """P6 dual-layout dispatch: a deterministic share of pages render
        the alternate markup (reference spiders.py:339-362: old class
        selectors raise, parser falls back to data-testid)."""
        h = _h(f"{self.cfg.seed}:layout:{entity_id}")
        return (h % 1000) / 1000.0 < self.cfg.alt_layout_share

    def hero_fields(self, tt: str) -> tuple[str, str, str]:
        """(name, rating, metascore) ground truth, layout-independent."""
        h = _h(f"{self.cfg.seed}:hero:{tt}")
        return self.title_name(tt), f"{1 + (h % 90) / 10.0:.1f}", str(h % 101)

    def _title_body(self, tt: str) -> str:
        n = self.n_images(tt)
        nv = self.n_videos(tt)
        name, rating, meta = self.hero_fields(tt)
        if self.uses_alt_layout(tt):
            # layout B: data-testid markup (the reference's except-branch
            # selectors, spiders.py:352-362)
            return (
                f"<html><head><title>{name} - Films</title></head>\n"
                f'<body data-layout="b">\n'
                f'<h1 data-testid="hero-title-block__title">{name}</h1>\n'
                f'<div data-testid="hero-rating">{rating}</div>\n'
                f'<span class="score-meta">{meta}</span>\n'
                f'<a data-testid="photos-link">{n:,} Photos</a>\n'
                f'<a data-testid="videos-link">{nv:,} Videos</a>\n</body></html>'
            )
        return (
            f"<html><head><title>{name} - Films</title></head>\n"
            f'<body data-testid="hero">\n<h1>{name}</h1>\n'
            f'<span class="rating">{rating}/10</span>\n'
            f'<span class="metascore">{meta}</span>\n'
            f'<a href="/title/{tt}/mediaindex?page=1">photos</a>\n'
            f'<span class="image-count">{n:,} Photos</span>\n'
            f'<span class="video-count">{nv:,} Videos</span>\n</body></html>'
        )

    def _mediaindex_body(self, owner: str, page: int) -> str:
        n = self.n_images(owner)
        prefix = "name" if owner.startswith("nm") else "title"
        first, last = (page - 1) * PER_PAGE, min(page * PER_PAGE, n)
        rows = [
            f'<a class="thumb" href="/{prefix}/{owner}/mediaviewer/{self.rm_id(owner, i)}">'
            f'<img src="{self.img_url(owner, self.rm_id(owner, i), "small")}"/></a>'
            for i in range(first, last)
        ]
        return (
            f"<html><body data-kind='mediaindex' data-page='{page}'>\n"
            + "\n".join(rows)
            + "\n</body></html>"
        )

    def _photo_detail_body(self, owner: str, rm: str) -> str:
        return (
            f"<html><body data-kind='photo'>\n"
            f'<div class="caption">{self.caption(owner, rm)}</div>\n'
            f'<img data-size="small" src="{self.img_url(owner, rm, "small")}"/>\n'
            f'<img data-size="large" src="{self.img_url(owner, rm, "large")}"/>\n'
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
            # -- the 8 sections added in round 2 (reference spiders.py:1008-1284) --
            elif sec == "externalreviews":
                rows.append((f"{a} {b_} Review", f"https://ext-{g % 97}.example/{b_.lower()}", None))
            elif sec == "parentalguide":
                cates = ["certificates", "Sex_Nudity", "Violence_Gore", "Profanity",
                         "Alcohol_Drugs_Smoking", "Frightening_IntenseScenes"]
                rows.append((cates[g % 6], f"severity_vote:{['Mild', 'Moderate', 'Severe'][g % 3]}",
                             f"A {a.lower()} {b_.lower()} moment."))
            elif sec == "faqs":
                rows.append((f"Why the {b_.lower()}?", f"Because of the {a.lower()} {NOUN[(g >> 9) % 10].lower()}.", None))
            elif sec == "soundtracks":
                rows.append((f"{a} {b_} Theme (performed by {ADJ[(g >> 9) % 10]} Ensemble)", None, None))
            elif sec == "movieconnections":
                rows.append((["follows", "followed_by", "references", "referenced_in", "spin_off"][g % 5],
                             f"tt{g % 10**7:07d}",
                             f"{a} {b_} ({1900 + g % 126})"))
            elif sec == "goofs":
                rows.append((f"The {b_.lower()} visibly changes position.", None, None))
            elif sec == "crazycredits":
                rows.append((f"A {a.lower()} {b_.lower()} appears after the credits.", None, None))
            elif sec == "alternateversions":
                rows.append((f"The {a.lower()} cut adds a {b_.lower()} scene.", None, None))
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
        # (spiders.py:2052, ceil fan-out at 2382-2407); the photo/video
        # count markers drive the nm mediaindex/videogallery fan-out (the
        # reference probes those pages for counts, spiders.py:2172-2207 —
        # here the counts ride on the person page like the title page's,
        # same ceil pagination either way)
        return (
            f"<html><body data-kind='person'>\n<h1>{self.person_name(nm)}</h1>\n"
            f'<span class="jobs">{self.person_jobs(nm)}</span>\n'
            f'<span class="born">{self.person_born(nm)}</span>\n'
            f'<span class="credit-count">{self.n_credits(nm):,} credits</span>\n'
            f'<span class="image-count">{self.n_images(nm):,} Photos</span>\n'
            f'<span class="video-count">{self.n_videos(nm):,} Videos</span>\n'
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
        for i in range(self.n_reviews(tt) + self.cfg.supplement_extra):
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

    # -- videos (reference getAllvideos/get_cur_video, spiders.py:792-863;
    #    mp4 download spiders.py:3876-3897; videos.csv at 501-511) --------

    def n_videos(self, owner: str) -> int:
        """Video count for a title OR a person (the reference's nm
        videogallery probe, spiders.py:2190-2207)."""
        cap = (
            self.cfg.max_videos_per_person
            if owner.startswith("nm")
            else self.cfg.max_videos_per_title
        )
        return _h(f"{self.cfg.seed}:nvid:{owner}") % (cap + 1)

    def vi_id(self, owner: str, idx: int) -> str:
        return f"vi{_h(f'{self.cfg.seed}:vi:{owner}:{idx}') % 10**9:09d}{idx % 10}"

    def mp4_url(self, vi: str) -> str:
        h = _h(f"{self.cfg.seed}:mp4:{vi}")
        return f"https://vid.media-h{h % self.cfg.n_hosts}.com/mp4/{vi}.mp4?tok={h % 10**6}"

    def video_bytes(self, vi: str) -> bytes:
        """Deterministic pseudo-mp4 payload (1-8 KiB). Content is opaque
        to the engine (binary column; the reference streams chunks to a
        file without decoding, spiders.py:3876-3897)."""
        h = _h(f"{self.cfg.seed}:vbytes:{vi}")
        n = 1024 + h % (7 * 1024)
        rng = np.random.default_rng(h)
        return b"\x00\x00\x00\x18ftypmp42" + rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()

    def _videogallery_body(self, owner: str, page: int) -> str:
        n = self.n_videos(owner)
        first, last = (page - 1) * PER_PAGE_VIDEO, min(page * PER_PAGE_VIDEO, n)
        rows = [
            f'<div class="results-item"><a data-video="{self.vi_id(owner, i)}">clip</a></div>'
            for i in range(first, last)
        ]
        return (
            f"<html><body data-kind='videogallery' data-page='{page}'>\n"
            f'<div class="search-results">\n' + "\n".join(rows) + "\n</div></body></html>"
        )

    def _video_player_body(self, vi: str) -> str:
        # the mp4 URL hides in an embedded script, exactly the reference's
        # '"videoUrl":"...mp4?..."' regex target (spiders.py:845-850)
        return (
            f"<html><body data-kind='video_player' data-vi='{vi}'>\n"
            f'<script type="text/javascript">var playbackData = '
            f'{{"videoLegacyEncodings":[{{"videoUrl":"{self.mp4_url(vi)}","mimeType":"video/mp4"}}]}};'
            f"</script>\n</body></html>"
        )

    # -- news (reference news_selenium scroll loop + getEachNews,
    #    spiders.py:4652-4762; news.csv 8 cols at 4607-4623) -------------

    def n_news(self, tt: str) -> int:
        return _h(f"{self.cfg.seed}:nnews:{tt}") % (self.cfg.max_news_per_title + 1)

    def news_rows(self, tt: str) -> list[tuple]:
        """Ground truth in OLDEST-FIRST order — the reference reverses the
        scroll-revealed (newest-first) article list before parsing
        (newses.reverse(), spiders.py:4690; O5)."""
        rows = []
        for i in range(self.n_news(tt) + self.cfg.supplement_extra):
            g = _h(f"{self.cfg.seed}:news:{tt}:{i}")
            rows.append(
                (
                    f"{ADJ[g % 10]} {NOUN[(g >> 4) % 10]} announced",        # title
                    f"https://news-{g % 89}.example/{NOUN[(g >> 6) % 10].lower()}",  # url
                    f"{2010 + g % 15}-{1 + (g >> 9) % 12:02d}-{1 + (g >> 14) % 28:02d}",  # date
                    f"{ADJ[(g >> 5) % 10]} Writer",                          # author
                    f"{NOUN[(g >> 7) % 10]} Daily",                          # source
                    f"https://img.news-{g % 89}.example/{g % 10**6}.jpg",    # img_url
                    f"{ADJ[(g >> 8) % 10]} {NOUN[(g >> 10) % 10]}",          # img_alt
                    f"The {NOUN[(g >> 11) % 10].lower()} was {ADJ[(g >> 12) % 10].lower()} today.",  # content
                )
            )
        return rows

    def _news_body(self, tt: str) -> str:
        """Fully-scrolled news page, NEWEST-first as displayed (the parser
        must reverse; loaded-all marker = reference spiders.py:4681)."""
        arts = []
        for title, url, date, author, source, img_url, img_alt, content in reversed(
            self.news_rows(tt)
        ):
            arts.append(
                f'<article class="news-article"><h2 class="news-article__title">'
                f'<a href="{url}">{title}</a></h2>'
                f'<li class="news-article__date">{date}</li>'
                f'<li class="news-article__author">{author}</li>'
                f'<li class="news-article__source">{source}</li>'
                f'<img class="news-article__image" src="{img_url}" alt="{img_alt}"/>'
                f'<div class="news-article__content">{content}</div></article>'
            )
        return (
            "<html><body data-kind='news'><div id='main'>\n"
            + "\n".join(arts)
            + "\n<div class='loaded-all'></div></div></body></html>"
        )

    # -- ratings page (reference getRatings, spiders.py:4962-5040) -------

    DEMO_ROWS = ["All", "Males", "Females"]
    DEMO_COLS = ["All_ages", "<18", "18-29", "30-44", "45+"]
    USER_CATES = ["Top_1000_voters", "US_users", "Non_US_Users"]

    def ratings_fields(self, tt: str) -> dict:
        """Ground-truth ratings page content: histogram string, mean,
        median, demographic map, user-cate string (the reference's 8-col
        ratings.csv minus the scrape timestamp)."""
        g = _h(f"{self.cfg.seed}:ratings:{tt}")
        tot = 1000 + g % 2_000_000
        weighted = f"{1 + (g % 90) / 10.0:.1f}"
        by_score = ";".join(
            f"{s}:{(_h(f'{self.cfg.seed}:rsc:{tt}:{s}') % 300) / 10.0:.1f}%,"
            f"{_h(f'{self.cfg.seed}:rvt:{tt}:{s}') % (tot + 1)}"
            for s in range(10, 0, -1)
        )
        mean = f"{1 + (_h(f'{self.cfg.seed}:rmean:{tt}') % 90) / 10.0:.1f}"
        median = str(1 + _h(f"{self.cfg.seed}:rmed:{tt}") % 10)
        demo = {}
        for row in self.DEMO_ROWS:
            for col in self.DEMO_COLS:
                d = _h(f"{self.cfg.seed}:rdemo:{tt}:{row}:{col}")
                demo[f"{row}|{col}"] = f"{1 + (d % 90) / 10.0:.1f},{d % 100000}"
        by_users = ";".join(
            f"{c}:{1 + (_h(f'{self.cfg.seed}:ruser:{tt}:{c}') % 90) / 10.0:.1f},"
            f"{_h(f'{self.cfg.seed}:ruvt:{tt}:{c}') % 100000}"
            for c in self.USER_CATES
        )
        return {
            "tot_users": tot, "weighted": weighted, "by_score": by_score,
            "mean": mean, "median": median, "demo": demo, "by_users": by_users,
        }

    def _ratings_body(self, tt: str) -> str:
        f = self.ratings_fields(tt)
        demo_rows = []
        for row in self.DEMO_ROWS:
            cells = "".join(
                f'<td data-col="{col}"><div class="bigcell">{f["demo"][f"{row}|{col}"].split(",")[0]}</div>'
                f'<div class="smallcell">{f["demo"][f"{row}|{col}"].split(",")[1]}</div></td>'
                for col in self.DEMO_COLS
            )
            demo_rows.append(f'<tr data-cate="{row}">{cells}</tr>')
        return (
            f"<html><body data-kind='ratings'>\n"
            f'<div class="allText">{f["tot_users"]:,} IMDb users have given a '
            f'weighted average vote of {f["weighted"]} / 10</div>\n'
            f'<div class="by-score">{f["by_score"]}</div>\n'
            f'<div class="statics">Arithmetic mean = {f["mean"]}. Median = {f["median"]}.</div>\n'
            f'<table class="demographics">\n' + "\n".join(demo_rows) + "</table>\n"
            f'<div class="by-users">{f["by_users"]}</div>\n</body></html>'
        )

    # -- person aux sections (reference spiders.py:2211-2225, 2291-2623:
    #    bio / otherworks / publicity / external_sites / 6-col awards) ---

    def psection_rows(self, nm: str, sec: str) -> list[tuple]:
        """Ground truth, (f1..f6) tuples; non-award sections use f1..f3."""
        h = _h(f"{self.cfg.seed}:psec:{nm}:{sec}")
        n = h % 6  # 0..5 rows
        rows = []
        for i in range(n):
            g = _h(f"{self.cfg.seed}:psec:{nm}:{sec}:{i}")
            a, b_ = ADJ[g % 10], NOUN[(g >> 4) % 10]
            if sec == "bio":
                rows.append((["overview", "mini_bio", "spouse", "trade_mark", "trivia", "personal_quotes"][g % 6],
                             f"{a} {b_}", f"A {a.lower()} life of {b_.lower()}.", None, None, None))
            elif sec == "otherworks":
                rows.append((f"Stage: the {b_.lower()} production of {1950 + g % 70}.", None, None, None, None, None))
            elif sec == "publicity":
                rows.append((["Print_Biographies", "Film_Biographies", "Interviews", "Articles",
                              "Pictorials", "Magazine_Covers", "Portrayals"][g % 7],
                             f"{b_} Magazine ({1970 + g % 50})", f"{a} profile of the artist.", None, None, None))
            elif sec == "externalsites":
                rows.append((["Official_Sites", "Miscellaneous_Sites", "Photographs", "Video_Clips"][g % 4],
                             f"https://site-{g % 79}.example/{b_.lower()}", f"{a} {b_} fan page", None, None, None))
            elif sec == "awards":
                # reference 6-col person awards (spiders.py:2291-2331):
                # title, year, ID(ev), award_outcome, award_category, award_descriptions
                rows.append((f"{a} Award", str(1960 + g % 60), f"ev{g % 10**7:07d}",
                             ["Winner", "Nominee"][g % 2], f"Best {b_}",
                             f"For the {NOUN[(g >> 9) % 10].lower()}."))
        return rows

    def _psection_body(self, nm: str, sec: str) -> str:
        cells = []
        for tup in self.psection_rows(nm, sec):
            tds = "".join(f"<td>{v if v is not None else ''}</td>" for v in tup)
            cells.append(f'<tr class="psec-row">{tds}</tr>')
        return (
            f"<html><body data-kind='psection' data-sec='{sec}' data-nm='{nm}'>\n<table>\n"
            + "\n".join(cells)
            + "\n</table></body></html>"
        )

    # -- events (third entity type; reference getEvent DOM + embedded-JSON
    #    fallback, spiders.py:2668-2833; event/base.csv at 2650-2666) ----

    def host_of_event(self, ev: str) -> str:
        h = _h(f"{self.cfg.seed}:ehost:{ev}")
        if (h % 1000) / 1000.0 < self.cfg.hot_host_share:
            return "www.media-h0.com"
        j = 1 + h % (self.cfg.n_hosts - 1) if self.cfg.n_hosts > 1 else 0
        return f"www.media-h{j}.com"

    def event_url(self, ev: str) -> str:
        return f"https://{self.host_of_event(ev)}/event/{ev}/"

    def event_fields(self, ev: str) -> tuple[str, str, str]:
        h = _h(f"{self.cfg.seed}:ev:{ev}")
        name = f"{ADJ[h % 10]} {NOUN[(h >> 4) % 10]} Awards"
        sub = f"The {NOUN[(h >> 8) % 10]} Ceremony" if h % 3 else ""
        year = str(1960 + h % 66)
        return name, sub, year

    def event_award_rows(self, ev: str) -> list[tuple]:
        """9-col ground truth (reference event.csv: award_name, cate_name,
        isWinner, img_url, primary_Names, primary_IDs, secondary_Names,
        secondary_IDs, notes_detail)."""
        h = _h(f"{self.cfg.seed}:evaw:{ev}")
        rows = []
        for i in range(h % 8):
            g = _h(f"{self.cfg.seed}:evaw:{ev}:{i}")
            a, b_ = ADJ[g % 10], NOUN[(g >> 4) % 10]
            prim_kind = ["nm", "tt", "co"][g % 3]
            prim_id = f"{prim_kind}{g % 10**7:07d}"
            sec_id = f"nm{(g >> 3) % 10**7:07d}"
            rows.append(
                (
                    f"{a} Award", f"Best {b_}",
                    "Winner" if g % 4 == 0 else "not Winner",
                    f"https://img.media-h0.com/ev/{g % 10**6}.jpg",
                    f"{a} {b_}", prim_id,
                    f"{ADJ[(g >> 9) % 10]} {NOUN[(g >> 11) % 10]}", sec_id,
                    f"For the {b_.lower()}." if g % 5 == 0 else "",
                )
            )
        return rows

    def _event_body(self, ev: str) -> str:
        name, sub, year = self.event_fields(ev)
        rows = self.event_award_rows(ev)
        if self.uses_alt_layout(ev):
            # embedded-JSON layout (reference fallback, spiders.py:2775-2828)
            import json as _json

            awards_js = _json.dumps(
                {
                    "nomineesWidgetModel": {
                        "eventEditionSummary": {
                            "eventName": name, "year": year,
                            "awards": [
                                {
                                    "awardName": aw, "categories": [{
                                        "categoryName": cate,
                                        "nominations": [{
                                            "isWinner": win == "Winner",
                                            "notes": notes or None,
                                            "imageUrl": img,
                                            "primaryNominees": [{"name": pn, "const": pid, "imageUrl": img}],
                                            "secondaryNominees": [{"name": sn, "const": sid}],
                                        }],
                                    }],
                                }
                                for aw, cate, win, img, pn, pid, sn, sid, notes in rows
                            ],
                        }
                    }
                }
            )
            return (
                f"<html><body data-kind='event' data-layout='json'>\n"
                f'<script type="text/javascript">IMDbReactWidgets.NomineesWidget.push('
                f"['nominees-widget-lite', {awards_js}]);</script>\n</body></html>"
            )
        cells = []
        for aw, cate, win, img, pn, pid, sn, sid, notes in rows:
            cells.append(
                f'<div class="event-widgets__award"><div class="award-name">{aw}</div>'
                f'<div class="award-category-name">{cate}</div>'
                f'<div class="winner-flag">{win}</div>'
                f'<img class="nominee-image" src="{img}"/>'
                f'<span class="primary-nominee" data-id="{pid}">{pn}</span>'
                f'<span class="secondary-nominee" data-id="{sid}">{sn}</span>'
                f'<div class="nomination-notes">{notes}</div></div>'
            )
        return (
            f"<html><body data-kind='event' data-layout='dom'>\n"
            f'<div class="event-header__title">{name}</div>\n'
            f'<div class="event-header__subtitle">{sub}</div>\n'
            f'<div class="event-year-header__year">{year} Awards</div>\n'
            f'<div class="event-widgets__award-list">\n' + "\n".join(cells) + "\n</div></body></html>"
        )

    # -- companies (reference co crawl, spiders.py:3259-3448: search page
    #    count + name, then &start= pagination of 15-field film rows) ---

    def host_of_company(self, co: str) -> str:
        h = _h(f"{self.cfg.seed}:chost:{co}")
        if (h % 1000) / 1000.0 < self.cfg.hot_host_share:
            return "www.media-h0.com"
        j = 1 + h % (self.cfg.n_hosts - 1) if self.cfg.n_hosts > 1 else 0
        return f"www.media-h{j}.com"

    def company_url(self, co: str) -> str:
        return f"https://{self.host_of_company(co)}/search/title/?companies={co}"

    def company_name(self, co: str) -> str:
        h = _h(f"{self.cfg.seed}:cname:{co}")
        return f"{ADJ[h % 10]} {NOUN[(h >> 4) % 10]} Pictures"

    def n_co_titles(self, co: str) -> int:
        return _h(f"{self.cfg.seed}:ncot:{co}") % (self.cfg.max_co_titles + 1)

    def co_film_row(self, co: str, idx: int) -> tuple:
        """One 15-field search-result row (reference get_curPage_co,
        spiders.py:3352-3437)."""
        g = _h(f"{self.cfg.seed}:cof:{co}:{idx}")
        a, b_ = ADJ[g % 10], NOUN[(g >> 4) % 10]
        tt = f"tt{g % 10**7:07d}"
        return (
            tt,
            f"{a} {b_}",
            f"https://img.media-h0.com/co/{g % 10**6}.jpg",
            ["G", "PG", "PG-13", "R", ""][g % 5],
            f"{60 + g % 140} min",
            ["Drama", "Comedy", "Action", "Documentary"][g % 4],
            f"{1 + (g % 90) / 10.0:.1f}",
            str(g % 101),
            f"A {a.lower()} story of the {b_.lower()}.",
            f"{ADJ[(g >> 9) % 10]} {NOUN[(g >> 11) % 10]}",
            f"nm{(g >> 2) % 10**7:07d}",
            f"{ADJ[(g >> 13) % 10]} {NOUN[(g >> 15) % 10]}",
            f"nm{(g >> 5) % 10**7:07d}",
            str(g % 500000),
            f"${g % 10**8}" if g % 3 == 0 else "",
        )

    def _company_body(self, co: str, start: int | None) -> str:
        n = self.n_co_titles(co)
        if start is None:
            # the count/header page (reference get_co_info, spiders.py:3303-3322)
            return (
                f"<html><body data-kind='company' data-co='{co}'>\n"
                f'<h1 class="header">With {self.company_name(co)} (Sorted by Popularity)</h1>\n'
                f'<div class="desc"><span>1-50 of {n:,} titles.</span></div>\n</body></html>'
            )
        first = start - 1
        last = min(first + PER_PAGE_CO, n)
        rows = []
        for i in range(first, last):
            tup = self.co_film_row(co, i)
            tds = "".join(f"<td>{v}</td>" for v in tup)
            rows.append(f'<tr class="co-film">{tds}</tr>')
        return (
            f"<html><body data-kind='co_page' data-co='{co}' data-start='{start}'>\n<table>\n"
            + "\n".join(rows)
            + "\n</table></body></html>"
        )

    # -- seed sources: charts / coming-soon months / event index
    #    (reference utils.py:15-271 — getTopLowest/getNearYear/getEvents)

    def chart_ids(self, chart: str) -> list[str]:
        """Ground-truth id list for one chart page. Charts overlap (a
        popular film appears in several), so the union-dedup the seed
        generator performs is real work."""
        h = _h(f"{self.cfg.seed}:chart:{chart}")
        n = 25 + h % 26  # 25..50 per chart
        # pool smaller than the union of charts => guaranteed overlap
        return [f"tt{1 + _h(f'{self.cfg.seed}:chid:{chart}:{i}') % 300:07d}" for i in range(n)]

    def coming_soon_ids(self, month: str) -> list[str]:
        h = _h(f"{self.cfg.seed}:soon:{month}")
        n = 3 + h % 10
        return [f"tt{1000 + _h(f'{self.cfg.seed}:soonid:{month}:{i}') % 5000:07d}" for i in range(n)]

    def all_event_ids(self) -> list[str]:
        return [f"ev{_h(f'{self.cfg.seed}:evidx:{i}') % 10**7:07d}" for i in range(40)]

    def _chart_body(self, chart: str) -> str:
        rows = [
            f'<tr><td class="titleColumn"><a href="/title/{tt}/">{self.title_name(tt)}</a></td></tr>'
            for tt in self.chart_ids(chart)
        ]
        return (
            f"<html><body data-kind='chart' data-chart='{chart}'>\n"
            f'<tbody class="lister-list">\n' + "\n".join(rows) + "\n</tbody></body></html>"
        )

    def _coming_soon_body(self, month: str) -> str:
        rows = [
            f'<div class="list_item"><h4><a href="/title/{tt}/">{self.title_name(tt)}</a></h4></div>'
            for tt in self.coming_soon_ids(month)
        ]
        return (
            f"<html><body data-kind='coming_soon' data-month='{month}'>\n"
            f'<div class="list detail">\n' + "\n".join(rows) + "\n</div></body></html>"
        )

    def _event_index_body(self) -> str:
        rows = [
            f'<li><a href="/event/{ev}/">{self.event_fields(ev)[0]}</a></li>'
            for ev in self.all_event_ids()
        ]
        return (
            "<html><body data-kind='event_index'>\n"
            '<ul class="event-list__events">\n' + "\n".join(rows) + "\n</ul></body></html>"
        )

    def _section_body(self, tt: str, sec: str) -> str:
        cells = []
        for f1, f2, f3 in self.section_rows(tt, sec):
            # cross-entity discovery links: fullcredits rows carry person
            # links (reference cast hrefs spiders.py:1359-1419), awards
            # rows carry event links (evids from awards.csv seed the ev
            # crawl), companies rows carry company-search links
            # (spiders.py:3441-3448 coids -> search URL)
            if sec == "fullcredits":
                link = f' data-link="{self.person_url(f1)}"'
            elif sec == "awards":
                link = f' data-link="{self.event_url(f2)}"'
            elif sec == "companies":
                link = f' data-link="{self.company_url(f3)}"'
            else:
                link = ""
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

        m = re.search(r"/chart/(" + "|".join(CHARTS) + r")$", url)
        if m:
            return FetchResult(200, "chart", text=self._chart_body(m.group(1)))
        m = re.search(r"/movies-coming-soon/(\d{4}-\d{2})$", url)
        if m:
            return FetchResult(200, "coming_soon", text=self._coming_soon_body(m.group(1)))
        if re.search(r"/event/all$", url):
            return FetchResult(200, "event_index", text=self._event_index_body())
        m = re.search(r"/(?:title|name)/((?:tt|nm)\d+)/mediaviewer/(rm\d+)", url)
        if m:
            return FetchResult(200, "photo_detail", text=self._photo_detail_body(m.group(1), m.group(2)))
        m = re.search(r"/(?:title|name)/((?:tt|nm)\d+)/videogallery\?page=(\d+)", url)
        if m:
            return FetchResult(200, "videogallery", text=self._videogallery_body(m.group(1), int(m.group(2))))
        m = re.search(r"/videoplayer/(vi\d+)$", url)
        if m:
            return FetchResult(200, "video_player", text=self._video_player_body(m.group(1)))
        m = re.search(r"/mp4/(vi\d+)\.mp4", url)
        if m:
            vi = m.group(1)
            return FetchResult(200, "video_blob", body=self.video_bytes(vi), meta={"vi": vi})
        m = re.search(r"/(?:title|name)/((?:tt|nm)\d+)/news$", url)
        if m:
            return FetchResult(200, "news", text=self._news_body(m.group(1)))
        m = re.search(r"/title/(tt\d+)/ratings$", url)
        if m:
            return FetchResult(200, "ratings", text=self._ratings_body(m.group(1)))
        m = re.search(r"/name/(nm\d+)/(" + "|".join(PSECTIONS) + r")$", url)
        if m:
            return FetchResult(
                200, "psection", text=self._psection_body(m.group(1), m.group(2)),
                meta={"sec": m.group(2)},
            )
        m = re.search(r"/event/(ev\d+)/?$", url)
        if m:
            return FetchResult(200, "event", text=self._event_body(m.group(1)))
        m = re.search(r"/search/title/\?companies=(co\d+)&start=(\d+)$", url)
        if m:
            return FetchResult(200, "co_page", text=self._company_body(m.group(1), int(m.group(2))))
        m = re.search(r"/search/title/\?companies=(co\d+)$", url)
        if m:
            return FetchResult(200, "company", text=self._company_body(m.group(1), None))
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
        m = re.search(r"/(?:title|name)/((?:tt|nm)\d+)/mediaindex\?page=(\d+)", url)
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
