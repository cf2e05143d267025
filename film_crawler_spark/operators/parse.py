"""The parse stage: fetched pages -> extracted rows + discovered URLs.

One Arrow-batched pass per output family, dispatching on ``page_kind``
— the Spark restatement of the reference's per-page-type ``get*``
parsers (SURVEY.md §2.11; e.g. hero fields spiders.py:339-362, photo
grid spiders.py:730-772, photo modal captions spiders.py:1734-1857).
Parsers are regex over the synthetic bodies; the *shapes* (what is
extracted, what fans out, in what order) are the reference's.

Discovery ordering: every discovered URL carries seq = child_seq(parent
seq, ordinal) where ordinal is its position on the page — grid order for
photos (the reference preserves pool.map input order, spiders.py:749-
755), page number for pagination, {small, large, ori} = {0, 1, 2} for
renditions (reference download order, spiders.py:2936-2961).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from film_crawler_spark.functions.urls import canonicalize_url, n_pages, ori_url, url_host
from film_crawler_spark.operators.frontier import child_seq
from film_crawler_spark.sources.synthetic_site import PER_PAGE, PER_PAGE_HIST, SECTIONS

# frontier columns the parse UDF emits; url_hash/shard are added JVM-side
# afterwards (xxhash64/murmur3 must come from Spark so they are the same
# bits everywhere).
DISCOVERED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("canon_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("seq", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("page_kind", T.StringType()),
        T.StructField("tt", T.StringType()),
        T.StructField("rm", T.StringType()),
        T.StructField("nm", T.StringType()),
    ]
)

TITLE_SCHEMA = T.StructType(
    [
        T.StructField("tt", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("metascore", T.IntegerType()),
        T.StructField("n_images", T.IntegerType()),
    ]
)

CAPTION_SCHEMA = T.StructType(
    [
        T.StructField("rm", T.StringType()),
        T.StructField("tt", T.StringType()),
        T.StructField("caption", T.StringType()),
    ]
)

SECTION_SCHEMA = T.StructType(
    [
        T.StructField("tt", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("f1", T.StringType()),
        T.StructField("f2", T.StringType()),
        T.StructField("f3", T.StringType()),
    ]
)

RENDITION_SCHEMA = T.StructType(
    [
        T.StructField("rm", T.StringType()),
        T.StructField("tt", T.StringType()),
        T.StructField("rendition", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

_RE_COUNT = re.compile(r'class="image-count">([\d,]+) Photos')
_RE_HERO = re.compile(r"<h1>(.*?)</h1>.*?rating\">([\d.]+)/10</span>.*?metascore\">(\d+)<", re.S)
_RE_GRID = re.compile(r'href="(/title/(tt\d+)/mediaviewer/(rm\d+))"')
_RE_CAPTION = re.compile(r'class="caption">(.*?)</div>')
_RE_SIZED = re.compile(r'data-size="(small|large)" src="([^"]+)"')
_RE_SIZE_SPEC = re.compile(r"\.(UX32_CR0|UX96_CR0)\.")
_RE_PERSON_LINK = re.compile(r'data-link="(https://[^"]+/name/(nm\d+)/)"')
_RE_CREDITS = re.compile(r'class="credit-count">([\d,]+) credits')
_RE_PERSON_HERO = re.compile(
    r"<h1>(.*?)</h1>.*?jobs\">(.*?)</span>.*?born\">(\d+)</span>", re.S
)
_RE_FILMO_ROW = re.compile(r'<li class="credit"><a href="/title/(tt\d+)/">(.*?)</a></li>')


def discover_links(fetched_ok: DataFrame) -> DataFrame:
    """All kinds -> newly discovered frontier rows (F1/F5/F7 fan-outs).

    Blob rows are filtered JVM-side BEFORE the Arrow boundary: leaves of
    the crawl graph discover nothing, and their binary bodies are the
    bulk of the fetched bytes — shipping them into Python here would
    dominate the discovery pass at media-heavy iterations."""
    fetched_ok = fetched_ok.filter(F.col("kind") != "image_blob")
    cols = [f.name for f in DISCOVERED_SCHEMA.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                body = r.body.decode("utf-8", "replace") if r.kind != "image_blob" else ""
                base = f"https://{r.host}"
                if r.kind == "title":
                    m = _RE_COUNT.search(body)
                    n = int(m.group(1).replace(",", "")) if m else 0
                    pages = n_pages(n, PER_PAGE)
                    for p in range(1, pages + 1):
                        u = f"{base}/title/{r.tt}/mediaindex?page={p}"
                        rows.append(
                            (u, canonicalize_url(u), r.host, 1, child_seq(r.seq, p - 1), 1,
                             "mediaindex", r.tt, None, None)
                        )
                    # F6 subpage fan-out (reference spiders.py:310-329):
                    # section URLs are CONSTRUCTED from the title URL, not
                    # parsed from links; ordinals continue after the
                    # mediaindex pages, preserving the reference's
                    # images-then-sections fetch order (spiders.py:370-442)
                    for s_i, sec in enumerate(SECTIONS):
                        u = r.url + sec  # title urls end with '/'
                        rows.append(
                            (u, canonicalize_url(u), r.host, 1,
                             child_seq(r.seq, pages + s_i), 1, "section", r.tt, None, None)
                        )
                    # reviews: ONE crawl URL per title; the load-more
                    # cursor loop lives in the resolver (S5 semantics —
                    # reference spiders.py:1508-1564 drives one browser
                    # page, so the seen set holds one URL)
                    u = r.url + "reviews"
                    rows.append(
                        (u, canonicalize_url(u), r.host, 1,
                         child_seq(r.seq, pages + len(SECTIONS)), 1, "reviews", r.tt, None, None)
                    )
                elif r.kind == "mediaindex":
                    for j, m in enumerate(_RE_GRID.finditer(body)):
                        u = base + m.group(1)
                        rows.append(
                            (u, canonicalize_url(u), r.host, 2, child_seq(r.seq, j), 2,
                             "photo_detail", m.group(2), m.group(3), None)
                        )
                elif r.kind == "section":
                    # cross-entity discovery (reference nmIMDB spider is
                    # seeded from cast links; here the fullcredits section
                    # IS the link source, spiders.py:1359-1419 cast ids)
                    for j, m in enumerate(_RE_PERSON_LINK.finditer(body)):
                        u, nm_id = m.group(1), m.group(2)
                        rows.append(
                            (u, canonicalize_url(u), url_host(u), 2,
                             child_seq(r.seq, j), 2, "person", None, None, nm_id)
                        )
                elif r.kind == "person":
                    m = _RE_CREDITS.search(body)
                    n = int(m.group(1).replace(",", "")) if m else 0
                    for p in range(1, n_pages(n, PER_PAGE_HIST) + 1):
                        u = f"{base}/name/{r.nm}/filmosearch?page={p}"
                        rows.append(
                            (u, canonicalize_url(u), r.host, 3, child_seq(r.seq, p - 1), 3,
                             "filmo", None, None, r.nm)
                        )
                elif r.kind == "photo_detail":
                    sized = dict(_RE_SIZED.findall(body))
                    small, large = sized.get("small"), sized.get("large")
                    if small and large:
                        for j, u in enumerate([small, large, ori_url(large)]):
                            rows.append(
                                (u, canonicalize_url(u), url_host(u), 3, child_seq(r.seq, j), 3,
                                 "image_blob", r.tt, r.rm, None)
                            )
            yield pd.DataFrame(rows, columns=cols)

    return fetched_ok.mapInPandas(_run, DISCOVERED_SCHEMA)


def extract_titles(fetched_ok: DataFrame) -> DataFrame:
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "title":
                    continue
                body = r.body.decode("utf-8", "replace")
                hero = _RE_HERO.search(body)
                cnt = _RE_COUNT.search(body)
                if hero:
                    rows.append(
                        (r.tt, hero.group(1), float(hero.group(2)), int(hero.group(3)),
                         int(cnt.group(1).replace(",", "")) if cnt else 0)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in TITLE_SCHEMA.fields])

    return fetched_ok.filter(F.col("kind") == "title").mapInPandas(_run, TITLE_SCHEMA)


def extract_captions(fetched_ok: DataFrame) -> DataFrame:
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "photo_detail":
                    continue
                m = _RE_CAPTION.search(r.body.decode("utf-8", "replace"))
                if m:
                    rows.append((r.rm, r.tt, m.group(1)))
            yield pd.DataFrame(rows, columns=[f.name for f in CAPTION_SCHEMA.fields])

    return fetched_ok.filter(F.col("kind") == "photo_detail").mapInPandas(_run, CAPTION_SCHEMA)


REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("tt", T.StringType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("review_id", T.StringType()),
        T.StructField("rating", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("action", T.StringType()),
    ]
)

_RE_REVIEW = re.compile(
    r'<div class="review" data-id="(rw\d+)"><span class="rv-rating">(.*?)</span>'
    r'<span class="rv-title">(.*?)</span><span class="rv-name">(.*?)</span>'
    r'<span class="rv-date">(.*?)</span><p class="rv-text">(.*?)</p>'
    r'<span class="rv-action">(.*?)</span></div>'
)
_RE_LOADED_ALL = re.compile(r"class='loaded-all'")


PERSON_SCHEMA = T.StructType(
    [
        T.StructField("nm", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("jobs", T.StringType()),
        T.StructField("born", T.IntegerType()),
        T.StructField("n_credits", T.IntegerType()),
    ]
)

CREDIT_SCHEMA = T.StructType(
    [
        T.StructField("nm", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("tt", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)


def extract_persons(fetched_ok: DataFrame) -> DataFrame:
    """Person hero fields (reference person base.csv: id, name, jobs,
    born — spiders.py:2235-2242, parsed at 2131-2165)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "person":
                    continue
                body = r.body.decode("utf-8", "replace")
                hero = _RE_PERSON_HERO.search(body)
                cnt = _RE_CREDITS.search(body)
                if hero:
                    rows.append(
                        (r.nm, hero.group(1), hero.group(2), int(hero.group(3)),
                         int(cnt.group(1).replace(",", "")) if cnt else 0)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PERSON_SCHEMA.fields])

    return fetched_ok.filter(F.col("kind") == "person").mapInPandas(_run, PERSON_SCHEMA)


def extract_credits(fetched_ok: DataFrame) -> DataFrame:
    """Filmography rows (reference hists.csv: id, url, title —
    spiders.py:2332-2340, paginated get_hist at 2382-2421). ``ord`` is
    the position on the page; (page, ord) reconstructs the reference's
    sort=year traversal order."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "filmo":
                    continue
                body = r.body.decode("utf-8", "replace")
                pm = re.search(r"data-page='(\d+)'", body)
                page = int(pm.group(1)) if pm else 0
                for i, m in enumerate(_RE_FILMO_ROW.finditer(body)):
                    rows.append((r.nm, page, i, m.group(1), m.group(2)))
            yield pd.DataFrame(rows, columns=[f.name for f in CREDIT_SCHEMA.fields])

    return fetched_ok.filter(F.col("kind") == "filmo").mapInPandas(_run, CREDIT_SCHEMA)


def extract_reviews(fetched_ok: DataFrame) -> DataFrame:
    """getEachReview twin (reference spiders.py:1566-1597, 4491-4528):
    reviews.csv columns (rating, title, name, ID, date, text, action).
    The loaded-all marker (reference's termination condition,
    spiders.py:1544-1549) must be present — a truncated page (load-more
    loop interrupted) yields NO rows so the retry policy re-fetches
    rather than committing a partial list."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "reviews":
                    continue
                body = r.body.decode("utf-8", "replace")
                if not _RE_LOADED_ALL.search(body):
                    continue
                for i, m in enumerate(_RE_REVIEW.finditer(body)):
                    rid, rating, title, name, date, text, action = m.groups()
                    rows.append((r.tt, i, rid, rating, title, name, date, text, action))
            yield pd.DataFrame(rows, columns=[f.name for f in REVIEW_SCHEMA.fields])

    return fetched_ok.filter(F.col("kind") == "reviews").mapInPandas(_run, REVIEW_SCHEMA)


_RE_SEC_KIND = re.compile(r"data-sec='(\w+)'")
_RE_SEC_ROW = re.compile(
    r'<tr class="sec-row"(?: data-link="[^"]*")?><td>(.*?)</td><td>(.*?)</td><td>(.*?)</td></tr>'
)

# typed per-section column names — the engine twin of the reference's
# fixed-schema section CSVs (SURVEY §1.3: keywords.csv, companies.csv,
# awards.csv, quotes.csv, release.csv, technicals.csv, locations.csv,
# trivia.csv, summaries.csv, casts.csv)
SECTION_COLUMNS = {
    "keywords": ["keyword"],
    "companies": ["type", "name", "co_id"],
    "awards": ["title", "ev_id", "award_description"],
    "quotes": ["character", "text"],
    "releaseinfo": ["country", "date", "attribute"],
    "technical": ["label", "value"],
    "locations": ["type", "value"],
    "trivia": ["text"],
    "plotsummary": ["text", "author"],
    "fullcredits": ["nm_id", "name", "character"],
}


def extract_sections(fetched_ok: DataFrame) -> DataFrame:
    """Section pages -> tall (tt, section, ord, f1..f3) rows, in page
    order — one parse pass for the whole §2.11 section family; typed
    per-section frames come from ``section_view``."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "section":
                    continue
                body = r.body.decode("utf-8", "replace")
                km = _RE_SEC_KIND.search(body)
                sec = km.group(1) if km else None
                for i, m in enumerate(_RE_SEC_ROW.finditer(body)):
                    f1, f2, f3 = (g if g else None for g in m.groups())
                    rows.append((r.tt, sec, i, f1, f2, f3))
            yield pd.DataFrame(rows, columns=[f.name for f in SECTION_SCHEMA.fields])

    return fetched_ok.filter(F.col("kind") == "section").mapInPandas(_run, SECTION_SCHEMA)


def section_view(sections: DataFrame, sec: str) -> DataFrame:
    """Typed projection of the tall sections table for one section —
    column names match the reference CSV schemas (SURVEY §1.3)."""
    cols = SECTION_COLUMNS[sec]
    out = sections.filter(F.col("section") == sec).select(
        "tt", "ord", *[F.col(f"f{i + 1}").alias(c) for i, c in enumerate(cols)]
    )
    return out


def decode_blobs(fetched_ok: DataFrame) -> DataFrame:
    """image_blob rows -> renditions (input_hint columns). Pure JVM
    projection: the decode + phash already happened inside the fetch
    pass (operators/fetch.py), where the bytes were in Python memory
    anyway — re-crossing the Arrow boundary here would double the
    heaviest data movement of a media iteration."""
    return (
        fetched_ok.filter((F.col("kind") == "image_blob") & F.col("fmt").isNotNull())
        .select(
            "rm", "tt", "rendition",
            F.col("body").alias("bytes"),
            "w", "h", "fmt", "phash",
        )
    )
