"""URL canonicalization (idempotence via hypothesis), murmur3 parity
with Spark's hash(), ori-URL derivation parity (reference
spiders.py:767-771), pagination math (reference spiders.py:707-709)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from film_crawler_spark.functions.urls import (
    canonicalize_url,
    extract_entity_id,
    murmur3_x86_32,
    n_pages,
    ori_url,
    ori_url_col,
    pages_col,
    shard_col,
    url_host,
    url_shard,
)


def test_canonicalize_basics():
    assert (
        canonicalize_url("HTTP://Example.COM:80/a/./b/../c/?b=2&a=1#frag")
        == "http://example.com/a/c/?a=1&b=2"
    )
    assert canonicalize_url("https://x.com:8443/p") == "https://x.com:8443/p"
    assert canonicalize_url("https://x.com:443/p") == "https://x.com/p"
    assert canonicalize_url("https://x.com") == "https://x.com/"


def test_canonicalize_pct_encoded_dot_segments():
    """%2E is unreserved, so %2E%2E decodes to '..' — it must be decoded
    BEFORE dot-segment removal (RFC 3986 6.2.2 then 6.2.2.3), else the
    output contains a literal '../' that a second canonicalize collapses
    (round-2 ADVICE: two seen-set identities for one resource)."""
    assert canonicalize_url("https://h/a/%2E%2E/b") == "https://h/b"
    assert canonicalize_url("https://h/a/%2E/b") == "https://h/a/b"
    assert canonicalize_url("https://h/%2E%2E/b") == "https://h/b"
    for u in ["https://h/a/%2E%2E/b", "https://h/a/%2e/b%2E", "https://h/%2E"]:
        c = canonicalize_url(u)
        assert canonicalize_url(c) == c


@settings(max_examples=200, deadline=None)
@given(
    st.builds(
        lambda h, p, q: f"https://{h}/{p}" + (f"?{q}" if q else ""),
        st.from_regex(r"[a-zA-Z][a-zA-Z0-9.-]{0,20}", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9_/.%~-]{0,30}", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9=&_-]{0,20}", fullmatch=True),
    )
)
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c


def test_entity_id_extraction():
    assert extract_entity_id("https://h/title/tt0012345/mediaindex") == "tt0012345"
    assert extract_entity_id("https://h/name/nm0000001/") == "nm0000001"
    assert extract_entity_id("https://h/title/tt1/mediaviewer/rm123") == "tt1"
    assert extract_entity_id("https://h/nothing/") is None
    assert url_host("HTTPS://A.B.c/x") == "a.b.c"


@pytest.mark.parametrize(
    "n,k,exp", [(0, 48, 0), (1, 48, 1), (48, 48, 1), (49, 48, 2), (96, 48, 2), (97, 48, 3)]
)
def test_pagination_math(n, k, exp):
    assert n_pages(n, k) == exp
    # property from SURVEY §5: pages*k >= n > (pages-1)*k for n>0
    if n > 0:
        p = n_pages(n, k)
        assert p * k >= n > (p - 1) * k


def test_murmur3_matches_spark_hash(spark):
    vals = ["", "a", "hello", "tt0000123", "https://example.com/title/tt1/?page=3", "日本語テキスト", "x" * 100]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", F.hash("s").alias("h"), shard_col(F.col("s"), 64).alias("sh")).collect()
    for r in rows:
        assert murmur3_x86_32(r["s"].encode("utf-8")) == r["h"]
        assert url_shard(r["s"], 64) == r["sh"]


def test_ori_url_parity(spark):
    larges = [
        "https://img.media-h0.com/images/rm123456789.UX96_CR0.png",
        "https://img.media-h2.com/images/rm000000001.UX96_CR0.dctq",
        "a.b.c.d.e.jpg",
    ]
    df = spark.createDataFrame([(u,) for u in larges], "large string")
    rows = df.select("large", ori_url_col(F.col("large")).alias("ori")).collect()
    for r in rows:
        assert r["ori"] == ori_url(r["large"])
    assert ori_url(larges[0]) == "https://img.media-h0.com/images/rm123456789.png"


def test_pages_col_matches_python(spark):
    df = spark.range(0, 200).select(F.col("id").cast("int").alias("n"))
    rows = df.select("n", pages_col(F.col("n"), 48).alias("p")).collect()
    for r in rows:
        assert r["p"] == n_pages(r["n"], 48)
