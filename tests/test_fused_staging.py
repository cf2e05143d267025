"""Fused single-pass staging (plans/fused_staging.py) mechanics:

* parity — every THIN_TABLES delta staged by the fused pass equals the
  corresponding per-table ``extract_*`` output on the same fetched frame
  (same rows, same schema incl. the MapType ratings column);
* empty kinds — tables whose source kind is absent still stage a
  readable, schema-correct empty delta;
* idempotency — re-staging the same iteration overwrites cleanly.

End-to-end parity vs the serial simulator is separately gated by the
replay suite (the crawl loop stages through this writer).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from film_crawler_spark.operators import parse as P
from film_crawler_spark.plans.fused_staging import stage_thin_tables
from film_crawler_spark.sources.synthetic_site import SiteConfig, SyntheticSite
from film_crawler_spark.sources.tableio import TableIO

SITE = SyntheticSite(SiteConfig())

OK_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("tt", T.StringType()),
        T.StructField("rm", T.StringType()),
        T.StructField("nm", T.StringType()),
        T.StructField("vi", T.StringType()),
        T.StructField("ev", T.StringType()),
        T.StructField("co", T.StringType()),
        # the crawl loop stamps the fetched frame with the iteration's
        # synthetic timestamp; the ratings parser reads it (K2)
        T.StructField("fetched_at", T.StringType()),
    ]
)

FETCHED_AT = P.synthetic_fetch_time(7)


def _row(url, *, tt=None, rm=None, nm=None, vi=None, ev=None, co=None):
    res = SITE.fetch(url, attempt=10)  # attempt 10 heals flaky 500s
    if res.status != 200 or not res.text:
        return None
    return (res.kind, res.text.encode(), tt, rm, nm, vi, ev, co, FETCHED_AT)


@pytest.fixture(scope="module")
def ok_frame(spark):
    rows = []
    for i in (1, 2, 3):
        tt = f"tt{i:07d}"
        host = SITE.host_of_title(tt)
        turl = SITE.title_url(tt)
        rows.append(_row(turl, tt=tt))
        if SITE.n_images(tt):
            rm = SITE.rm_id(tt, 0)
            rows.append(_row(f"https://{host}/title/{tt}/mediaviewer/{rm}", tt=tt, rm=rm))
        for sec in ("keywords", "quotes", "fullcredits"):
            rows.append(_row(turl + sec, tt=tt))
        rows.append(_row(turl + "reviews", tt=tt))
        rows.append(_row(turl + "news", tt=tt))
        rows.append(_row(turl + "ratings", tt=tt))
        if SITE.n_videos(tt):
            vi = SITE.vi_id(tt, 0)
            rows.append(_row(f"https://{host}/videoplayer/{vi}", tt=tt, vi=vi))
        nm = f"nm{i:07d}"
        purl = SITE.person_url(nm)
        rows.append(_row(purl, nm=nm))
        rows.append(_row(purl + "filmosearch?page=1", nm=nm))
        rows.append(_row(purl + "bio", nm=nm))
    rows = [r for r in rows if r is not None]
    # deliberately NO event / company / co_page rows: those tables must
    # come out empty but readable
    assert {r[0] for r in rows} >= {
        "title", "photo_detail", "section", "reviews", "news", "ratings",
        "person", "filmo", "psection", "video_player",
    }
    return spark.createDataFrame(rows, OK_SCHEMA).repartition(4)


def test_fused_matches_extracts(spark, tmp_path, ok_frame):
    io = TableIO(spark, str(tmp_path / "wh"))
    counts = stage_thin_tables(ok_frame, io, it=7)
    for table, (kind, _fn, schema) in P.THIN_TABLES.items():
        staged = spark.read.parquet(io._tdir(table, 7))
        expect = getattr(
            P,
            {"events_base": "extract_events_base",
             "event_awards": "extract_event_awards",
             "companies_base": "extract_companies"}.get(table, f"extract_{table}"),
        )(ok_frame)
        exp_rows = sorted(map(str, expect.collect()))
        got = staged.drop("iteration")
        got_rows = sorted(map(str, got.select(*[f.name for f in schema.fields]).collect()))
        assert got_rows == exp_rows, table
        assert counts[table] == len(exp_rows), table
        # schema parity with the per-table extractor (incl. ratings map)
        assert [(f.name, f.dataType) for f in got.schema.fields] == [
            (f.name, f.dataType) for f in schema.fields
        ], table
        assert staged.schema["iteration"].dataType == T.IntegerType()
        assert (
            staged.filter(F.col("iteration") != 7).count() == 0
        ), table


def test_empty_kind_tables_readable(spark, tmp_path, ok_frame):
    io = TableIO(spark, str(tmp_path / "wh"))
    counts = stage_thin_tables(ok_frame, io, it=0)
    for table in ("events_base", "event_awards", "companies_base", "company_films"):
        assert counts[table] == 0
        df = spark.read.parquet(io._tdir(table, 0))
        assert df.count() == 0
        assert "iteration" in df.columns


def test_media_only_iteration_skips_fused_job(spark, tmp_path, ok_frame):
    """kinds_present disjoint from every thin source kind (a media-only
    iteration) must not scan the fetched cache at all: the pre-seeded
    empties alone make every staged dir readable. The input frame is
    poisoned so any Spark action over it fails — the test passes only
    when no job runs."""
    io = TableIO(spark, str(tmp_path / "wh"))
    poison = ok_frame.filter(F.assert_true(F.lit(False)).isNull())
    counts = stage_thin_tables(
        poison, io, it=1, kinds_present={"image_blob", "video_blob"}
    )
    assert set(counts) == set(P.THIN_TABLES)
    assert all(v == 0 for v in counts.values())
    for table in P.THIN_TABLES:
        df = spark.read.parquet(io._tdir(table, 1))
        assert df.count() == 0
        assert "iteration" in df.columns


def test_restage_is_idempotent(spark, tmp_path, ok_frame):
    io = TableIO(spark, str(tmp_path / "wh"))
    a = stage_thin_tables(ok_frame, io, it=3)
    snap = {
        t: sorted(map(str, spark.read.parquet(io._tdir(t, 3)).collect()))
        for t in P.THIN_TABLES
    }
    b = stage_thin_tables(ok_frame, io, it=3)  # crash-replay of the same it
    assert a == b
    for t in P.THIN_TABLES:
        assert snap[t] == sorted(map(str, spark.read.parquet(io._tdir(t, 3)).collect())), t
