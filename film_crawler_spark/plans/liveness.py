"""404-liveness probe — the reference's ``get_404_ttnm`` checker (P7).

The reference replays its full title and name id lists through plain
GETs and records which now return 404 (reference spiders.py:3472-3533,
writing 404tts.csv / 404nms.csv). The engine expresses the probe as a
derived frontier + one fetch pass:

    id DataFrame -> entity URL column -> fetch_batch (retry policy
    applies: a 500-then-heal URL is NOT dead) -> filter status==404 ->
    (id, canon_url) report

The probe is an ordinary bounded Spark job: politeness budgets apply
(the reference hammers with THREADS=4 and no budget), and at 10^10 ids
the fetch spreads exactly like the crawl's media stage (hash-partitioned
by canon_url, no per-host serialization when delay is 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from film_crawler_spark.operators.fetch import fetch_drain
from film_crawler_spark.operators.frontier import FRONTIER_SCHEMA, seed_seq
from film_crawler_spark.operators.politeness import PolitenessConfig
from film_crawler_spark.sources.synthetic_site import SiteConfig, SyntheticSite


def probe_404(
    ids: DataFrame,
    entity: str,
    cfg: SiteConfig | None = None,
    pol: PolitenessConfig | None = None,
) -> DataFrame:
    """ids: single-column DataFrame of tt or nm ids. entity: 'tt'|'nm'.
    Returns (id, canon_url, status) for ids whose page is now dead
    (status 404 after the standard retry policy)."""
    cfg = cfg or SiteConfig()
    pol = pol or PolitenessConfig()
    site = SyntheticSite(cfg)
    id_col = ids.columns[0]

    import pandas as pd

    from film_crawler_spark.functions.urls import canonicalize_url

    @F.pandas_udf("string")
    def entity_url(s):
        fn = site.title_url if entity == "tt" else site.person_url
        return s.map(fn)

    @F.pandas_udf("string")
    def canon(s):
        return s.map(canonicalize_url)

    @F.pandas_udf("string")
    def seqkey(s):
        return s.map(seed_seq)

    kind = "title" if entity == "tt" else "person"
    # rank for seq: probes are order-insensitive, so the cheap
    # monotonically-increasing id is enough (no global sort needed)
    frontier = (
        ids.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("_rn", F.monotonically_increasing_id())
        .select(
            entity_url("id").alias("url"),
            F.lit(0).alias("priority"),
            seqkey("_rn").alias("seq"),
            F.col("id"),
        )
        .select(
            "url",
            canon("url").alias("canon_url"),
            F.xxhash64(canon("url")).alias("url_hash"),
            F.pmod(F.hash(canon("url")), F.lit(64)).cast("int").alias("shard"),
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
            "priority", "seq",
            F.lit(0).alias("depth"),
            F.lit(kind).alias("page_kind"),
            (F.col("id") if entity == "tt" else F.lit(None).cast("string")).alias("tt"),
            F.lit(None).cast("string").alias("rm"),
            (F.col("id") if entity == "nm" else F.lit(None).cast("string")).alias("nm"),
            F.lit(None).cast("string").alias("vi"),
            F.lit(None).cast("string").alias("ev"),
            F.lit(None).cast("string").alias("co"),
            F.lit(0).alias("attempts"),
            F.lit(0).alias("discovered_at_iter"),
        )
    )
    assert [f.name for f in FRONTIER_SCHEMA.fields] == frontier.columns
    dead_id = F.coalesce("tt", "nm").alias("id")
    # fetch_drain, not one fetch_batch: politeness budgets cap fetches
    # per host per pass, and a single pass over an id list longer than
    # budget_html would silently skip (= report alive) everything past
    # the cap. The drain loops until every id was actually probed.
    fetched = fetch_drain(frontier, cfg, pol)
    return (
        fetched.filter(F.col("status") == 404)
        .select(dead_id, "canon_url", "status")
        .orderBy("id")
    )
