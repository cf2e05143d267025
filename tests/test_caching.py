"""Deterministic operator-cache release (round-2 verdict wart 3): the
dedup/similarity operators persist() intermediates that must survive
until the caller's terminal action; cache_scope releases them the moment
the composing block ends, so pipelines don't accumulate executor
storage across many operator calls."""

from pyspark.sql import functions as F

from film_crawler_spark.operators.caching import cache_scope, scoped_persist
from film_crawler_spark.operators.dedup import minhash_lsh_dups, ngram_jaccard_pairs


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    rows = [(i, f"s{i % 2}",
             "the quick brown fox jumps over the lazy dog " * 3 + str(i % 7))
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cache_scope_releases_operator_pins(spark):
    spark.catalog.clearCache()
    assert _n_persisted(spark) == 0
    docs = _docs(spark)
    with cache_scope():
        a = ngram_jaccard_pairs(docs, threshold=0.8).count()
        b = minhash_lsh_dups(docs, n_perm=16, bands=8).count()
        assert _n_persisted(spark) >= 2  # pins live while the scope is open
    assert _n_persisted(spark) == 0  # all released on exit
    # results are unaffected by the scope
    with cache_scope():
        assert ngram_jaccard_pairs(docs, threshold=0.8).count() == a
        assert minhash_lsh_dups(docs, n_perm=16, bands=8).count() == b
    assert _n_persisted(spark) == 0


def test_cache_scope_nested_and_unscoped(spark):
    spark.catalog.clearCache()
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    with cache_scope():
        scoped_persist(df).count()
        with cache_scope():
            inner = scoped_persist(spark.range(50))
            inner.count()
        # inner scope released only its own pin
        assert _n_persisted(spark) == 1
    assert _n_persisted(spark) == 0
    # outside any scope: plain persist, released by clearCache as before
    unscoped = scoped_persist(spark.range(10))
    unscoped.count()
    assert _n_persisted(spark) == 1
    spark.catalog.clearCache()
    assert _n_persisted(spark) == 0
