"""Direct unit coverage for frontier.distributed_rank — the sanctioned
global-rank plan (range partition + mono-id offsets, no single-task
window). Until now it was covered only indirectly (seed_dedup_sort /
epoch_slicing oracles, replay seed init); this pins the contract on
edges those paths never hit: tiny/empty inputs, explicit partition
counts, descending order, start offsets, and skewed key distributions.
"""

import pytest
from pyspark.sql import functions as F

from film_crawler_spark.operators import frontier as FR


def _expected(vals, desc=False, start=0):
    order = sorted(vals, reverse=desc)
    return {v: i + start for i, v in enumerate(order)}


@pytest.mark.parametrize("n,parts", [(1, None), (7, 2), (1000, None), (1000, 13)])
def test_rank_matches_serial_sort(spark, n, parts):
    # pseudo-random but deterministic unique keys
    df = spark.range(n).select((F.hash(F.col("id").cast("string")) % 1000003).alias("k")).distinct()
    vals = [r["k"] for r in df.collect()]
    got = {
        r["k"]: r["rank"]
        for r in FR.distributed_rank(df, [F.col("k")], num_partitions=parts).collect()
    }
    assert got == _expected(vals)


def test_rank_desc_and_start(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    got = {
        r["k"]: r["rank"]
        for r in FR.distributed_rank(df, [F.col("k").desc()], start=1).collect()
    }
    assert got == _expected(range(100), desc=True, start=1)
    assert min(got.values()) == 1 and max(got.values()) == 100


def test_rank_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    out = FR.distributed_rank(df, [F.col("k")])
    assert out.count() == 0
    assert "rank" in out.columns


def test_rank_skewed_keys_total_and_dense(spark):
    # heavy skew: 90% of rows share one range — ranks must still be a
    # dense permutation of [0, n) (range partitioner puts the hot range
    # in few partitions; offsets must still add up exactly)
    df = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.col("id") % 50).otherwise(F.col("id") + 10000).alias("kk"),
        F.col("id").alias("tie"),
    )
    out = FR.distributed_rank(df, [F.col("kk"), F.col("tie")], "rank").collect()
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(2000))
    # and the order agrees with the serial sort of the composite key
    by_rank = sorted(out, key=lambda r: r["rank"])
    keys = [(r["kk"], r["tie"]) for r in by_rank]
    assert keys == sorted(keys)
