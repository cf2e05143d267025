"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2 +
                  the training-data extensions), from
                  film_crawler_spark.queries.REGISTRY.
``oracle_sql()``— the DuckDB twins for EVERY entry (since round 3 —
                  zero rows-only queries): simhash/minhash/LSH-ANN use
                  md5-derived hashes/planes that Spark SQL, NumPy and
                  DuckDB all compute identically, and the IVF entry runs
                  at exhaustive probe where IVF == exact top-k by
                  construction; probabilistic-recall configs are
                  additionally gated in pytest
                  (tests/test_dedup_similarity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from film_crawler_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the training-data document pipeline — fingerprint-based
    dedup + quality + language-id + token stats in one pass over
    sf0.001 documents (everything JVM-side column expressions)."""
    from pyspark.sql import functions as F

    from film_crawler_spark.operators import textops as TX

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    enriched = docs.select(
        "doc_id",
        "lang",
        "source",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.lang_id(F.col("text")).alias("pred_lang"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        enriched.withColumn("dup_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("dup_rank") == 1)
        .drop("dup_rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
