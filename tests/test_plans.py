"""Physical-plan regression gates.

Correctness tests pin WHAT the queries compute; these pin HOW — the plan
properties that decide whether the same code survives a 100 TB input:

* no CartesianProduct anywhere (an equi-join that degraded to n^2);
* no BatchEvalPython (a row-at-a-time Python UDF in the hot path —
  everything Python must cross via Arrow: ArrowEvalPython/MapInPandas);
* global ranks planned as range-partition + offsets, not a single-task
  ``Window.orderBy`` over the full table (round-1 verdict items 2/7);
* small dimensions broadcast, not shuffled;
* scans column-pruned to what the query reads.

They run at sf0.001: plan shape is scale-independent, so the smallest
fixture pins it cheapest.
"""

from __future__ import annotations

import os

import pytest

from film_crawler_spark.queries import REGISTRY

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def plan_of(df, mode: str = "extended") -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_no_row_python_udf(spark, name):
    s = plan_of(REGISTRY[name][0](spark, SF), "simple")
    assert "CartesianProduct" not in s, f"{name}: equi-join degraded to cartesian"
    assert "BatchEvalPython" not in s, f"{name}: row-at-a-time Python UDF in plan"


@pytest.mark.parametrize("name", ["seed_dedup_sort", "epoch_slicing"])
def test_global_rank_is_range_partitioned(spark, name):
    """The two rank-over-everything queries must carry the distributed-rank
    shape: a RangePartitioning exchange of the big table. (A window still
    appears in the plan — over the tiny per-partition counts side only.)"""
    s = plan_of(REGISTRY[name][0](spark, SF), "simple").lower()
    assert "rangepartitioning" in s, f"{name}: global rank lost the range exchange"


def test_small_dims_broadcast(spark):
    s = plan_of(REGISTRY["join_rollup"][0](spark, SF), "simple")
    assert "BroadcastHashJoin" in s, "nation dim should broadcast, not shuffle"
    s = plan_of(REGISTRY["ann_cosine_topk"][0](spark, SF), "simple")
    assert "Broadcast" in s, "query vectors should broadcast against the corpus"


def test_scan_column_pruned(spark):
    """token_count projects 2 of documents' 5 columns; the parquet scan's
    ReadSchema must not include the unread ones."""
    s = plan_of(REGISTRY["token_count"][0](spark, SF), "formatted")
    read = [ln for ln in s.splitlines() if "ReadSchema" in ln]
    assert read, "no parquet ReadSchema line found"
    for ln in read:
        for col in ("lang", "source", "n_chars"):
            assert col not in ln, f"unpruned column {col!r} in scan: {ln.strip()}"
