"""Streaming correctness: draining the stream (availableNow) must equal
the batch computation over the same files; the stateful operator's
final totals must equal batch totals."""

import os

from pyspark.sql import functions as F

from film_crawler_spark.streaming import metrics_stream as MS

SF = "/root/testdata/sf0.001"


def _events_dir(tmp_path) -> str:
    d = tmp_path / "events_in"
    d.mkdir()
    os.symlink(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    path = _events_dir(tmp_path)
    stream = MS.windowed_counts(MS.stream_events(spark, path), window="1 hour", watermark="2 hours")
    MS.run_available_now(stream, "win_counts", str(tmp_path / "ckpt1"))
    got = {tuple(r) for r in spark.table("win_counts").collect()}
    want = {tuple(r) for r in MS.batch_windowed_counts(spark, path, "1 hour").collect()}
    assert got == want and len(want) > 0


def test_running_totals_state(spark, tmp_path):
    path = _events_dir(tmp_path)
    stream = MS.running_totals_state(MS.stream_events(spark, path))
    MS.run_available_now_update(stream, "run_totals", str(tmp_path / "ckpt2"))
    # update-mode memory sink may hold multiple rows per key (one per
    # micro-batch); the LAST emitted row per key carries the final state
    rows = spark.table("run_totals").collect()
    final = {}
    for r in rows:
        final[r["event_type"]] = (r["total"], r["total_value"])
    want = {
        r["event_type"]: (r["total"], r["total_value"])
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("total"), F.round(F.sum("value"), 6).alias("total_value"))
        .collect()
    }
    # totals are cumulative, so the max per key equals the batch total
    got = {
        k: max(
            ((r["total"], r["total_value"]) for r in rows if r["event_type"] == k),
            key=lambda t: t[0],
        )
        for k in final
    }
    assert got == want
