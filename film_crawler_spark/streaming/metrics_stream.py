"""Structured Streaming for the engine's metrics/event path.

The crawl loop itself is an iterative batch driver BY DESIGN (SURVEY.md
§1.2: each iteration's discoveries feed the next iteration's input — a
feedback edge streaming cannot express — and exact replay ordering is
part of the contract). What IS a stream is the telemetry that falls out
of it: fetch events, per-host throughput, error rates. This module
gives that path first-class streaming operators:

* ``stream_events``        — file-source stream over a parquet directory
                             (new files appear -> new micro-batches; on
                             a cluster this is the warehouse dir on
                             HDFS/S3).
* ``windowed_counts``      — event-time tumbling-window aggregation with
                             a watermark for late data.
* ``running_totals_state`` — a custom stateful operator via
                             ``applyInPandasWithState``: cumulative
                             per-key counters maintained across
                             micro-batches (the streaming twin of the
                             engine's per-host metrics accumulation).
* ``run_available_now``    — drain everything currently available into a
                             memory sink and return the result (used by
                             tests to prove stream == batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream: every parquet file that appears under
    ``directory`` becomes part of a micro-batch (Spark requires a
    directory here, not a single file)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(directory)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark; emits
    (window_start string, event_type, n, sum_value)."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts_tz", ts)
        .withWatermark("ts_tz", watermark)
        .groupBy(F.window("ts_tz", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def batch_windowed_counts(
    spark: SparkSession, path: str, window: str = "1 hour"
) -> DataFrame:
    """Batch twin of windowed_counts — equality with the drained stream
    is the streaming correctness test."""
    ev = spark.read.parquet(path)
    ts = F.col("ts").cast("timestamp")
    return (
        ev.groupBy(F.window(ts, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


STATE_OUT_SCHEMA = "event_type string, total long, total_value double"
STATE_SCHEMA = "total long, total_value double"


def running_totals_state(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-event-type totals kept in
    GroupState across micro-batches (applyInPandasWithState)."""

    def _update(key, pdfs, state: GroupState):
        total, total_value = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            total += len(pdf)
            total_value += float(pdf["value"].sum())
        state.update((total, round(total_value, 6)))
        yield pd.DataFrame(
            {"event_type": [key[0]], "total": [total], "total_value": [round(total_value, 6)]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=STATE_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, name: str, checkpoint: str) -> None:
    """Drain all currently-available input (trigger availableNow) into an
    in-memory table ``name``; blocks until done."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_update(stream_df: DataFrame, name: str, checkpoint: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
