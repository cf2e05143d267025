"""tools/stage_profile.py: the offline event-log stage profiler parses
Spark 4 rolling (v2, zstd) event logs and attributes executor time,
shuffle bytes, and task counts per stage. The workload runs in a
subprocess because event logging is builder-time conf (the shared test
session can't be reconfigured)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys; sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from film_crawler_spark.session import get_spark
spark = get_spark(master="local[2]", shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
n = spark.range(50000).withColumn("k", F.col("id") % 13).groupBy("k").count().count()
assert n == 13
spark.stop()
"""


def test_stage_profile_aggregates_event_log(tmp_path):
    ev_dir = str(tmp_path / "events")
    env = {**os.environ, "SPARK_GRAFT_EVENTLOG": ev_dir}
    subprocess.run(
        [sys.executable, "-c", JOB.format(repo=REPO)],
        check=True, env=env, cwd=REPO, timeout=300,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from stage_profile import profile_dir

    rows = profile_dir(ev_dir)
    assert rows, "no stages parsed from the event log"
    # the groupBy ran: at least two stages (map + reduce), tasks counted,
    # and the output is sorted by executor run time descending
    assert len(rows) >= 2
    assert all(r["tasks"] >= 1 for r in rows)
    assert rows == sorted(rows, key=lambda r: r["run_ms"], reverse=True)
    total_mb = sum(r["shuffle_write_mb"] for r in rows)
    assert total_mb >= 0.0  # metrics fields present and numeric
