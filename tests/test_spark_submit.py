"""North-rule deploy shape: launch the pipeline via ``spark-submit
--py-files`` in a fresh JVM, kill it mid-run, resume, verify outputs.

The submit runs from a NEUTRAL working directory containing only the
launcher script and the zip — so every ``skewer_spark`` import (driver
AND the pandas-UDF workers) must come from the ``--py-files`` archive,
exactly as on a real cluster (the repo checkout is not on any path).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(workdir: str, zip_path: str, job_args: list[str]):
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--driver-memory", "3g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        os.path.join(workdir, "run_job.py"),
    ] + job_args
    return subprocess.run(
        cmd, cwd=workdir, env=env, capture_output=True, text=True, timeout=600
    )


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_resume(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles_zip import build_zip

    from skewer_spark.synth import transcripts_df

    inp = str(tmp_path / "transcripts")
    out = str(tmp_path / "out")
    transcripts_df(spark, 30, 10).write.mode("overwrite").parquet(inp)
    expected = spark.read.parquet(inp).count()

    work = tmp_path / "deploy"
    work.mkdir()
    zip_path = build_zip(str(work / "skewer_spark.zip"))
    shutil.copy(os.path.join(REPO, "run_job.py"), work / "run_job.py")

    base = ["--input", inp, "--out", out, "--buckets", "3"]

    # first launch dies after 1 committed bucket (injected)
    r1 = _submit(str(work), zip_path, base + ["--fail-after", "1"])
    assert r1.returncode != 0
    assert "injected failure" in (r1.stderr + r1.stdout)

    # resumed launch (fresh JVM) finishes only the remaining buckets
    r2 = _submit(str(work), zip_path, base + ["--run-id", "resume2"])
    assert r2.returncode == 0, r2.stderr[-4000:]
    summary = json.loads(
        [ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["rows"] == expected
    assert summary["parallelism"] == 4

    # the manifest shows bucket 0 committed by run 1, the rest by run 2
    man = spark.read.parquet(os.path.join(out, "_manifest"))
    rows = {r.bucket: r.run_id for r in man.collect()}
    assert set(rows) == {0, 1, 2}
    assert sorted(set(rows.values()))[-1] == "resume2"
    assert sum(1 for v in rows.values() if v == "resume2") == 2

    # aggregates match the input row count
    fc = spark.read.parquet(os.path.join(out, "agg_final", "filter_counts"))
    import pyspark.sql.functions as F

    total = fc.agg(F.sum("n_messages")).collect()[0][0]
    assert total == expected
