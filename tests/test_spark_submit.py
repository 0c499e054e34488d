"""spark-submit --py-files deployment smoke test.

The north rule requires the engine to run "via spark-submit
--py-files on a multi-executor cluster". scripts/make_pyfiles.sh +
scripts/submit_job.py are that path; this test proves the zip is the
ONLY source of the package: spark-submit runs from a scratch cwd
with PYTHONPATH scrubbed, so both the driver import and the
executor-side pandas-UDF import (the flagship's segmentation kernel)
must resolve from the --py-files payload, exactly as they would on a
cluster with no repo checkout on any worker.
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or (
    os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                 "bin", "spark-submit"))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this image")
def test_submit_pyfiles_flagship_runs_from_zip(tmp_path):
    zip_path = str(tmp_path / "pyshepseg_spark.zip")
    r = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "make_pyfiles.sh"),
         zip_path],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(zip_path) > 10_000

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    # scratch cwd: the repo checkout must NOT be importable
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "--query", "flagship", "--n-images", "2",
         "--size", "160"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    out = [ln for ln in r.stdout.splitlines()
           if ln.startswith("{")]
    assert out, r.stdout[-2000:]
    rec = json.loads(out[-1])
    assert rec["query"] == "flagship" and rec["rows"] > 0


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this image")
def test_submit_pyfiles_contract_query(tmp_path):
    """A driver-contract query (pure-JVM token_counts) through the
    same deployment path, against the generated sf0.001 tables."""
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.001 testdata absent")
    zip_path = str(tmp_path / "pyshepseg_spark.zip")
    subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "make_pyfiles.sh"),
         zip_path], check=True, capture_output=True)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "--query", "token_counts", "--sf-dir", sf_dir],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    out = [ln for ln in r.stdout.splitlines()
           if ln.startswith("{")]
    rec = json.loads(out[-1])
    assert rec["query"] == "token_counts" and rec["rows"] > 0
