"""The north rule's literal submission mode: `spark-submit --py-files
mapalgebra_spark.zip runner.py` runs the checkpoint-resumable flagship
job end-to-end in a fresh JVM, and a second submission resumes from the
committed snapshots instead of recomputing."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)


def _package_zip(tmp_path) -> str:
    zpath = str(tmp_path / "mapalgebra_spark.zip")
    pkg = os.path.join(REPO, "mapalgebra_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath

def _submit(zpath, out, job_id, extra=()):
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    return subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "runner.py"),
            "--out", out, "--job-id", job_id, "--n-images", "4",
            *extra,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(os.path.dirname(out)),
    )


def test_spark_submit_pyfiles_end_to_end_and_resume(tmp_path):
    zpath = _package_zip(tmp_path)
    out = str(tmp_path / "job")
    r1 = _submit(zpath, out, "sub1")
    assert r1.returncode == 0, r1.stderr[-3000:]
    # all four stages committed snapshots + lineage/metrics landed
    snaps = os.path.join(out, "snapshots", "sub1")
    assert sorted(os.listdir(snaps)) == ["focal", "images", "tiles", "zonal"], (
        os.listdir(out)
    )
    assert os.path.isdir(os.path.join(out, "lineage"))
    assert os.path.isdir(os.path.join(out, "metrics"))

    # second submission must RESUME: no new snapshot directories
    before = {
        st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)
    }
    r2 = _submit(zpath, out, "sub1")
    assert r2.returncode == 0, r2.stderr[-3000:]
    after = {
        st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)
    }
    assert after == before, "resume re-ran a committed stage"
