"""End-to-end smoke of the driver's bench harness (bench.py).

bench.py is the artifact the driver runs each round; a regression there
costs a full round, so CI drives the whole harness once at toy scale:
48 images, sf0.001 queries, scaling legs skipped, artifacts redirected
to a tmp dir (SPARK_GRAFT_BENCH_DIR) so the real BENCH/BASELINE.md and
cached tile tables are never touched.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree_state(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def test_bench_harness_end_to_end(tmp_path):
    real_bench = os.path.join(REPO, "BENCH")
    before = _tree_state(real_bench)
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_BENCH_DIR=str(tmp_path / "bench_out"),
        SPARK_GRAFT_BENCH_IMAGES="48",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_WARM_SF_DIR="",  # skip the plan-compile warm pass
        SPARK_GRAFT_SKIP_SCALING="1",
        SPARK_GRAFT_HEADLINE_CORES="8",
        SPARK_GRAFT_CPUS="8",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = next(
        ln for ln in reversed(out.stdout.strip().splitlines()) if ln.startswith("{")
    )
    d = json.loads(line)
    assert d["metric"].startswith("tiles/sec")
    assert d["value"] > 0 and d["tiles"] > 0
    assert d["scaling_efficiency"] is None  # legs skipped in smoke mode
    qs = d["queries"]
    import __spark_entry__ as E

    assert set(qs) == set(E.queries()), "bench must time every registry query"
    assert all(v > 0 for v in qs.values())
    assert (tmp_path / "bench_out" / "BASELINE.md").exists()
    # the REAL artifact tree (repo BENCH/) was not touched by the
    # redirected run — compare actual mtimes/sizes before vs after
    assert _tree_state(real_bench) == before
