"""Bench-harness smoke: the driver runs bench.py unattended once per round
(round 2's run crashed rc=1 and cost the round its perf evidence) — so the
harness contract (rc 0, one parseable JSON line with the required keys) is
guarded here at sf0.001."""

import pytest

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env_extra):
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


@pytest.mark.slow
def test_bench_py_contract():
    d = _run(
        [sys.executable, "bench.py"],
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_BENCH_REPEATS": "1",
        },
    )
    assert d["unit"] == "sec" and d["value"] > 0
    assert set(d["queries"]) >= {"flagship_snowflake", "pricing_summary"}
    assert d["repeats"] == 1 and d["timing"] == "min_of_repeats"


@pytest.mark.slow
def test_bench_training_contract():
    d = _run(
        [sys.executable, "tools/bench_training.py"],
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_BENCH_REPEATS": "1",
        },
    )
    assert d["metric"] == "training_ops_total" and d["value"] > 0
    assert "minhash_lsh_dedup" in d["queries"]


def test_parse_sf_never_raises():
    """An SPARK_GRAFT_SF_DIR like '.../sfdata' (contains 'sf' but no
    number) must degrade to sf=-1.0, not crash the unattended bench run."""
    import bench

    assert bench.parse_sf("/root/testdata/sf0.1") == 0.1
    assert bench.parse_sf("/root/testdata/sf0.001/") == 0.001
    assert bench.parse_sf("/data/sfdata") == -1.0
    assert bench.parse_sf("/plain/dir") == -1.0

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import bench_training

        assert bench_training.parse_sf("/data/sfdata") == -1.0
        assert bench_training.parse_sf("/root/testdata/sf0.01") == 0.01
    finally:
        sys.path.pop(0)
