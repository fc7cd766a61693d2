"""Bench-harness smoke: the driver runs bench.py unattended once per round
(round 2's run crashed rc=1 and cost the round its perf evidence) — so the
harness contract (rc 0, one parseable JSON line with the required keys) is
guarded here at sf0.001."""

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
