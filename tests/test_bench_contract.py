"""The driver's bench contract: every HEADLINE name must resolve in the
registry (a rename here crashed BENCH_r03 — this pins it at test time,
minutes instead of a lost round)."""

from __future__ import annotations

import json
import subprocess
import sys


def test_headline_names_resolve_in_registry():
    import bench

    from big_data_validator_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench.HEADLINE names absent from registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate names"


def test_bench_emits_contract_json_line(tmp_path):
    """One timed pass at sf0.001 end-to-end: bench.py must exit 0 and print
    ONE parseable JSON line with the driver-contract fields."""
    import os

    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_PASSES="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["unit"] == "sec" and d["value"] > 0
    assert set(d["queries"]) == set(d["queries_min"])
    assert len(d["queries"]) == 47
    assert d["sf"] == 0.001
