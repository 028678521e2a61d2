"""Driver-contract guards: bench.py emits exactly one valid JSON line, and
the __ray_entry__ key invariants hold. A broken bench or entry file would
fail the driver's per-round BENCH/CORRECTNESS steps silently otherwise."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ray_entry_key_invariants():
    sys.path.insert(0, REPO)
    import __ray_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs), "oracle without a matching query"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_bench_emits_single_json_line():
    """Run bench.py in fetch-only mode at tiny scale in a fresh process —
    exactly what the driver does, minus the sf and rep size."""
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        GRAFT_BENCH_MODE="fetch",
        GRAFT_BENCH_REP="1",
        GRAFT_BENCH_FETCH_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"bench printed {len(lines)} lines: {lines[:3]}"
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus", "urls_per_sec"):
        assert key in payload, key
    assert payload["unit"] == "sec"
    assert payload["urls_visited"] > 0
