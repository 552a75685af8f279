"""End-to-end contract test for bench.py — the driver's per-round probe.

Two real round-ending failures motivate this gate:
- r5: the stdout JSON line grew past the driver's captured tail and
  BENCH_r05.json recorded ``"parsed": null`` (no machine-readable bench).
- r6: a broadcast-threshold flip made one headline query OOM the driver,
  killing the whole bench run.

The test runs bench.py as a SUBPROCESS (its own session lifecycle, like
the driver does) at sf0.001 with one measured pass and the sf1 section
off, then asserts the emission contract: exit 0, a parseable LAST stdout
line that stays small, every headline query present, and the sidecar
detail file in sync.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # ~250 s: full bench subprocess (fresh JVM + 112 plans)
def test_bench_emission_contract(tmp_path):
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_SF1": "0",
            "SPARK_GRAFT_BENCH_PASSES": "1",
            # keep the committed BENCH_DETAIL.json artifact untouched
            "SPARK_GRAFT_BENCH_DETAIL": str(tmp_path / "detail.json"),
        }
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    # the contract line is the LAST one, so tail-capture can never lose it
    result = json.loads(lines[-1])
    assert result["metric"] == "headline_suite_wall_sec"
    assert result["unit"] == "sec"
    assert result["value"] > 0
    assert result["sf"] == 0.001
    from bench import HEADLINE

    # the stdout "queries" map is TRUNCATED to the 10 slowest (r6 lesson:
    # the driver's capture tail is ~2,048 bytes; the full 76-entry map
    # alone outgrew it three rounds running) — the full map lives in the
    # sidecar, which is asserted complete below
    assert set(result["queries"]) <= set(HEADLINE)
    assert len(result["queries"]) == min(10, len(HEADLINE))
    assert all(t >= 0 for t in result["queries"].values())
    assert result["n_queries"] == len(HEADLINE)
    # the sf1 per-query map must NOT ride the stdout line (the r5 lesson);
    # sf1 totals are allowed when that section ran (off here)
    assert "sf1_queries" not in result
    # stdout line must fit the driver's observed ~2,048-byte capture tail
    # with headroom
    assert len(lines[-1]) < 1500
    # sidecar detail stays in sync with the emitted headline
    detail = json.load(open(result["detail_file"]))
    assert detail["value"] == result["value"]
    assert set(detail["queries"]) == set(HEADLINE)
    assert "ann_tiers" in detail
