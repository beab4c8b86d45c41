"""Contract tests for bench.py's driver-facing behavior.

The driver runs `python bench.py` at round end and records {rc, stdout}; the
round-3 failure mode (BENCH_r03.json rc=1) and the round-4 outage mode (a
tunnel that BLOCKS backend init forever) must both degrade to ONE parseable
JSON line with rc=0. These tests cover the no-chip paths only; the measured
path needs the real TPU (scripts/RUNBOOK_r5.md)."""

import json
import subprocess
import sys

import pytest


def _bench():
    sys.path.insert(0, ".")
    import bench

    return bench


def test_unreachable_json_schema():
    bench = _bench()
    out = bench._unreachable_json("test reason")
    line = json.dumps(out)
    parsed = json.loads(line)
    # the driver's parser requires these four
    assert parsed["metric"] == "guided_denoise_steps_per_sec_per_chip"
    assert parsed["value"] == 0.0
    assert parsed["unit"] == "steps/s"
    assert parsed["vs_baseline"] == 0.0
    assert parsed["chip_unreachable"] is True
    assert "test reason" in parsed["error"]


def test_preflight_timeout_path():
    bench = _bench()
    # a 1s budget is far below any backend init; exercises the SIGTERM +
    # "blocked" branch without waiting out a real outage probe
    err = bench._chip_preflight(timeout_s=1.0)
    assert err is None or "blocked" in err or "failed" in err


@pytest.mark.slow
def test_cli_emits_one_json_line_when_unreachable():
    # force the unreachable path: preflight against a python that cannot
    # import jax quickly (1s). rc must be 0 and stdout's last line JSON.
    src = (
        "import bench, json\n"
        "err = bench._chip_preflight(timeout_s=1.0)\n"
        "print(json.dumps(bench._unreachable_json(err or 'forced')))\n"
    )
    r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                       text=True, timeout=120, cwd=".")
    assert r.returncode == 0, r.stderr[-500:]
    parsed = json.loads(r.stdout.strip().splitlines()[-1])
    assert parsed["value"] == 0.0 and parsed["chip_unreachable"]
