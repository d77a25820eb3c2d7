"""ray-job-submit CLI: synth + resumable rollup contract (subprocess-level)."""

import json
import os
import subprocess
import sys


def _run(args, cwd="/root/repo"):
    r = subprocess.run(
        [sys.executable, "-m", "scala_timeseries_lib_ray.cli", *args],
        capture_output=True, text=True, cwd=cwd, timeout=240,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return [json.loads(line) for line in r.stdout.strip().splitlines() if line.startswith("{")]


def test_cli_rollup_resume(tmp_path):
    tokens = str(tmp_path / "tokens")
    tiers = str(tmp_path / "tiers")
    out = _run(["synth", "--out", tokens, "--docs", "8000"])
    assert out[0]["docs"] > 0

    first = _run(["rollup", "--input", tokens, "--out", tiers])
    by_tier = {d["tier"]: d for d in first if "tier" in d}
    assert set(by_tier) == {"tier_1m", "tier_1h", "tier_1d"}
    assert not any(d["skipped"] for d in by_tier.values())

    second = _run(["rollup", "--input", tokens, "--out", tiers])
    by_tier2 = {d["tier"]: d for d in second if "tier" in d}
    assert all(d["skipped"] for d in by_tier2.values())
    for t in by_tier:
        assert by_tier2[t]["value_checksum"] == by_tier[t]["value_checksum"]
