"""Driver contract for bench.py: EXACTLY one JSON line on stdout, always.

Round 3 lost its perf number because bench.py could burn the driver's whole
budget without printing anything (VERDICT r3 item 1). These tests pin the
redesigned failure discipline on CPU:

  * smoke path (BENCH_SMOKE=1): tiny models, real child subprocesses, one
    success JSON line with value/vs_baseline/mfu/runs fields;
  * dead-backend path: heartbeat deadline forced to ~0 => fail fast with a
    structured ``"value": null`` + ``"error"`` line, never rc=124 silence.

Reference protocol being mirrored: experiments/complexity.py:40-56 (always
produces a table or dies fast).
"""

import pytest
import json
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout):
    env = dict(os.environ)
    env.update(env_extra)
    # children must not inherit the conftest's 8-device CPU partitioning
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


def _json_lines(stdout):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_dead_backend_fails_fast_with_json():
    proc = _run(
        {"BENCH_SMOKE": "1", "BENCH_BUDGET_S": "60",
         "BENCH_FIRST_TIMEOUT_S": "0.5"},
        timeout=120,
    )
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1, proc.stdout
    (line,) = lines
    assert line["metric"] == "hybrid_vith14_images_per_sec_per_chip"
    assert line["value"] is None
    assert line["vs_baseline"] is None
    assert "error" in line and line["error"]
    assert proc.returncode == 1


def test_smoke_success_emits_full_schema():
    proc = _run(
        {"BENCH_SMOKE": "1", "BENCH_BUDGET_S": "240"},
        timeout=300,
    )
    lines = _json_lines(proc.stdout)
    assert len(lines) == 1, proc.stdout
    (line,) = lines
    assert proc.returncode == 0, proc.stdout + proc.stderr[-800:]
    assert line["value"] is not None and line["value"] > 0
    assert line["vs_baseline"] is not None and line["vs_baseline"] > 0
    assert set(line["mfu"]) == {"hybrid", "standard"}
    runs = line["runs"]
    assert runs["hybrid_img_per_s"] and runs["standard_img_per_s"]
    assert line["unit"] == "images/sec"
