"""Driver-contract tests for __graft_entry__.

`dryrun_multichip` must be green when invoked exactly the way the driver
invokes it — from a process whose default backend may be anything (the round-1
failure: it inherited a broken TPU backend). The public function re-execs a
forced-CPU subprocess, so calling it from the test process is a faithful
reproduction of the driver environment.
"""

import pytest
import os
import sys

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_dryrun_multichip_8(capfd):
    graft.dryrun_multichip(8)
    out = capfd.readouterr().out
    assert "deit loss=" in out
    assert "ssl loss=" in out


def test_dryrun_multichip_forces_cpu_even_without_env(monkeypatch, capfd):
    # Simulate the driver: no helpful env vars set.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    graft.dryrun_multichip(4)
    out = capfd.readouterr().out
    assert "deit loss=" in out
