"""Multi-chip sharding dry-run test: executes __graft_entry__.dryrun_multichip
on an 8-virtual-device CPU mesh in a subprocess (own env, so the forced
device count doesn't destabilize the single-process test run)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = ROOT
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('MULTICHIP_OK')")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                       capture_output=True, text=True, timeout=900)
    assert "MULTICHIP_OK" in r.stdout, r.stderr[-2000:]
