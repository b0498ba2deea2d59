"""Driver-contract smoke tests for __graft_entry__.py."""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

pytestmark = pytest.mark.slow  # subprocess respawn + dryrun compile (smoke tier: -m 'not slow')


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    warped, flow = jax.jit(fn)(*args)
    assert warped.shape == (1, 1, 40, 40, 40)
    assert flow.shape == (1, 3, 40, 40, 40)
    assert np.isfinite(np.asarray(warped)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)


def test_dryrun_self_provisions_on_1_device_host():
    """Simulate the driver's context: a host whose initialized backend has a
    single device (like the 1-chip axon TPU host). ``dryrun_multichip(4)``
    must self-provision a virtual mesh (round-1 failure MULTICHIP_r01)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=1"])
    code = (
        "import jax; "
        "assert len(jax.devices()) == 1, jax.devices(); "  # backend now initialized
        "import __graft_entry__ as g; "
        "g.dryrun_multichip(4)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
