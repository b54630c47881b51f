"""REAL multi-process distributed training smoke (tools/multihost_smoke.py):
two actual jax processes, jax.distributed.initialize, per-host shard
assembly, cross-host gradient reduction, broadcast-synced decisions.
Complements tests/test_multihost.py's mocked-topology unit tests."""
import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # 2-process jax.distributed (~1.4 min)
def test_two_process_training_step():
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "CHORE_SMOKE_PORT": "12411", "CHORE_SMOKE_TIMEOUT": "420"}
    # scrub the single-process test session's device-count flag: each rank
    # sets its own
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=500, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost smoke OK" in out.stdout
    assert "identical on every rank" in out.stdout
