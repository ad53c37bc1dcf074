"""Multi-process (multi-host) data parallelism: 2 coordinated processes x 4
virtual CPU devices run jitted DP train steps over a global mesh
(scripts/multihost_smoke.py). Validates what the single-process dryrun can't:
jax.distributed init, cross-process collectives, global batch placement."""
import os
import subprocess
import sys


import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier (--runslow)


def test_multihost_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "multihost_smoke.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run([sys.executable, script], env=env, timeout=570,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "multihost smoke OK" in out.stdout
