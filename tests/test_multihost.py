"""Multi-host SPMD: 2 real jax.distributed processes run the serving step with
the batch dp-sharded across them (see scripts/dryrun_multihost.py). Runs as a
subprocess so the coordinator/gloo setup cannot pollute this process's jax."""

import os
import subprocess
import sys

import pytest


def test_dryrun_multihost():
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "dryrun_multihost.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # the script sets its own device count
    r = subprocess.run([sys.executable, "-u", script], env=env,
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "dryrun_multihost OK" in r.stdout
