"""True multi-process distributed-runtime test (tools/multihost_sim.py).

Spawns separate OS processes wired by jax.distributed.initialize + Gloo,
each owning 4 virtual CPU devices, and checks the N-process sharded filter
trace against the 1-process trace. This is the closest available stand-in
for the BASELINE.md "N>=2 hosts" axis: the actual multi-host code path
(process-local shards, cross-process psum, ancestry all-gather, map
migration) executes for real.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(600)
def test_two_process_parity():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_sim.py"),
         "--nproc", "2", "--steps", "6"],
        capture_output=True, text=True, timeout=580, cwd=REPO, env=env)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "PARITY" in r.stdout
