"""Multi-host (DCN) init path under test (VERDICT r3 next-6).

Runs scripts/multihost_smoke.py — two local processes, each with 2
virtual CPU devices, `jax.distributed.initialize` into one 4-device
'data' mesh, real HostPipeline feeding per-process local shards, 3 jitted
DP train steps, replicated params asserted equal across processes — as a
subprocess fleet, so `parallel/mesh.py::init_distributed` and the
pipeline's multi-process branch can't rot between rounds.

Marked `multihost` (select with `pytest -m multihost`); skipped when the
environment can't host a coordinator (no bindable localhost port).
"""

import os
import socket
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                      "multihost_smoke.py")


def _can_bind_localhost() -> bool:
    try:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
        return True
    except OSError:
        return False


@pytest.mark.multihost
def test_two_process_distributed_smoke():
    if not _can_bind_localhost():
        pytest.skip("cannot bind a localhost port for the coordinator")
    env = dict(os.environ)
    # the children set their own JAX_PLATFORMS/XLA_FLAGS; scrub this
    # process's forced-8-device flag so it doesn't leak into the parent
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, SCRIPT], capture_output=True, text=True,
        timeout=840, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST SMOKE: OK" in out.stdout
