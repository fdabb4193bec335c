"""Multi-process launch path: jax.distributed + global-mesh SPMD.

Runs scripts/launch_multihost.py as a subprocess rig (2 processes x 2
virtual CPU devices each) and asserts the sharded program completes and
reports aggregate throughput.  This validates the multi-HOST code path
(cluster init, global mesh, cross-process collectives through Gloo) without
real multi-host hardware; on a TPU pod the same script runs one process per
host. Reference gap: doc/get_started.md:89 documents a socket swap but ships
no launcher or test.
"""

import json
import os
import subprocess
import sys
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "launch_multihost.py")


@pytest.mark.slow
def test_multiprocess_env_loop():
    # (the subprocess.run timeout below bounds the test; pytest-timeout
    # isn't in the image)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force cpu themselves
    out = subprocess.run(
        [sys.executable, SCRIPT, "--nproc", "2", "--cpu_devices_per_proc",
         "2", "--map_size", "32", "--agents_per_side", "8", "--steps", "8",
         "--calls", "1"],
        capture_output=True, text=True, timeout=400, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    rec = json.loads(lines[-1])
    assert rec["nproc"] == 2
    assert rec["n_devices"] == 4  # global device count across processes
    assert rec["agent_steps_per_s"] > 0
