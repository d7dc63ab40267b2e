"""Multi-host bootstrap: 2-process CPU simulation (SURVEY §2.2 backend row).

Spawns two processes that rendezvous via jax.distributed, build a (pp=2,
tp=2) mesh SPANNING both (2 local CPU devices each), and run the lockstep
mirror-engine: host 0 serves requests, host 1 follows the broadcast command
stream. Greedy tokens must match a single-process run of the same mesh.
"""

import json
import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _run(args, timeout):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, WORKER, *args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


def test_two_host_simulation_matches_single():
    port = "19377"
    ref = _run(["0", port, "--single"], 120)
    ref_out, _ = ref.communicate(timeout=240)
    assert ref.returncode == 0, ref_out[-2000:]
    ref_tokens = json.loads(ref_out.split("TOKENS:")[1].splitlines()[0])

    p1 = _run(["1", port], 240)
    p0 = _run(["0", port], 240)
    out0, _ = p0.communicate(timeout=240)
    out1, _ = p1.communicate(timeout=60)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    assert "FOLLOWER-DONE" in out1, out1[-2000:]
    mh_tokens = json.loads(out0.split("TOKENS:")[1].splitlines()[0])

    assert mh_tokens == ref_tokens
    assert all(len(t) == 5 for t in mh_tokens)
