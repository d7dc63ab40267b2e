"""Multi-host bootstrap + lockstep engine mirroring.

The reference is single-node by design (workers rendezvous on localhost,
`nanovllmx/core/worker.py:49`); the BASELINE target requires 2-host scaling.
TPU-native multi-host is multi-controller SPMD: every host runs the SAME
program over a global device mesh (`jax.distributed.initialize`), and jitted
steps execute collectively with XLA moving data over ICI/DCN.

Serving model (single controller, many executors):
* host 0 ("primary") runs the OpenAI server and owns all client state;
* every host runs an identical, deterministic engine (scheduler decisions
  depend only on config + the command stream + sampled tokens, which jit
  returns identically everywhere);
* the ONLY cross-host control channel is `broadcast_commands`: once per
  engine-loop iteration the primary broadcasts its drained command list
  (add/abort/stop) and every follower applies the same commands, keeping all
  schedulers in lockstep so every host issues identical jit calls.

This replaces the reference's gloo "CPU control plane"
(`distributed/parallel_state.py:13-14`) with one broadcast per engine
iteration instead of per-tensor metadata messages.
"""

from __future__ import annotations

import pickle

import numpy as np


def initialize(config) -> tuple[int, int]:
    """`jax.distributed.initialize` from config (no-op when single-host).
    Returns (host_id, num_hosts). Call BEFORE any jax device use."""
    import jax

    if config.num_hosts > 1:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_hosts,
            process_id=config.host_id if config.host_id >= 0 else None,
        )
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def broadcast_commands(cmds: list | None) -> list:
    """Primary broadcasts its pending engine commands; followers receive.

    LOCKSTEP CONTRACT: every host calls this exactly once per engine-loop
    iteration (it is a collective). Followers pass None and block here until
    the primary's next iteration — which is also how followers idle while
    the primary blocks on an empty command queue."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return cmds or []
    payload = pickle.dumps(cmds or []) if is_primary() else b""
    n = multihost_utils.broadcast_one_to_all(
        np.asarray([len(payload)], np.int64)
    )
    buf = np.zeros(int(n[0]), np.uint8)
    if is_primary():
        buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(buf.tobytes())
