"""Test config: force JAX onto a simulated 8-device CPU mesh.

Standard JAX trick for testing multi-chip sharding without hardware
(SURVEY.md §4): all tests run on CPU with 8 virtual devices; Pallas kernels
run in interpreter mode on CPU (selected automatically by the backends).

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and pins jax_platforms=axon, so the env var alone is not
enough — we must override the jax config itself before any backend
initializes. Set NVX_TPU_TESTS=1 to let tests see the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("NVX_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
