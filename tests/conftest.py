"""Test config: force JAX onto a simulated 8-device CPU mesh.

Standard JAX trick for testing multi-chip sharding without hardware
(SURVEY.md §4): all tests run on CPU with 8 virtual devices; Pallas kernels
run in interpreter mode on CPU (selected automatically by the backends).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
