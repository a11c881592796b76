"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without real hardware by running JAX on
CPU with 8 virtual devices (the analog of the reference's
`mpirun -np 4` unit-test strategy, libgadget/Makefile:25,145).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
