"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without real hardware by running JAX on
CPU with 8 virtual devices (the analog of the reference's
`mpirun -np 4` unit-test strategy, libgadget/Makefile:25,145).

Note: the axon sitecustomize imports jax and registers the TPU backend at
interpreter start, so env vars alone are not enough — we must also update
jax.config here (before any backend is initialized by first use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "true")
# persistent compile cache: the 8-virtual-device shard_map programs
# take minutes to compile on this 1-core host; cache them across runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                      "5")

# force CPU (override any pre-set platform) unless explicitly testing TPU
if not os.environ.get("SHENQI_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
