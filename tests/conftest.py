"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests execute on a virtual CPU mesh (the strategy the
reference cannot offer — it needs real MPI ranks; see SURVEY.md §4).
Environment must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: the transport engine compiles are the
# dominant test cost; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/skirt9_tpu_jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
