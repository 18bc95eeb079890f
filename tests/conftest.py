"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests execute on a virtual CPU mesh (the strategy the
reference cannot offer — it needs real MPI ranks; see SURVEY.md §4).

The container's sitecustomize force-registers the axon TPU plugin at
interpreter start and overrides JAX_PLATFORMS, so plain env vars are not
enough: we must set the platform through jax.config before any backend
initializes.
"""

import os

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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
