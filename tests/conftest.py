"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Sharding-correctness tests run on a virtual 8-device CPU mesh; no TPU is
needed for the test suite. Must run before `import jax` anywhere.
"""
import os

# force CPU: the ambient environment sets JAX_PLATFORMS=axon (remote TPU
# tunnel), which would silently run every test over the wire with TPU
# numerics. jax is pre-imported with jax_platforms already resolved from the
# env, so setting os.environ is NOT enough — override via jax.config.update.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: first compiles here are ~20-40s; cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
)

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
