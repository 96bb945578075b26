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
# Persistent compilation cache: first compiles here are ~20-40s; cache them.
# NOTE: the JAX_COMPILATION_CACHE_DIR env var is IGNORED by this JAX once
# jax is imported — the cache only engages via jax.config.update (verified:
# /tmp/jax_cache stayed empty for weeks with only the env var set).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# min_compile_time 0: cache EVERY executable, including the <1s per-op
# programs that eager dispatch (flax Module.init and unjitted applies)
# compiles by the hundreds — those dominate the fast tier on this 1-core
# host (a 38s eager trident init becomes 3.6s with a warm entry cache).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Every test not marked `slow` is `fast`: `pytest -m fast` is the
    quick iteration loop, the full suite is the CI gate."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
