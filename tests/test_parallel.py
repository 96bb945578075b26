"""Pipeline-parallelism schedule vs its sequential equivalent (CPU mesh).

The GPipe microbatch pipeline (`animateportrait_tpu/parallel.py`) must be
numerically identical to applying the stages in sequence — validated here
on the virtual 8-device CPU mesh, no TPU needed (SURVEY.md §4: multi-device
tests run on CPU via device-count overrides).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from animateportrait_tpu.models.gan import ResnetBlock
from animateportrait_tpu.parallel import (
    _seq_apply, gpipe_apply, resnet_stage_fn, stack_stage_params)


def _stacked_blocks(key, n_stages, blocks_per_stage, dim):
    """Init n_stages*blocks_per_stage ResnetBlocks, stacked (P, bps, ...)."""
    block = ResnetBlock(dim=dim)
    x0 = jnp.zeros((1, 8, 8, dim))
    keys = jax.random.split(key, n_stages * blocks_per_stage)
    params = [block.init(k, x0) for k in keys]
    per_stage = [
        stack_stage_params(params[s * blocks_per_stage:
                                  (s + 1) * blocks_per_stage])
        for s in range(n_stages)
    ]
    return block, stack_stage_params(per_stage)


@pytest.mark.parametrize("n_stages,microbatches", [(4, 4), (4, 8), (8, 8)])
def test_gpipe_matches_sequential(n_stages, microbatches):
    devices = jax.devices()[:n_stages]
    assert len(devices) == n_stages
    mesh = Mesh(np.array(devices), ("pipe",))

    dim, bps = 8, 2
    block, stacked = _stacked_blocks(jax.random.key(0), n_stages, bps, dim)
    block_apply = lambda p, x: block.apply(p, x)  # noqa: E731

    x = jax.random.normal(jax.random.key(1), (microbatches * 2, 8, 8, dim))
    want = _seq_apply(block_apply, stacked, x)
    got = gpipe_apply(resnet_stage_fn(block_apply), stacked, x, mesh,
                      num_microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gpipe_single_microbatch_per_stage_output_replicated():
    """Every device along the axis must hold the same (full) output."""
    devices = jax.devices()[:2]
    mesh = Mesh(np.array(devices), ("pipe",))
    dim = 4
    block, stacked = _stacked_blocks(jax.random.key(2), 2, 1, dim)
    block_apply = lambda p, x: block.apply(p, x)  # noqa: E731
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, dim))
    got = gpipe_apply(resnet_stage_fn(block_apply), stacked, x, mesh)
    want = _seq_apply(block_apply, stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # output sharding: fully replicated (addressable on each pipe device)
    assert got.sharding.is_fully_replicated


def test_gpipe_rejects_indivisible_batch():
    devices = jax.devices()[:2]
    mesh = Mesh(np.array(devices), ("pipe",))
    block, stacked = _stacked_blocks(jax.random.key(4), 2, 1, 4)
    x = jnp.zeros((3, 8, 8, 4))
    with pytest.raises(ValueError, match="not divisible"):
        gpipe_apply(resnet_stage_fn(lambda p, h: block.apply(p, h)),
                    stacked, x, mesh)
