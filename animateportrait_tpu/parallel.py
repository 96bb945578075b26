"""Multi-chip parallelism helpers beyond plain DP sharding.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(SURVEY.md §2.14); data parallelism here is just a batch-dim
`NamedSharding` + jit (GSPMD inserts the all-reduces) and needs no user
code. This module adds the schedules that DO need explicit user-level
collectives on TPU:

- ``gpipe_apply``: GPipe-style microbatch pipeline parallelism over a mesh
  axis, built on ``jax.shard_map`` + ``lax.ppermute`` so activations hop
  stage-to-stage over ICI neighbor links instead of all-gathers. Used to
  pipeline the trident generator's ResNet bottleneck (the deepest
  sequential chain in the model family) across chips when one chip's HBM
  or latency budget is exceeded.

All schedules are validated against their sequential equivalents on a
virtual CPU mesh (tests/test_parallel.py) — no real multi-chip hardware
is required for correctness tests.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(stage_params: list[Any]) -> Any:
    """Stack per-stage parameter pytrees along a new leading stage axis.

    All stages must share one structure (same layer shapes); the result's
    leaves have shape ``(n_stages, *leaf.shape)`` and are what
    ``gpipe_apply`` shards over the pipeline mesh axis.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_params)


def gpipe_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    axis_name: str = "pipe",
    num_microbatches: int | None = None,
) -> jax.Array:
    """Run a ``P``-stage pipeline over mesh axis ``axis_name``.

    GPipe forward schedule: the batch is split into ``M`` microbatches;
    stage ``s`` (device ``s`` along the axis) applies
    ``stage_fn(stacked_params[s], h)`` and passes its activation to stage
    ``s+1`` with a neighbor ``ppermute``. The pipe drains after
    ``P + M - 1`` ticks; steady-state bubble fraction is
    ``(P-1)/(P+M-1)``, so pick ``M >= P`` (default ``M = P``).

    Requirements: every stage maps ``(microbatch activation) -> same
    shape/dtype`` (true for the generator's ResNet bottleneck — constant
    ``ngf*4`` channel width); ``x.shape[0]`` divisible by ``M``;
    ``stacked_params`` leaves carry the stage axis first (see
    ``stack_stage_params``).

    Returns the pipelined output with ``x``'s shape, numerically equal to
    applying the stages in sequence. Replicated on every device along
    ``axis_name`` (the final ``psum`` broadcasts from the last stage).
    """
    n_stages = mesh.shape[axis_name]
    m = num_microbatches or n_stages
    if x.shape[0] % m:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by {m} microbatches")
    mbs = x.reshape(m, x.shape[0] // m, *x.shape[1:])
    perm = [(d, d + 1) for d in range(n_stages - 1)]

    def _body(params, mbs):
        # params leaves arrive as (1, ...) — this device's stage slice.
        pl = jax.tree_util.tree_map(lambda a: a[0], params)
        i = lax.axis_index(axis_name)
        buf = jnp.zeros_like(mbs[0])
        outs = jnp.zeros_like(mbs)

        def tick(t, carry):
            buf, outs = carry
            # stage 0 injects microbatch t (ghost re-injections for
            # t >= m can never reach the last stage before the loop ends)
            inp = jnp.where(i == 0, mbs[jnp.clip(t, 0, m - 1)], buf)
            y = stage_fn(pl, inp)
            # the last stage emits microbatch t-(P-1) at tick t
            oidx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            write = jnp.logical_and(i == n_stages - 1, t >= n_stages - 1)
            outs = outs.at[oidx].set(jnp.where(write, y, outs[oidx]))
            buf = lax.ppermute(y, axis_name, perm) if perm else y
            return buf, outs

        _, outs = lax.fori_loop(0, n_stages + m - 1, tick, (buf, outs))
        # broadcast the last stage's outputs to every device
        return lax.psum(
            jnp.where(i == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis_name)

    in_specs = (jax.tree_util.tree_map(lambda _: P(axis_name),
                                       stacked_params), P())
    fn = jax.shard_map(_body, mesh=mesh, in_specs=in_specs, out_specs=P(),
                       check_vma=False)
    outs = fn(stacked_params, mbs)
    return outs.reshape(x.shape)


def resnet_stage_fn(block_apply: Callable[[Any, jax.Array], jax.Array]
                    ) -> Callable[[Any, jax.Array], jax.Array]:
    """Stage = a scan over this stage's stack of identical residual blocks.

    ``block_apply(params, x)`` applies ONE block; the returned stage_fn
    takes params whose leaves carry a leading blocks-per-stage axis.
    """

    def stage(params, x):
        def step(h, p):
            return block_apply(p, h), None

        y, _ = lax.scan(step, x, params)
        return y

    return stage


@functools.partial(jax.jit, static_argnums=(0,))
def _seq_apply(block_apply, stacked, x):
    """Sequential reference: apply all blocks in order (test helper)."""

    def step(h, p):
        return block_apply(p, h), None

    flat = jax.tree_util.tree_map(
        lambda a: a.reshape(-1, *a.shape[2:]), stacked)
    y, _ = lax.scan(step, x, flat)
    return y
