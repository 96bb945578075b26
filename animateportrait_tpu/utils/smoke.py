"""Compile-free random model variables for smoke/perf runs.

`jax.eval_shape` traces a flax ``init`` WITHOUT compiling it, and numpy
fills the resulting shapes: a single trident-generator init measured
441 s of XLA CPU compile on a 1-core host vs 0.96 s for eval_shape
(2026-08-17). Norm scales and running variances get 1, means and biases
0, everything else a small normal — numerically stable, deliberately
not init-distribution faithful (real runs load converted checkpoints).
"""
from __future__ import annotations

from typing import Callable

import numpy as np

import jax


def random_variables(init_fn: Callable, seed: int = 0):
    """Variables pytree matching ``init_fn()``'s structure, no compile."""
    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)

    def fill(path, s):
        p = "/".join(str(getattr(q, "key", q)) for q in path).lower()
        if p.endswith("scale") or "/var" in p or p.endswith("var"):
            return np.ones(s.shape, s.dtype)
        if p.endswith("bias") or "/mean" in p or p.endswith("mean"):
            return np.zeros(s.shape, s.dtype)
        return (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
