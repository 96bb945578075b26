"""Time the full Module2 GAN train step (G + 5 Ds + frozen nets + TPS /
flow warps + Adam) on the current accelerator, single chip, 256 px.

Uses the tunnel-safe methodology from bench.py: seed-varied inputs,
scalar readback, RTT-baseline subtraction.
"""
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from animateportrait_tpu.utils.observe import enable_compile_cache

enable_compile_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR"))

from animateportrait_tpu.train.module2 import (
    Module2Config, build_train_step, init_frozen_random, init_state,
    make_example_batch)

BATCH = int(os.environ.get("TB_BATCH", "1"))
SIZE = int(os.environ.get("TB_SIZE", "256"))


def main():
    cfg = Module2Config(crop_size=SIZE, output_nc=1,
                        lambda_geom_lipline=50.0)
    rng = jax.random.key(0)
    batch = make_example_batch(cfg, batch_size=BATCH)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        state = init_state(cfg, rng, batch)
        frozen = init_frozen_random(rng, cfg.crop_size)
    # Move EVERYTHING to the accelerator once, outside the timed loop —
    # host-resident frozen nets / batch would otherwise re-upload through
    # the tunnel every step (measured: 99% device idle, 4.1 s/step).
    dev = jax.devices()[0]
    state, frozen, batch = jax.device_put((state, frozen, batch), dev)
    step = build_train_step(cfg)

    def run(state, batch, frozen, seed):
        b = dict(batch)
        b["real_A"] = b["real_A"] + seed.astype(b["real_A"].dtype)
        new_state, logs = step(state, b, frozen,
                               jax.random.fold_in(rng, 1))
        leaves = [jnp.sum(x.astype(jnp.float32)) for x in
                  jax.tree_util.tree_leaves(logs)]
        return new_state, sum(leaves)

    f = jax.jit(run)
    t0 = time.perf_counter()
    state2, s = f(state, batch, frozen, jnp.float32(0.0))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
          f"loss-sum {float(s):.3f}", flush=True)

    base_fn = jax.jit(lambda x, seed: jnp.sum(x + seed))
    x0 = jnp.zeros((8,))
    float(base_fn(x0, jnp.float32(0.0)))
    base = min(
        _timed(lambda: float(base_fn(x0, jnp.float32(i * 1e-4))))
        for i in range(1, 4))

    times = []
    cur = state2
    for i in range(1, 5):
        t0 = time.perf_counter()
        cur, s = f(cur, batch, frozen, jnp.float32(i * 1e-4))
        float(s)
        times.append(time.perf_counter() - t0)
    best = min(times) - base
    print(f"train step: {best * 1e3:.1f} ms/step "
          f"({BATCH / best:.2f} items/s) at {SIZE}px batch {BATCH}; "
          f"raw {[f'{t:.3f}' for t in times]}, rtt {base * 1e3:.0f} ms")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
