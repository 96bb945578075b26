"""Probe a Pallas single-pass fused InstanceNorm against XLA's on TPU.

XLA lowers InstanceNorm as reduce(mean/var) + normalize: the input is
read twice from HBM (plus one write) = 3 tensor passes. A Pallas kernel
that holds one (H, W, ctile) block in VMEM computes the statistics and
normalizes in a single read+write = 2 passes -> theoretical 1.5x on an
HBM-bound op. PERF.md names the IN two-pass reductions as part of the
generator's remaining gap; this probe measures whether the Pallas
formulation actually wins at the generator's shapes before any
integration (ledger discipline: measure, then integrate or record the
loss).

Usage: python tools/probe_instnorm.py [--platform tpu|cpu|keep]
"""
from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5


def xla_instnorm(x):
    xs = x.astype(jnp.float32)
    mean = jnp.mean(xs, axis=(1, 2), keepdims=True)
    var = jnp.var(xs, axis=(1, 2), keepdims=True)
    return ((xs - mean) * jax.lax.rsqrt(var + EPS)).astype(x.dtype)


def xla_instnorm_relu(x):
    return jax.nn.relu(xla_instnorm(x))


def _in_kernel(x_ref, o_ref, *, relu: bool):
    x = x_ref[...].astype(jnp.float32)              # (1, H, W, ct)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + EPS)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("ctile", "relu", "interpret"))
def pallas_instnorm(x, ctile: int = 128, relu: bool = False,
                    interpret: bool = False):
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    ctile = min(ctile, c)
    assert c % ctile == 0
    grid = (n, c // ctile)
    return pl.pallas_call(
        functools.partial(_in_kernel, relu=relu),
        grid=grid,
        in_specs=[pl.BlockSpec((1, h, w, ctile),
                               lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((1, h, w, ctile),
                               lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def _time(fn, x, iters=50, chain=20):
    """Per-application time with ``chain`` applications inside ONE jit
    (a single dispatch), so remote-tunnel dispatch latency (~1 ms RTT)
    doesn't swamp a ~100 us op; each link reads the previous output."""

    @jax.jit
    def chained(v):
        for _ in range(chain):
            v = fn(v)
        return v

    y = chained(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = chained(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / (iters * chain)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="keep")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)
    if args.platform != "keep":
        jax.config.update(
            "jax_platforms",
            {"tpu": "axon"}.get(args.platform, args.platform))
    print("devices:", jax.devices(), flush=True)

    # the generator's IN shapes (frame_batch 8) where a full (H, W,
    # ctile) block fits VMEM: the 64^2 ResNet-bottleneck chain (most IN
    # instances: 9 blocks x 2 + merge) and the 128^2 mid scale. The
    # 256^2 stems do NOT fit — channels pad to 128 lanes, making the
    # (1,256,256,32) window 32 MB x2 buffering x in/out > 128 MB VMEM
    # (first probe attempt OOMed exactly there) — XLA keeps those.
    # (8,128,128,64) also OOMs scoped VMEM (8 MB lane-padded temps vs
    # the 16 MB kernel stack) — only the 64^2 chain qualifies.
    shapes = [(8, 64, 64, 256), (8, 64, 64, 512)]
    for shape in shapes:
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
        ref = np.asarray(xla_instnorm(x))
        got = np.asarray(pallas_instnorm(x))
        err = float(np.abs(ref - got).max())
        bytes_rw = 2 * x.size * 4
        tx = _time(jax.jit(xla_instnorm), x, args.iters)
        tp = _time(lambda v: pallas_instnorm(v), x, args.iters)
        txr = _time(jax.jit(xla_instnorm_relu), x, args.iters)
        tpr = _time(lambda v: pallas_instnorm(v, relu=True), x,
                    args.iters)
        print(f"{shape}: max|d|={err:.2e}  "
              f"XLA {tx * 1e6:7.1f}us ({bytes_rw / tx / 1e9:6.1f} GB/s eff)  "
              f"pallas {tp * 1e6:7.1f}us ({bytes_rw / tp / 1e9:6.1f} GB/s)  "
              f"speedup x{tx / tp:.2f} | +relu XLA {txr * 1e6:7.1f}us "
              f"pallas {tpr * 1e6:7.1f}us x{txr / tpr:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
