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

# Measure the SHIPPED kernel, not a local copy — the probe exists to
# produce PERF.md numbers for what ops/pallas_instnorm.py dispatches.
from animateportrait_tpu.ops.pallas_instnorm import (  # noqa: E402
    _pallas_forward, _xla_instance_norm)

EPS = 1e-5


def xla_instnorm(x):
    return _xla_instance_norm(x, EPS, relu=False)


def xla_instnorm_relu(x):
    return _xla_instance_norm(x, EPS, relu=True)


@functools.partial(jax.jit, static_argnames=("relu",))
def pallas_instnorm(x, relu: bool = False):
    # CPU backend only supports pallas in interpret mode (correctness
    # smoke only — timings there are meaningless)
    interpret = jax.devices()[0].platform == "cpu"
    return _pallas_forward(x, EPS, relu, interpret=interpret)


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
