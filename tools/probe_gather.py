"""Probe bilinear-gather formulations on the real TPU.

Variants:
  a) current: 4x take_along_axis single-tap gathers
  b) fused-lane: pre-concat [img, img>>x, img>>y, img>>xy] to 4C lanes,
     ONE take_along_axis per sample (taps become lane slices)
  c) row-pair: concat [img, img>>y] to 2C lanes, two gathers (x0, x1)
"""
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp

N, H, W, C = 8, 256, 256, 32
DTYPE = jnp.bfloat16


def coords(key):
    ky, kx = jax.random.split(key)
    iy = jax.random.uniform(ky, (N, H * W), minval=0.0, maxval=H - 1.0)
    ix = jax.random.uniform(kx, (N, H * W), minval=0.0, maxval=W - 1.0)
    return iy, ix


def variant_a(img, iy, ix):
    """The HISTORICAL four-single-tap formulation (inlined so the
    comparison stays reproducible after ops/warp.py switched to the
    fused lane-augmented gather)."""
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = (iy - y0)[..., None].astype(img.dtype)
    wx = (ix - x0)[..., None].astype(img.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    flat = img.reshape(N, H * W, C)

    def gather(yc, xc):
        idx = jnp.clip(yc, 0, H - 1) * W + jnp.clip(xc, 0, W - 1)
        return jnp.take_along_axis(flat, idx.reshape(N, -1, 1), axis=1)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def variant_b(img, iy, ix):
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = (iy - y0)[..., None].astype(img.dtype)
    wx = (ix - x0)[..., None].astype(img.dtype)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    diag = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    aug = jnp.concatenate([img, right, down, diag], axis=-1)
    flat = aug.reshape(N, H * W, 4 * C)
    idx = (y0i * W + x0i).reshape(N, -1, 1)
    v = jnp.take_along_axis(flat, idx, axis=1)
    v00, v01, v10, v11 = (v[..., :C], v[..., C:2 * C],
                          v[..., 2 * C:3 * C], v[..., 3 * C:])
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def variant_c(img, iy, ix):
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = (iy - y0)[..., None].astype(img.dtype)
    wx = (ix - x0)[..., None].astype(img.dtype)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    aug = jnp.concatenate([img, down], axis=-1).reshape(N, H * W, 2 * C)
    i0 = (y0i * W + x0i).reshape(N, -1, 1)
    i1 = (y0i * W + x1i).reshape(N, -1, 1)
    v0 = jnp.take_along_axis(aug, i0, axis=1)
    v1 = jnp.take_along_axis(aug, i1, axis=1)
    top = v0[..., :C] * (1 - wx) + v1[..., :C] * wx
    bot = v0[..., C:] * (1 - wx) + v1[..., C:] * wx
    return top * (1 - wy) + bot * wy


def bench(fn, img, iy, ix, label, chain=8, reps=3):
    def run(img, iy, ix):
        x = img
        for _ in range(chain):
            x = fn(x, iy, ix).reshape(N, H, W, C)  # true data dependence
        return x

    f = jax.jit(run)
    out = f(img, iy, ix)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(img, iy, ix))
        best = min(best, (time.perf_counter() - t0) / chain)
    print(f"{label}: {best * 1e3:.3f} ms/warp "
          f"({N * H * W / best / 1e6:.1f} Mpix/s)")
    return out


def main():
    key = jax.random.key(0)
    img = jax.random.normal(jax.random.key(1), (N, H, W, C), DTYPE)
    iy, ix = coords(key)
    outs = {}
    for name, fn in (("a_4tap", variant_a), ("b_lane4", variant_b),
                     ("c_pair2", variant_c)):
        outs[name] = np.asarray(bench(fn, img, iy, ix, name),
                                np.float32)
    # numerics agreement (interior coords, border handling differs)
    d_ab = np.max(np.abs(outs["a_4tap"] - outs["b_lane4"]))
    print("max |a-b|:", d_ab)


if __name__ == "__main__":
    main()
