"""Space-to-depth packed convolutions for lane-starved convs.

The v5e MXU processes 128 lanes per pass; a conv whose input or output
channel count is far below that wastes most of every pass. XLA's TPU
conv emitter does not rewrite the layout on its own, so early-stem and
final-output convs with 1-32 channels run at a tenth of the hardware's
throughput (measured: FlowUnet's (3,3,16,32) stride-2 conv at 224x224
moved ~230 MB for a 0.9-GFLOP conv, ~13 GB/s, profile 2026-08-17).

The rewrite is exact: block the image 2x2 into channels (phases), turn
the (k,k) kernel into a smaller kernel over blocked pixels whose
input/output channels carry the phases, run one ordinary conv, unpack.
Same FLOPs, 4x (or block^2 x) the lane utilization.

`OutConv7` in models/gan.py uses the same construction specialized to
8x8 output packing; these helpers cover the stride-2 SAME case used by
down-sampling stems.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def s2d_conv_stride2(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-2 SAME conv (torch Conv2d(k, stride=2, padding=k//2)
    semantics) computed as a dense conv on the 2x2-blocked image.

    x: (N, H, W, C) with H, W even; w: (k, k, C, F) with k ODD (the
    k=4 PatchGAN downsamplers are NOT supported here — their torch
    padding=1 needs different blocked-tap arithmetic; use a plain
    strided conv for them). Returns (N, H//2, W//2, F), bit-comparable
    to ``lax.conv_general_dilated(x, w, (2, 2), padding=[(p, p), ...])``
    with p = k//2 (torch Conv2d(k, stride=2, padding=k//2)).
    """
    N, H, W, C = x.shape
    k = w.shape[0]
    assert w.shape[1] == k and k % 2 == 1, "odd kernel expected"
    assert H % 2 == 0 and W % 2 == 0
    F = w.shape[3]
    L = k // 2  # SAME left pad
    # out[o] = sum_d ip[2o + d] w[d] with ip[u] = x[u - L]
    # blocked: 2o + d = 2(o + ka) + q with d = 2 ka + q - 0 ... map on
    # phases q of ip; out is NOT phase-packed (stride 2 consumes it).
    kb = int(np.ceil((k - 1) / 2)) + 1  # number of blocked taps
    Hb, Wb = H // 2 + kb - 1, W // 2 + kb - 1
    # padded, 2-blocked input covering blocks 0..Hb-1 (block a holds
    # ip[2a], ip[2a+1] = x[2a-L], x[2a+1-L])
    xp = jnp.pad(x, ((0, 0), (L, 2 * Hb - H - L), (L, 2 * Wb - W - L),
                     (0, 0)))
    xb = xp.reshape(N, Hb, 2, Wb, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(N, Hb, Wb, 4 * C)

    # pk[ka, kb_, (qy, qx, c), f] = w[2 ka + qy, 2 kb_ + qx, c, f]
    ka_i, q_i = np.meshgrid(np.arange(kb), np.arange(2), indexing="ij")
    d = 2 * ka_i + q_i  # (kb, 2)
    valid = d < k
    dc = np.clip(d, 0, k - 1)
    wd = w
    vj = jnp.asarray(valid, x.dtype)
    w1 = jnp.take(wd.astype(x.dtype), jnp.asarray(dc.reshape(-1)), axis=0)
    w1 = w1.reshape(kb, 2, k, C, F) * vj[:, :, None, None, None]
    w2 = jnp.take(w1, jnp.asarray(dc.reshape(-1)), axis=2)
    w2 = w2.reshape(kb, 2, kb, 2, C, F) * vj[None, None, :, :, None, None]
    # -> (ka, kb_, (qy, qx, c), f)
    pk = w2.transpose(0, 2, 1, 3, 4, 5).reshape(kb, kb, 4 * C, F)

    out = jax.lax.conv_general_dilated(
        xb, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out


def s2d_conv_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 SAME odd-kernel conv computed with BOTH input and output
    packed 2x2 (lane-starved stems: few in AND few out channels).

    x: (N, H, W, C), H, W even; w: (k, k, C, F), k odd.
    Returns (N, H, W, F) == conv_general_dilated(x, w, (1,1), SAME).
    """
    N, H, W, C = x.shape
    k = w.shape[0]
    assert k % 2 == 1 and H % 2 == 0 and W % 2 == 0
    F = w.shape[3]
    L = k // 2
    # out[2Y + p] = sum_d ip[2Y + p + d] w[d]; with ip blocked at
    # phase q: 2Y + p + d = 2 (Y + ka) + q  =>  d = 2 ka + q - p
    kb = int(np.ceil((k - 1) / 2)) + 1
    Hb, Wb = H // 2 + kb - 1, W // 2 + kb - 1
    xp = jnp.pad(x, ((0, 0), (L, 2 * Hb - H - L), (L, 2 * Wb - W - L),
                     (0, 0)))
    xb = xp.reshape(N, Hb, 2, Wb, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(N, Hb, Wb, 4 * C)

    ka_i, q_i, p_i = np.meshgrid(np.arange(kb), np.arange(2),
                                 np.arange(2), indexing="ij")
    d = 2 * ka_i + q_i - p_i  # (kb, 2, 2)
    valid = (d >= 0) & (d < k)
    dc = np.clip(d, 0, k - 1)
    vj = jnp.asarray(valid, x.dtype)
    w1 = jnp.take(w.astype(x.dtype), jnp.asarray(dc.reshape(-1)), axis=0)
    w1 = w1.reshape(kb, 2, 2, k, C, F)  # [ka, qy, py, dx, c, f]
    w1 = w1 * vj[..., None, None, None]
    w2 = jnp.take(w1, jnp.asarray(dc.reshape(-1)), axis=3)
    w2 = w2.reshape(kb, 2, 2, kb, 2, 2, C, F)
    w2 = w2 * vj[None, None, None, :, :, :, None, None]
    # [ka, qy, py, kb_, qx, px, c, f] -> (ka, kb_, (qy,qx,c), (py,px,f))
    pk = w2.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        kb, kb, 4 * C, 4 * F)

    out = jax.lax.conv_general_dilated(
        xb, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out.reshape(N, H // 2, W // 2, 2, 2, F).transpose(
        0, 1, 3, 2, 4, 5).reshape(N, H, W, F)
    return out
