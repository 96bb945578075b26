"""Post-render stabilization: track one feature point, counter-shift frames.

TPU-native equivalent of `Module1/util/postalign.py`, which stabilizes a
rendered talking-head video by (1) picking the strongest Shi-Tomasi corner
in a mask region (`goodFeaturesToTrack`, maxCorners 100 / quality 0.9 /
minDistance 3 / blockSize 3, keeping p0[0:1]), (2) tracking it with
pyramidal Lucas-Kanade (winSize 15, maxLevel 2, 10 iters / eps 0.03), and
(3) shifting every frame by (first_position - current_position) with
reflect boundary (`scipy.ndimage.shift(mode='reflect')`).

Here all three stages are jittable JAX: min-eigenvalue corner response,
a scan-based iterative LK with Scharr derivatives and bilinear sampling,
and a batched bilinear reflect shift — the whole video stabilizes in one
jit instead of a per-frame Python/OpenCV loop.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def rgb_to_gray(frame: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma, matching cv2.cvtColor COLOR_RGB2GRAY."""
    return (0.299 * frame[..., 0] + 0.587 * frame[..., 1]
            + 0.114 * frame[..., 2])


def _conv2_same(img: jax.Array, kern: np.ndarray) -> jax.Array:
    """2-D valid-ish convolution with reflect-101 border (cv2 default)."""
    kh, kw = kern.shape
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    x = jnp.pad(img, pad, mode="reflect")
    return jax.lax.conv_general_dilated(
        x[None, :, :, None], jnp.asarray(kern, img.dtype)[:, :, None, None],
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0, :, :, 0]


def scharr_derivatives(gray: jax.Array) -> tuple[jax.Array, jax.Array]:
    """3x3 Scharr dx/dy (OpenCV's LK derivative filter, /32 normalized)."""
    d = np.array([-1.0, 0.0, 1.0])
    s = np.array([3.0, 10.0, 3.0]) / 32.0
    ix = _conv2_same(gray, np.outer(s, d))
    iy = _conv2_same(gray, np.outer(d, s))
    return ix, iy


def corner_response(gray: jax.Array, block: int = 3) -> jax.Array:
    """Shi-Tomasi min-eigenvalue response (cv2.goodFeaturesToTrack's
    score): lambda_min of the blockSize-summed structure tensor."""
    ix, iy = scharr_derivatives(gray)
    k = np.ones((block, block))
    sxx = _conv2_same(ix * ix, k)
    syy = _conv2_same(iy * iy, k)
    sxy = _conv2_same(ix * iy, k)
    tr = (sxx + syy) * 0.5
    det = jnp.sqrt(jnp.square((sxx - syy) * 0.5) + jnp.square(sxy))
    return tr - det


def good_feature(gray: jax.Array, mask: jax.Array | None = None
                 ) -> jax.Array:
    """(x, y) of the strongest corner inside ``mask`` (p0[0:1] of the
    reference's goodFeaturesToTrack call)."""
    resp = corner_response(gray)
    if mask is not None:
        resp = jnp.where(mask > 0, resp, -jnp.inf)
    idx = jnp.argmax(resp)
    h, w = gray.shape
    return jnp.array([idx % w, idx // w], jnp.float32)


def _pyr_down(gray: jax.Array) -> jax.Array:
    """cv2.pyrDown: 5-tap [1,4,6,4,1]/16 gaussian then 2x decimate."""
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    g = _conv2_same(_conv2_same(gray, k[None, :]), k[:, None])
    return g[::2, ::2]


def _sample_window(img: jax.Array, center: jax.Array, half: int
                   ) -> jax.Array:
    """Bilinear (2*half+1)^2 window around a float center, clamped."""
    n = 2 * half + 1
    offs = jnp.arange(n, dtype=jnp.float32) - half
    xs = center[0] + offs[None, :]
    ys = center[1] + offs[:, None]
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0b = jnp.broadcast_to(x0i, (n, n))
    y0b = jnp.broadcast_to(y0i, (n, n))
    v00 = img[y0b, x0b]
    v01 = img[y0b, x0b + 1]
    v10 = img[y0b + 1, x0b]
    v11 = img[y0b + 1, x0b + 1]
    fxb = jnp.broadcast_to(fx, (n, n))
    fyb = jnp.broadcast_to(fy, (n, n))
    return (v00 * (1 - fxb) * (1 - fyb) + v01 * fxb * (1 - fyb)
            + v10 * (1 - fxb) * fyb + v11 * fxb * fyb)


def _lk_level(prev, nxt, ix, iy, pt_prev, guess, half, iters, eps):
    """Iterative LK at one pyramid level; returns the refined flow."""
    tpl = _sample_window(prev, pt_prev, half)
    gx = _sample_window(ix, pt_prev, half)
    gy = _sample_window(iy, pt_prev, half)
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    inv = jnp.where(det != 0,
                    jnp.array([[gyy, -gxy], [-gxy, gxx]]) / det,
                    jnp.zeros((2, 2)))

    def body(flow, _):
        cur = _sample_window(nxt, pt_prev + flow, half)
        diff = cur - tpl
        b = jnp.array([jnp.sum(diff * gx), jnp.sum(diff * gy)])
        delta = -inv @ b
        small = jnp.sum(jnp.square(delta)) < eps * eps
        return jnp.where(small, flow, flow + delta), None

    flow, _ = jax.lax.scan(body, guess, None, length=iters)
    return flow


@functools.partial(jax.jit, static_argnames=("win", "levels", "iters"))
def track_point(prev_gray: jax.Array, next_gray: jax.Array,
                pt: jax.Array, win: int = 15, levels: int = 3,
                iters: int = 10, eps: float = 0.03) -> jax.Array:
    """Pyramidal LK: position of ``pt`` (x, y) in ``next_gray``.

    Mirrors cv2.calcOpticalFlowPyrLK(winSize=(15,15), maxLevel=2,
    criteria=(COUNT|EPS, 10, 0.03)) for a single point.
    """
    half = win // 2
    prevs = [prev_gray.astype(jnp.float32)]
    nexts = [next_gray.astype(jnp.float32)]
    for _ in range(levels - 1):
        prevs.append(_pyr_down(prevs[-1]))
        nexts.append(_pyr_down(nexts[-1]))
    flow = jnp.zeros(2)
    for lvl in range(levels - 1, -1, -1):
        p = prevs[lvl]
        nx = nexts[lvl]
        ix, iy = scharr_derivatives(p)
        pt_l = pt / (2 ** lvl)
        flow = _lk_level(p, nx, ix, iy, pt_l, flow, half, iters, eps)
        if lvl > 0:
            flow = flow * 2.0
    return pt + flow


def shift_reflect(img: jax.Array, shift_yx: jax.Array) -> jax.Array:
    """Sub-pixel image shift with reflect boundary, bilinear resampling.

    Equivalent of ``scipy.ndimage.shift(img, [dy, dx, 0], mode='reflect')``
    up to the interpolation order (bilinear here vs scipy's default cubic
    spline; identical for integer shifts).
    """
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32) - shift_yx[0]
    xs = jnp.arange(w, dtype=jnp.float32) - shift_yx[1]

    def fold(i, n):
        # scipy 'reflect' boundary (d c b a | a b c d | d c b a): period 2n
        j = jnp.mod(i, 2 * n)
        return jnp.where(j >= n, 2 * n - 1 - j, j).astype(jnp.int32)

    def gather_axis(coords, n):
        c0 = jnp.floor(coords).astype(jnp.int32)
        f = coords - c0
        return fold(c0, n), fold(c0 + 1, n), f

    y0, y1, fy = gather_axis(ys, h)
    x0, x1, fx = gather_axis(xs, w)
    fy = fy[:, None, None] if img.ndim == 3 else fy[:, None]
    fx = fx[None, :, None] if img.ndim == 3 else fx[None, :]
    v00 = img[y0][:, x0]
    v01 = img[y0][:, x1]
    v10 = img[y1][:, x0]
    v11 = img[y1][:, x1]
    out = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
           + v10 * fy * (1 - fx) + v11 * fy * fx)
    return out.astype(img.dtype) if jnp.issubdtype(
        img.dtype, jnp.integer) else out


def postalign_video(frames: np.ndarray,
                    mask_region: tuple[int, int] = (-50, 128)
                    ) -> np.ndarray:
    """Stabilize a rendered clip the way the reference script does.

    frames: (T, H, W, 3) uint8/float RGB. The corner is picked in
    frames[1] inside rows[mask_region[0]:], cols[mask_region[1]:]; frames
    [2:] are tracked against their predecessor and counter-shifted to the
    first tracked position. Returns the stabilized frames[2:] (the script
    writes exactly those).
    """
    frames = np.asarray(frames)
    t, h, w = frames.shape[:3]
    if t < 3:
        return frames[2:]
    grays = jax.vmap(rgb_to_gray)(jnp.asarray(frames, jnp.float32))
    mask = np.zeros((h, w), np.float32)
    mask[mask_region[0]:, mask_region[1]:] = 1.0
    pt = good_feature(grays[1], jnp.asarray(mask))

    def step(carry, nxt_gray_and_frame):
        prev_gray, cur_pt, ori = carry
        nxt_gray, frame = nxt_gray_and_frame
        new_pt = track_point(prev_gray, nxt_gray, cur_pt)
        ori = jnp.where(jnp.any(jnp.isnan(ori)), new_pt, ori)
        shifted = shift_reflect(
            frame, jnp.array([ori[1] - new_pt[1], ori[0] - new_pt[0]]))
        return (nxt_gray, new_pt, ori), shifted

    init = (grays[1], pt, jnp.full(2, jnp.nan))
    frames_j = jnp.asarray(frames, jnp.float32)
    (_, _, _), out = jax.lax.scan(step, init, (grays[2:], frames_j[2:]))
    out = np.asarray(out)
    if frames.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out
