"""68-point face-landmark geometry: normalization, mouth/eye edits, areas, ICP.

Semantics parity (reference file:line):
- ``norm_input_face``            Module1/util/utils.py:348-359
- ``close_input_face_mouth``     Module1/util/utils.py:329-346
- ``add_naive_eye``              Module1/util/utils.py:361-393
- polygon areas                  Module1/util/geo_math.py
- ICP / best-fit transform       Module1/util/icp.py:5-113

TPU-first notes: everything is vectorized over frames; the blink insertion's
stochastic timestamps are drawn host-side with an explicit numpy Generator
(the reference uses global np.random state) and applied as one vectorized
interpolation, so the per-frame Python loop disappears.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# landmark index groups (68-pt iBUG convention)
LEFT_EYE_UP, LEFT_EYE_DOWN = (37, 38), (41, 40)
RIGHT_EYE_UP, RIGHT_EYE_DOWN = (43, 44), (47, 46)
EYE_PAIRS = ((37, 41), (38, 40), (43, 47), (44, 46))


def norm_input_face(
    shape_3d: np.ndarray, std_face: np.ndarray
) -> tuple[np.ndarray, float, np.ndarray]:
    """Normalize a 68x3 face: jaw-width scale 1.6, jaw-midpoint shift, std z.

    Reference: Module1/util/utils.py:348-359. Returns (shape, scale, shift)
    where shift/scale invert the transform for rendering.
    """
    shape_3d = np.array(shape_3d, dtype=np.float64)
    scale = 1.6 / (shape_3d[0, 0] - shape_3d[16, 0])
    shift = -0.5 * (shape_3d[0, 0:2] + shape_3d[16, 0:2])
    shape_3d[:, 0:2] = (shape_3d[:, 0:2] + shift) * scale
    shape_3d[:, -1] = std_face[:, -1] * 0.1
    shape_3d[:, 0:2] = -shape_3d[:, 0:2]
    return shape_3d, scale, shift


def close_input_face_mouth(
    shape_3d: np.ndarray, p1: float = 0.7, p2: float = 0.5
) -> np.ndarray:
    """Pull outer/inner lip landmarks toward their closed-mouth midline.

    Reference: Module1/util/utils.py:329-346.
    """
    s = np.array(shape_3d, dtype=np.float64).reshape(1, 68, 3)
    idx_outer_low = [58, 57, 56]          # range(59-1, 56-1, -1)
    idx_inner_low = [67, 66, 65]          # range(68-1, 65-1, -1)
    mean_in = 0.5 * (s[:, 61:64] + s[:, idx_inner_low])
    s[:, 50:53] -= (s[:, 61:64] - mean_in) * p1
    s[:, idx_outer_low] -= (s[:, idx_inner_low] - mean_in) * p1
    s[:, 49] -= (s[:, 61] - mean_in[:, 0]) * p2
    s[:, 53] -= (s[:, 63] - mean_in[:, -1]) * p2
    s[:, 59] -= (s[:, 67] - mean_in[:, 0]) * p2
    s[:, 55] -= (s[:, 65] - mean_in[:, -1]) * p2
    s[:, 61:64] -= (s[:, 61:64] - mean_in) * p1
    s[:, idx_inner_low] -= (s[:, idx_inner_low] - mean_in) * p1
    return s.reshape(68, 3)


def blink_timestamps(length: int, rng: np.random.Generator,
                     k2: int = 15) -> list[int]:
    """Blink schedule: first at t=30, then every 60 + U[30, 90) frames
    (Module1/util/utils.py:372-379), drawn with an explicit Generator."""
    # the reference appends t=30 unconditionally (utils.py:372) and would
    # index out of bounds on clips shorter than ~31+K2 frames; guard it
    stamps = [30] if 30 < length - 1 - k2 else []
    t = 30
    while t < length - 1 - k2:
        t += 60 + int(rng.integers(30, 90))
        if t < length - 1 - k2:
            stamps.append(t)
    return stamps


def add_naive_eye(fl: np.ndarray, rng: np.random.Generator | None = None
                  ) -> np.ndarray:
    """Tighten eyelids slightly and insert interpolated blinks.

    Vectorized re-design of Module1/util/utils.py:361-393: the per-frame
    eyelid tightening becomes one broadcast mix, and each blink is a
    triangular interpolation window applied with fancy indexing.
    """
    fl = np.array(fl, dtype=np.float64)  # (T, 68, 2or3)
    if rng is None:
        rng = np.random.default_rng(0)
    r = 0.95
    for up, down in EYE_PAIRS:
        a, b = fl[:, up].copy(), fl[:, down].copy()
        fl[:, up] = r * a + (1 - r) * b
        fl[:, down] = (1 - r) * a + r * b

    K1, K2 = 10, 15
    T = fl.shape[0]
    eye_idx = [37, 38, 40, 41, 43, 44, 46, 47]
    for t in blink_timestamps(T, rng, K2):
        for up, down in EYE_PAIRS:
            closed = 0.25 * fl[t, up] + 0.75 * fl[t, down]
            fl[t, up] = closed
            fl[t, down] = closed
        open_l = fl[t - K1, eye_idx].copy()
        open_r = fl[t + K2, eye_idx].copy() if t + K2 < T else fl[t, eye_idx].copy()
        closed_v = fl[t, eye_idx]
        for t0 in range(t - K1 + 1, t):
            w = (t - t0) / K1
            fl[t0, eye_idx] = w * open_l + (1 - w) * closed_v
        for t0 in range(t + 1, min(t + K2, T)):
            w = (t + K2 - 1 - t0) / K2
            fl[t0, eye_idx] = w * closed_v + (1 - w) * open_r
    return fl


def area_of_signed_polygon(pts: jax.Array) -> jax.Array:
    """Shoelace signed area of a polygon (..., n, 2).

    Reference: Module1/util/geo_math.py:34 (sign convention: positive for
    counter-clockwise in (x, y) with y down, i.e. the raw shoelace sum / 2).
    """
    x = pts[..., 0]
    y = pts[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.sum(x * yn - xn * y, axis=-1)


def best_fit_transform(A: jax.Array, B: jax.Array
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares rigid transform (R, t) mapping A onto B via SVD.

    Reference: Module1/util/icp.py:5-50. A, B: (n, m) point sets.
    Returns (T_hom, R, t) with T the (m+1, m+1) homogeneous matrix.
    """
    m = A.shape[1]
    ca = jnp.mean(A, axis=0)
    cb = jnp.mean(B, axis=0)
    AA = A - ca
    BB = B - cb
    H = AA.T @ BB
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.concatenate([jnp.ones(m - 1), d[None]]))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    T = jnp.eye(m + 1).at[:m, :m].set(R).at[:m, m].set(t)
    return T, R, t


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def icp(A: jax.Array, B: jax.Array, max_iterations: int = 50,
        tolerance: float = 1e-4) -> tuple[jax.Array, jax.Array]:
    """Iterative closest point registration of A onto B.

    Reference: Module1/util/icp.py:77-113, re-expressed as a fixed-trip
    lax.scan with a converged flag instead of a data-dependent break (XLA
    needs static trip counts; iterations after convergence are no-ops).

    Returns (T_hom, mean_error).
    """
    n, m = A.shape

    def nearest(src, dst):
        d2 = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
        idx = jnp.argmin(d2, axis=1)
        return jnp.sqrt(jnp.min(d2, axis=1)), idx

    def step(carry, _):
        src, prev_err, done = carry
        dist, idx = nearest(src, B)
        T, R, t = best_fit_transform(src, B[idx])
        new_src = jnp.where(done, src, src @ R.T + t)
        err = jnp.mean(dist)
        new_done = done | (jnp.abs(prev_err - err) < tolerance)
        return (new_src, jnp.where(done, prev_err, err), new_done), None

    init = (A, jnp.asarray(0.0, A.dtype), jnp.asarray(False))
    (src_final, err, _), _ = jax.lax.scan(step, init, None,
                                          length=max_iterations)
    T, _, _ = best_fit_transform(A, src_final)
    return T, err
