"""Temporal smoothing filters: Savitzky-Golay and Hann smoothing, batched.

TPU-first design notes
----------------------
The reference calls ``scipy.signal.savgol_filter`` on the CPU in the middle of
its model pipeline (Module1/src/approaches/train_audio2landmark.py:114-116,
310), forcing device→host→device ping-pong per segment. Here savgol is a
depthwise 1-D convolution with precomputed least-squares coefficients plus a
closed-form polynomial edge fit ('interp' mode), so the whole landmark
post-processing chain stays jitted on device and batched over all 204
coordinates at once.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _savgol_coeffs(window_length: int, polyorder: int) -> np.ndarray:
    """Central savgol coefficients (smoothing, deriv=0)."""
    half = window_length // 2
    pos = np.arange(-half, half + 1, dtype=np.float64)
    # Vandermonde design matrix; coefficients = first row of pinv
    A = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    coeffs = np.linalg.pinv(A)[0]
    return coeffs.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _savgol_edge_matrices(window_length: int, polyorder: int) -> tuple[np.ndarray, np.ndarray]:
    """Projection matrices for scipy's mode='interp' edge handling.

    Left edge: fit a polynomial to the first ``window_length`` samples and
    evaluate at positions 0..half-1; right edge analogous.
    """
    half = window_length // 2
    t = np.arange(window_length, dtype=np.float64)
    A = t[:, None] ** np.arange(polyorder + 1)[None, :]
    proj = A @ np.linalg.pinv(A)  # (wl, wl): fitted values at all positions
    left = proj[:half]            # rows for positions 0..half-1
    right = proj[window_length - half:]
    return left.astype(np.float32), right.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("window_length", "polyorder", "axis"))
def savgol_filter(
    x: jax.Array, window_length: int, polyorder: int, axis: int = 0
) -> jax.Array:
    """Savitzky-Golay smoothing matching scipy defaults (mode='interp').

    Args:
      x: array with time along ``axis``.
    """
    if window_length % 2 != 1:
        raise ValueError("window_length must be odd")
    x = jnp.moveaxis(x, axis, 0)
    T = x.shape[0]
    orig_shape = x.shape
    xf = x.reshape(T, -1)  # (T, D)

    half = window_length // 2
    coeffs = jnp.asarray(_savgol_coeffs(window_length, polyorder))
    # interior via correlation: y[t] = sum_k c[k] x[t-half+k]
    # build as a (T, wl) gather + matmul — T is small (<= few thousand frames)
    idx = jnp.arange(T)[:, None] + jnp.arange(-half, half + 1)[None, :]
    idx = jnp.clip(idx, 0, T - 1)
    y = jnp.einsum("twd,w->td", xf[idx], coeffs)

    # 'interp' edges: polynomial fit over first/last window
    left_m, right_m = _savgol_edge_matrices(window_length, polyorder)
    y_left = jnp.asarray(left_m) @ xf[:window_length]
    y_right = jnp.asarray(right_m) @ xf[T - window_length:]
    t_idx = jnp.arange(T)[:, None]
    y = jnp.where(t_idx < half, jnp.pad(y_left, ((0, T - half), (0, 0))), y)
    pad_right = jnp.pad(y_right, ((T - half, 0), (0, 0)))
    y = jnp.where(t_idx >= T - half, pad_right, y)

    return jnp.moveaxis(y.reshape(orig_shape), 0, axis)


@functools.partial(jax.jit, static_argnames=("window_len",))
def hann_smooth(x: jax.Array, window_len: int = 11) -> jax.Array:
    """Hanning-window smoothing of a 1-D series.

    Equivalent to Module1/util/utils.py:213-265 ``smooth(window='hanning')``:
    reflect-extend by window_len-1 on both sides, convolve with a normalized
    Hann window, then take the centered slice.
    """
    w = jnp.asarray(np.hanning(window_len).astype(np.float32))
    w = w / w.sum()
    ext = jnp.concatenate(
        [x[window_len - 1:0:-1], x, x[-2:-window_len - 1:-1]]
    )
    # like the reference, return the full 'valid' convolution
    # (length len(x) + window_len - 1); callers slice as needed
    return jnp.convolve(ext, w, mode="valid")
