"""Image quality metrics: SSIM / PSNR with the reference's semantics.

`Module2/intrinsic_flow_models/modules.py:560-589` converts [-1,1] tensors
to uint8 and calls skimage's compare_psnr / compare_ssim (multichannel).
Here the same math runs as jittable JAX: 7x7 uniform-window SSIM with the
unbiased covariance correction, per-channel averaged, borders cropped —
skimage's defaults for uint8 inputs (data_range 255, gaussian_weights
False).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_uint8_space(x: jax.Array) -> jax.Array:
    """[-1,1] float NHWC -> quantized [0,255] floats (modules.py:563-565)."""
    return jnp.round(jnp.clip((x + 1.0) * 127.5, 0, 255))


def _uniform_valid(x: jax.Array, win: int) -> jax.Array:
    """Mean over win x win VALID windows, NHWC."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, win, win, 1),
                              (1, 1, 1, 1), "VALID")
    return s / (win * win)


def ssim(img1: jax.Array, img2: jax.Array, data_range: float = 255.0,
         win_size: int = 7) -> jax.Array:
    """Mean structural similarity per batch item, channels averaged.

    img*: (N, H, W, C) in [0, data_range]. Matches
    skimage.metrics.structural_similarity(multichannel=True) defaults.
    """
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    ux = _uniform_valid(img1, win_size)
    uy = _uniform_valid(img2, win_size)
    uxx = _uniform_valid(img1 * img1, win_size)
    uyy = _uniform_valid(img2 * img2, win_size)
    uxy = _uniform_valid(img1 * img2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s, axis=(1, 2, 3))


def ssim_ref(fake: jax.Array, real: jax.Array,
             mask: jax.Array | None = None) -> jax.Array:
    """modules.SSIM forward: [-1,1] inputs -> scalar mean SSIM."""
    a = to_uint8_space(fake)
    b = to_uint8_space(real)
    if mask is not None:
        a = a * mask
        b = b * mask
    return jnp.mean(ssim(a, b))


def psnr_ref(fake: jax.Array, real: jax.Array) -> jax.Array:
    """modules.PSNR forward: [-1,1] inputs -> scalar mean PSNR (dB)."""
    a = to_uint8_space(fake)
    b = to_uint8_space(real)
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10(255.0 ** 2 / jnp.maximum(mse, 1e-12)))
