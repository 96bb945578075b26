"""Pallas TPU kernel: fused STFT-magnitude.

The audio front end computes |STFT| as framing + windowed-DFT matmul
(`ops.spectral.stft_magnitude`). XLA materializes the (T, n_fft) frame
matrix in HBM between the strided gather and the matmul; this kernel fuses
them: because hop (256) divides n_fft (1024), the padded signal viewed as
(rows, hop) makes every frame a concatenation of n_fft/hop consecutive
rows, so each grid step takes one dynamic row-slice of the signal matrix
(regular access, no gather), assembles its (T_block, n_fft) frames from
four static shifted views, multiplies by the window-folded DFT cos/sin
matrices on the MXU, and writes only the (T_block, n_freq) magnitudes.

Semantics match `stft_magnitude` (pySTFT: reflect pad n_fft//2, periodic
hann, hop 256); interpret mode keeps tests runnable on CPU and
`stft_magnitude_best` falls back to the XLA path off-TPU.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from animateportrait_tpu.ops.spectral import hann_window

_T_BLOCK = 128


def _dft_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed rDFT cos/sin matrices (n_fft, n_freq padded to lanes)."""
    n_freq = -(-(n_fft // 2 + 1) // 128) * 128  # lane-aligned
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft)[:, None]
    return (np.cos(ang) * win).astype(np.float32), (
        np.sin(ang) * win).astype(np.float32)


def _stft_kernel(xmat_ref, cos_ref, sin_ref, out_ref, *, hop, n_fft,
                 t_block):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shifts = n_fft // hop
    extra = -(-(shifts - 1) // 8) * 8  # sublane-aligned overlap rows
    tb = pl.program_id(0)
    rows = xmat_ref[pl.ds(tb * t_block, t_block + extra), :]
    # frame = concat of `shifts` consecutive rows; expressed as per-shift
    # matmuls against the matching DFT row band, with pltpu.roll providing
    # the aligned shifted views (unaligned sublane slices upset Mosaic)
    re = jnp.zeros((t_block, out_ref.shape[1]), jnp.float32)
    im = jnp.zeros((t_block, out_ref.shape[1]), jnp.float32)
    for sft in range(shifts):
        nrows = t_block + extra
        part = pltpu.roll(rows, shift=(nrows - sft) % nrows,
                          axis=0)[:t_block, :]
        band = slice(sft * hop, (sft + 1) * hop)
        re = re + jnp.dot(part, cos_ref[band, :],
                          preferred_element_type=jnp.float32)
        im = im + jnp.dot(part, sin_ref[band, :],
                          preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_magnitude_pallas(x: jax.Array, n_fft: int = 1024,
                          hop: int = 256) -> jax.Array:
    """|STFT| via the fused Pallas kernel. x: (n_samples,) float32.

    Returns (n_frames, n_fft//2 + 1), n_frames = n_samples//hop + 1
    (pySTFT framing, extract_f0_func.py:14-26). Requires hop | n_fft.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_fft % hop == 0
    shifts = n_fft // hop
    n = x.shape[0]
    n_frames = (n + 2 * (n_fft // 2) - n_fft) // hop + 1
    n_freq = n_fft // 2 + 1
    n_freq_pad = -(-n_freq // 128) * 128
    xpad = jnp.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    t_blocks = -(-n_frames // _T_BLOCK)
    extra = -(-(shifts - 1) // 8) * 8
    rows_needed = t_blocks * _T_BLOCK + extra
    total = rows_needed * hop
    xpad = jnp.pad(xpad, (0, max(0, total - xpad.shape[0])))
    xmat = xpad[:total].reshape(rows_needed, hop)
    cos_m, sin_m = _dft_mats(n_fft)

    out = pl.pallas_call(
        functools.partial(_stft_kernel, hop=hop, n_fft=n_fft,
                          t_block=_T_BLOCK),
        out_shape=jax.ShapeDtypeStruct((t_blocks * _T_BLOCK, n_freq_pad),
                                       jnp.float32),
        grid=(t_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_T_BLOCK, n_freq_pad), lambda tb: (tb, 0)),
        interpret=jax.default_backend() != "tpu",
    )(xmat, jnp.asarray(cos_m), jnp.asarray(sin_m))
    return out[:n_frames, :n_freq]


def stft_magnitude_best(x: jax.Array, n_fft: int = 1024,
                        hop: int = 256) -> jax.Array:
    """Pallas kernel on TPU, XLA framing+matmul elsewhere."""
    if jax.default_backend() == "tpu" and n_fft % hop == 0:
        return stft_magnitude_pallas(x, n_fft, hop)
    from animateportrait_tpu.ops.spectral import stft_magnitude

    return stft_magnitude(x, n_fft, hop)
