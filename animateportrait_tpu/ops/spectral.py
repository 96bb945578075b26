"""Spectral audio features: STFT magnitude, mel filterbank, log-mel, f0 coding.

TPU-first design notes
----------------------
The STFT is expressed as strided framing + a dense (windowed) DFT matmul so
the whole mel pipeline compiles to two MXU matmuls (frames @ DFT, mags @ mel)
plus fused elementwise log/scale — no FFT primitive or host round-trip needed.
For the sequence lengths involved (minutes of 16 kHz audio ≈ 1e4 frames of
1024 samples) this is bandwidth-trivial and keeps everything inside one jit.

Semantics parity (reference file:line):
- framing/window/magnitudes: ``pySTFT``
  (Module1/src/autovc/retrain_version/vocoder_spec/extract_f0_func.py:14-26):
  reflect pad fft_length//2, periodic Hann, |rfft|.
- mel + dB scaling: extract_f0_func.py:96-118 — librosa slaney mel
  (fmin=90, fmax=7600, n_mels=80), dB floor via
  min_level=exp(-100/20 ln 10), ``S = (20 log10(max(min_level, mel)) - 16
  + 100)/100``.
- f0 normalization/one-hot: Module1/src/autovc/utils.py:95-146
  (``speaker_normalization``, ``quantize_f0_interp`` with 257 bins).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, matching scipy get_window('hann')."""
    m = n if periodic else n - 1
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / m)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_mels, n_fft//2+1).

    Reimplementation of librosa.filters.mel defaults (htk=False,
    norm='slaney') used by the reference at extract_f0_func.py:96.
    """
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_min = _hz_to_mel_slaney(fmin)
    mel_max = _hz_to_mel_slaney(fmax)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _dft_matrices(n_fft: int, window: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: (n_fft, n_bins) cos and -sin matrices."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    cos_m = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_magnitude(x: jax.Array, n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """|STFT| of mono signal(s), pySTFT-compatible.

    Args:
      x: (..., n_samples) float signal.
    Returns:
      (..., n_frames, n_fft//2+1) magnitudes; n_frames = n_samples//hop + 1
      for n_samples not a multiple of hop (reference appends a sample when it
      is, extract_f0_func.py:107-108 — do that on the host).
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n = x.shape[-1]
    noverlap = n_fft - hop
    n_frames = (n - noverlap) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    frames = x[..., idx]  # (..., n_frames, n_fft)
    window = jnp.asarray(hann_window(n_fft))
    cos_m, sin_m = _dft_matrices(n_fft, np.ones(n_fft))
    cos_m = jnp.asarray(cos_m) * window[:, None]
    sin_m = jnp.asarray(sin_m) * window[:, None]
    re = frames @ cos_m
    im = frames @ sin_m
    return jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels"))
def mel_spectrogram(
    x: jax.Array,
    sr: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
) -> jax.Array:
    """Reference-scaled log-mel: S = (20 log10(max(min_level, mag@mel)) - 16 + 100)/100."""
    mags = stft_magnitude(x, n_fft, hop)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T)
    d_mel = mags @ basis
    min_level = jnp.exp(-100.0 / 20.0 * jnp.log(10.0))
    d_db = 20.0 * jnp.log10(jnp.maximum(min_level, d_mel)) - 16.0
    return (d_db + 100.0) / 100.0


def speaker_normalize_f0(
    logf0: jax.Array,
    voiced: jax.Array,
) -> jax.Array:
    """Normalize voiced log-f0 to [0, 1] by speaker mean/std (utils.py:95-102).

    Unvoiced frames keep a negative sentinel so the quantizer maps them to
    bin 0. Uses masked mean/std over voiced frames only.
    """
    v = voiced.astype(jnp.float32)
    cnt = jnp.maximum(v.sum(), 1.0)
    mean = (logf0 * v).sum() / cnt
    var = (jnp.square(logf0 - mean) * v).sum() / cnt
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    norm = (logf0 - mean) / std / 4.0
    norm = jnp.clip(norm, -1.0, 1.0)
    norm = (norm + 1.0) / 2.0
    return jnp.where(voiced, norm, -1e10)


def quantize_f0_onehot(x: jax.Array, num_bins: int = 256) -> jax.Array:
    """One-hot quantize normalized f0 to num_bins+1 channels (utils.py:130-146).

    Unvoiced (x < 0) -> bin 0; voiced -> 1 + round(x * (num_bins-1)).
    """
    uv = x < 0
    xq = jnp.where(uv, 0.0, x)
    idx = jnp.round(xq * (num_bins - 1)).astype(jnp.int32) + 1
    idx = jnp.where(uv, 0, idx)
    return jax.nn.one_hot(idx, num_bins + 1, dtype=jnp.float32)
