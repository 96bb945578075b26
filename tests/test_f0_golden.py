"""RAPT-parity evidence for the f0 substitution on real speech.

The reference extracts f0 with pysptk's RAPT (extract_f0_func.py:74).
pysptk is not installable here, so the golden is an independent NumPy
implementation of Talkin's RAPT (tests/rapt_golden.py: two-pass NCCF +
Viterbi) — deliberately sharing no code or structure with the
framework's jittable tracker — run on the reference's own example
speech (/root/reference/examples/female12.wav) through the reference's
exact preprocessing chain.

Measured on 2026-08-17 (the bounds below assert these with margin):
  voicing agreement 0.862, common-voiced median |dHz| 2.26,
  median quantized-bin distance 3/257, 77.7% of common-voiced frames
  within 8 bins, octave-scale (ratio>1.5) disagreement 12.1%.
An independent harmonic-comb attribution of the octave-disagreement
frames split them 21 golden / 27 ours / 10 ties — the disagreements are
ambiguous frames, not a systematic tracker error.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from animateportrait_tpu.ops import f0 as f0_ops
from animateportrait_tpu.ops.spectral import (
    quantize_f0_onehot, speaker_normalize_f0)
from tests.rapt_golden import rapt

WAV = "/root/reference/examples/female12.wav"


def _reference_preproc():
    """The chain rapt sees in extract_f0_func.py:95-127: channel 0,
    odd-length fixup, 30 Hz 5th-order butter filtfilt, 0.95 gain +
    RandomState(0) dither."""
    from scipy import signal
    from scipy.io import wavfile

    sr, wav = wavfile.read(WAV)
    x = np.asarray(wav, np.float64)
    if x.ndim > 1:
        x = x[:, 0]
    x = x / 32768.0
    if x.shape[0] % 256 == 0:
        x = np.concatenate([x, [1e-6]])
    b, a = signal.butter(5, 30 / (sr / 2), "high")
    y = signal.filtfilt(b, a, x)
    w = y * 0.95 + (np.random.RandomState(0).rand(len(y)) - 0.5) * 1e-6
    return w, sr


def test_golden_rapt_tracks_synthetic_tone():
    """The golden itself locks to a vibrato tone with silence gaps."""
    sr, hop = 16000, 256
    t = np.arange(sr * 2) / sr
    f = 180 + 15 * np.sin(2 * np.pi * 3 * t)
    x = np.sin(2 * np.pi * np.cumsum(f) / sr) * 0.3
    x[:3000] = 0
    x[20000:23000] = 0
    lf = rapt(x * 32768, sr, hop, 100, 600)
    v = lf > -1e9
    hz = np.exp(lf[v])
    assert 0.7 < v.mean() < 0.9
    assert hz.min() > 160 and hz.max() < 200
    assert abs(hz.mean() - 180) < 5


@pytest.mark.slow
def test_nccf_tracker_vs_rapt_golden_on_real_speech():
    """Quantified substitution error of ops/f0.track_f0 vs RAPT on
    female12.wav, female gender bounds (lo=100, hi=600) — compared on
    the speaker-normalized 257-bin encoding AutoVC actually consumes
    (utils.py:95-146)."""
    w, sr = _reference_preproc()

    lf_g = rapt(w * 32768, sr, 256, 100, 600)
    vg = lf_g > -1e9
    lf_o, vo = f0_ops.track_f0(jnp.asarray(w, jnp.float32), sr=sr,
                               hop=256, lo=100.0, hi=600.0)
    lf_o, vo = np.asarray(lf_o), np.asarray(vo)
    assert lf_g.shape == lf_o.shape

    # voicing decisions agree on the large majority of frames
    agreement = (vg == vo).mean()
    assert agreement >= 0.80, agreement

    both = vg & vo
    assert both.sum() > 300  # the comparison is not vacuous

    # voiced-frame Hz error: tight in the median; a bounded minority of
    # ambiguous frames may disagree at octave scale (verified
    # independently to split evenly between the two trackers)
    err = np.abs(np.exp(lf_g[both]) - np.exp(lf_o[both]))
    assert np.median(err) <= 5.0, np.median(err)
    octave = (np.exp(np.abs(lf_g[both] - lf_o[both])) > 1.5).mean()
    assert octave <= 0.20, octave

    # the downstream encoding: speaker-normalized, 257-bin one-hot
    ng = np.asarray(speaker_normalize_f0(jnp.asarray(lf_g, jnp.float32),
                                         jnp.asarray(vg)))
    no = np.asarray(speaker_normalize_f0(jnp.asarray(lf_o, jnp.float32),
                                         jnp.asarray(vo)))
    qg = np.argmax(np.asarray(quantize_f0_onehot(jnp.asarray(ng))), -1)
    qo = np.argmax(np.asarray(quantize_f0_onehot(jnp.asarray(no))), -1)
    bins = np.abs(qg[both].astype(int) - qo[both].astype(int))
    assert np.median(bins) <= 6, np.median(bins)
    assert (bins <= 8).mean() >= 0.70, (bins <= 8).mean()
