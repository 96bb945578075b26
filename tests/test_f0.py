"""Direct accuracy tests for the NCCF pitch tracker (ops/f0.py), the
documented RAPT substitution."""
import numpy as np

import jax.numpy as jnp

from animateportrait_tpu.ops.f0 import track_f0


def _tone(f0, sr=16000, dur=1.0, harmonics=3):
    t = np.arange(int(sr * dur)) / sr
    x = sum((0.6 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
            for k in range(harmonics))
    return (x / np.abs(x).max()).astype(np.float32)


def test_track_f0_recovers_pure_tones():
    for f0 in (110.0, 150.0, 220.0, 330.0):
        x = _tone(f0)
        logf0, voiced = track_f0(jnp.asarray(x), lo=100.0, hi=600.0)
        v = np.asarray(voiced)
        est = np.exp(np.asarray(logf0)[v])
        # interior voiced frames recover the pitch within 3 Hz
        assert v.mean() > 0.8, f"tone {f0} mostly unvoiced"
        med = np.median(est)
        assert abs(med - f0) < 3.0, f"tone {f0}: got {med:.1f}"


def test_track_f0_noise_is_unvoiced():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    _, voiced = track_f0(jnp.asarray(x))
    assert np.asarray(voiced).mean() < 0.5


def test_track_f0_sweep_follows_pitch():
    sr = 16000
    t = np.arange(sr) / sr
    f_inst = 120.0 + 80.0 * t  # 120 -> 200 Hz linear sweep
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    x = np.sin(phase).astype(np.float32)
    logf0, voiced = track_f0(jnp.asarray(x), lo=100.0, hi=300.0)
    v = np.asarray(voiced)
    est = np.exp(np.asarray(logf0))
    frames = np.arange(len(est)) * 256 / sr
    target = 120.0 + 80.0 * frames
    err = np.abs(est[v] - target[v])
    assert np.median(err) < 6.0


def test_track_f0_frame_count_matches_mel():
    x = np.zeros(12345, np.float32)
    logf0, _ = track_f0(jnp.asarray(x))
    assert logf0.shape[0] == 12345 // 256 + 1
