"""Audio front-end tests: STFT/mel vs numpy oracles of the reference math,
WAV IO round trip, dBFS normalization, and the chunked AutoVC pipeline."""
import os
import wave

import numpy as np
import pytest

import jax.numpy as jnp


def _py_stft(x, fft_length=1024, hop_length=256):
    """Oracle: the reference pySTFT (extract_f0_func.py:14-26)."""
    from scipy.signal import get_window

    x = np.pad(x, int(fft_length // 2), mode="reflect")
    noverlap = fft_length - hop_length
    shape = x.shape[:-1] + ((x.shape[-1] - noverlap) // hop_length,
                            fft_length)
    strides = x.strides[:-1] + (hop_length * x.strides[-1], x.strides[-1])
    frames = np.lib.stride_tricks.as_strided(x, shape=shape, strides=strides)
    win = get_window("hann", fft_length, fftbins=True)
    return np.abs(np.fft.rfft(win * frames, n=fft_length).T)


def _slaney_mel(sr, n_fft, n_mels, fmin, fmax):
    """Oracle: librosa.filters.mel (slaney scale + slaney norm)."""
    def hz_to_mel(f):
        f = np.atleast_1d(np.asarray(f, np.float64))
        m = f / (200.0 / 3)
        log_t = f >= 1000.0
        m[log_t] = 15.0 + np.log(f[log_t] / 1000.0) / (np.log(6.4) / 27.0)
        return m

    def mel_to_hz(m):
        m = np.atleast_1d(np.asarray(m, np.float64))
        f = m * (200.0 / 3)
        log_t = m >= 15.0
        f[log_t] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log_t] - 15.0))
        return f

    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mels = np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2)
    freqs = mel_to_hz(mels)
    weights = np.zeros((n_mels, len(fftfreqs)))
    fdiff = np.diff(freqs)
    ramps = freqs[:, None] - fftfreqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2: n_mels + 2] - freqs[:n_mels])
    weights *= enorm[:, None]
    return weights


def test_stft_matches_pystft(rng):
    from animateportrait_tpu.ops.spectral import stft_magnitude

    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(x)))
    ref = _py_stft(x.astype(np.float64)).T
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mel_filterbank_matches_librosa_formula():
    from animateportrait_tpu.ops.spectral import mel_filterbank

    ours = mel_filterbank(sr=16000, n_fft=1024, n_mels=80, fmin=90.0,
                          fmax=7600.0)
    ref = _slaney_mel(16000, 1024, 80, 90.0, 7600.0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-8)


def test_load_wav_roundtrip(tmp_path, rng):
    from animateportrait_tpu.pipeline.audio import load_wav

    x = (rng.uniform(-0.5, 0.5, 8000) * 32767).astype(np.int16)
    p = str(tmp_path / "t.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    y = load_wav(p)
    np.testing.assert_allclose(y, x.astype(np.float64) / 32768.0, atol=1e-9)

    # resampled load
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.tobytes())
    y8 = load_wav(p)
    assert abs(len(y8) - 16000) <= 2


def test_normalize_dbfs(rng):
    from animateportrait_tpu.pipeline.audio import normalize_dbfs

    x = rng.standard_normal(16000) * 0.01
    y = normalize_dbfs(x, -20.0)
    rms = np.sqrt(np.mean(np.square(y)))
    assert abs(20 * np.log10(rms) - (-20.0)) < 0.1


def test_extract_mel_matches_reference_math(rng):
    """The mel branch of extract_mel_and_f0 vs a pure numpy transcription."""
    from scipy import signal as ssig
    from animateportrait_tpu.pipeline.audio import extract_mel_and_f0

    x = rng.standard_normal(16000 + 3).astype(np.float64) * 0.1
    s, f0n = extract_mel_and_f0(x, "F", seed=0)

    b, a = ssig.butter(5, 30 / 8000, "high")
    y = ssig.filtfilt(b, a, x)
    prng = np.random.RandomState(0)
    w = y * 0.95 + (prng.rand(y.shape[0]) - 0.5) * 1e-06
    D = _py_stft(w).T
    mel_b = _slaney_mel(16000, 1024, 80, 90, 7600).T
    d_mel = D @ mel_b
    min_level = np.exp(-100 / 20 * np.log(10))
    d_db = 20 * np.log10(np.maximum(min_level, d_mel)) - 16
    ref = (d_db + 100) / 100
    np.testing.assert_allclose(s, ref[: s.shape[0]], atol=2e-4)
    assert f0n.shape[0] == s.shape[0]
    # normalized f0 is in [0,1] for voiced, negative sentinel for unvoiced
    voiced = f0n >= 0
    if voiced.any():
        assert (f0n[voiced] <= 1.0).all()


def test_audio_pipeline_chunks(rng):
    """Chunked AutoVC inference: output length == input length, and matches
    an unchunked pass on a short signal."""
    import jax
    from animateportrait_tpu.models.autovc import AutoVCGenerator
    from animateportrait_tpu.pipeline.audio import AudioPipeline

    g = AutoVCGenerator()
    T = 100
    variables = g.init(jax.random.key(0), jnp.zeros((1, 32, 80)),
                       jnp.zeros((1, 256)), jnp.zeros((1, 256)),
                       jnp.zeros((1, 32, 257)))
    pipe = AudioPipeline(variables, chunk=64)
    wav = rng.standard_normal(T * 256 - 1).astype(np.float64) * 0.1
    feats = pipe(wav)
    assert feats.mel_autovc.shape == feats.mel_raw.shape
    assert feats.mel_autovc.shape[1] == 80
    assert np.isfinite(feats.mel_autovc).all()
    assert feats.spk_emb.shape == (256,)


def test_extract_stft_features(rng):
    from animateportrait_tpu.pipeline.audio import extract_stft_features

    wav = rng.standard_normal(16000).astype(np.float64) * 0.1
    f = extract_stft_features(wav)
    assert f.shape[1] == 161
    assert f.shape[0] % 4 == 0
    assert np.isfinite(f).all() and f.max() <= 1.0 + 1e-6
