"""Audio front end: WAV -> (AutoVC-normalized mel, speaker embedding).

Behavioral reimplementation of the reference chain
(`main_end2end_module2.py:206-228` ->
`AutoVC_mel_Convertor_retrain_version.py:199-276` ->
`vocoder_spec/extract_f0_func.py:95-127`), with no external audio deps:
WAV IO via the stdlib, resampling/filtering via scipy, STFT/mel and the
AutoVC generator as jitted JAX, and f0 via the batched NCCF tracker in
`ops.f0` (a deliberate RAPT substitution, see that module's docstring).
"""
from __future__ import annotations

import dataclasses
import functools
import wave

import numpy as np

import jax
import jax.numpy as jnp

from animateportrait_tpu.models.autovc import AutoVCGenerator
from animateportrait_tpu.ops import f0 as f0_ops
from animateportrait_tpu.ops.pallas_stft import stft_magnitude_best
from animateportrait_tpu.ops.spectral import (
    mel_filterbank, quantize_f0_onehot, speaker_normalize_f0)
from animateportrait_tpu.utils import assets

SR = 16000
HOP = 256
N_FFT = 1024


def load_wav(path: str, target_sr: int = SR) -> np.ndarray:
    """Load a WAV file to float64 mono in [-1, 1), resampled to 16 kHz
    (the driver's `ffmpeg -ar 16000` step, main_end2end_module2.py:214)."""
    try:
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n)
        if width == 2:
            x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
        elif width == 4:
            x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
        elif width == 1:
            x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128) / 128
        else:
            raise ValueError(f"unsupported sample width {width}")
        if ch > 1:
            x = x.reshape(-1, ch)[:, 0]
    except wave.Error:
        from scipy.io import wavfile

        sr, x = wavfile.read(path)
        if x.dtype == np.int16:
            x = x.astype(np.float64) / 32768.0
        elif x.dtype == np.int32:
            x = x.astype(np.float64) / 2147483648.0
        elif x.dtype == np.uint8:
            x = (x.astype(np.float64) - 128) / 128
        else:
            x = x.astype(np.float64)
        if x.ndim > 1:
            x = x[:, 0]
    if sr != target_sr:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(sr, target_sr)
        x = resample_poly(x, target_sr // g, sr // g)
    return x


def normalize_dbfs(x: np.ndarray, target_dbfs: float = -20.0) -> np.ndarray:
    """pydub match_target_amplitude (-20 dBFS, the reference's
    AutoVC...py:223-225): apply gain so RMS dBFS hits the target, then
    round-trip through int16 like the reference's export-to-wav does."""
    rms = np.sqrt(np.mean(np.square(x)))
    dbfs = 20 * np.log10(max(rms, 1e-12))
    gain = 10 ** ((target_dbfs - dbfs) / 20.0)
    y = np.clip(x * gain, -1.0, 1.0)
    return np.round(y * 32768.0).clip(-32768, 32767) / 32768.0


@functools.lru_cache(maxsize=1)
def _mel_fb_t_device() -> np.ndarray:
    """Host-side cached filterbank. Deliberately NOT device-committed:
    a device_put here would pin every downstream jit to whatever device
    was default at first call (e.g. a CPU warmup would pin the TPU
    pipeline to CPU). jit handles placement per call site."""
    fb = mel_filterbank(sr=SR, n_fft=N_FFT, n_mels=80, fmin=90.0,
                        fmax=7600.0)
    return np.ascontiguousarray(fb.T, np.float32)


@functools.partial(jax.jit, static_argnames=("lo", "hi"))
def _frontend_fused(w: jax.Array, mel_fb_t: jax.Array,
                    lo: float, hi: float) -> jax.Array:
    """STFT -> mel-S, f0 track + normalize + one-hot as ONE program.

    Eagerly this chain is ~10 device dispatches; over the remote-TPU
    tunnel each costs a ~25-30 ms round trip, making the audio stage
    ~0.4 s of a 2.4 s end-to-end run. Fused = one upload, one dispatch,
    one packed (T, 80+1+257) fetch."""
    mag = stft_magnitude_best(w, n_fft=N_FFT, hop=HOP)
    d_mel = mag @ mel_fb_t
    min_level = np.exp(-100 / 20 * np.log(10))
    d_db = 20.0 * jnp.log10(jnp.maximum(min_level, d_mel)) - 16.0
    s = (d_db + 100.0) / 100.0
    logf0, voiced = f0_ops.track_f0(w, sr=SR, hop=HOP, lo=lo, hi=hi)
    f0_norm = speaker_normalize_f0(logf0, voiced)
    T = min(s.shape[0], f0_norm.shape[0])          # static shapes
    f0_oh = quantize_f0_onehot(f0_norm[:T])
    return jnp.concatenate(
        [s[:T].astype(jnp.float32), f0_norm[:T, None].astype(jnp.float32),
         f0_oh], axis=1)


def extract_frontend(wav: np.ndarray, gender: str = "F", seed: int = 0
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """extract_f0_func_audiofile (extract_f0_func.py:95-127): 5th-order
    30 Hz butter filtfilt, dither, 1024/256 STFT -> 80-bin mel (90-7600),
    dB floor -100, S=(dB+100)/100; speaker-normalized log-f0 plus its
    257-bin one-hot (utils.py:130-146). Returns (S, f0_norm, f0_onehot)."""
    from scipy import signal

    lo, hi = (50.0, 250.0) if gender == "M" else (100.0, 600.0)
    x = np.asarray(wav, np.float64)
    if x.shape[0] % 256 == 0:
        x = np.concatenate([x, np.array([1e-06])])
    b, a = signal.butter(5, 30 / (SR / 2), "high")
    y = signal.filtfilt(b, a, x)
    prng = np.random.RandomState(seed)
    w = y * 0.95 + (prng.rand(y.shape[0]) - 0.5) * 1e-06

    packed = np.asarray(_frontend_fused(
        jnp.asarray(w, jnp.float32), _mel_fb_t_device(), lo, hi))
    return (packed[:, :80], packed[:, 80].copy(), packed[:, 81:])


def extract_mel_and_f0(wav: np.ndarray, gender: str = "F",
                       seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """(S, f0_norm) view of :func:`extract_frontend`."""
    s, f0_norm, _ = extract_frontend(wav, gender, seed)
    return s, f0_norm


@dataclasses.dataclass
class AudioFeatures:
    mel_autovc: np.ndarray      # (T, 80) voice-normalized mel
    spk_emb: np.ndarray         # (256,) speaker embedding
    mel_raw: np.ndarray         # (T, 80) pre-AutoVC mel
    f0_norm: np.ndarray         # (T,) normalized f0


class AudioPipeline:
    """WAV -> AutoVC-normalized features, chunked like the reference."""

    def __init__(self, autovc_variables, voice_encoder_variables=None,
                 chunk: int = 4096):
        # device_put once: host-resident weights passed as jit args
        # re-upload through the (slow) TPU tunnel on every call
        dev = jax.devices()[0]
        put = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jax.device_put(x, dev), t)
        self.autovc_variables = put(autovc_variables)
        self.voice_encoder_variables = (
            None if voice_encoder_variables is None
            else put(voice_encoder_variables))
        self.chunk = chunk
        self._g = AutoVCGenerator()
        self._fwd = jax.jit(
            lambda v, mel, s_src, s_trg, f0oh: self._g.apply(
                v, mel, s_src, s_trg, f0oh)[1])

    def speaker_embedding(self, wav: np.ndarray) -> np.ndarray:
        if self.voice_encoder_variables is None:
            # deterministic fallback when no converted resemblyzer weights
            # are provided: zero embedding (AutoVC conditions on the target
            # Obama embedding regardless)
            return np.zeros(256, np.float32)
        from animateportrait_tpu.models.speaker_encoder import get_spk_emb

        return get_spk_emb(self.voice_encoder_variables, wav)

    def __call__(self, wav: np.ndarray, gender: str = "F") -> AudioFeatures:
        wav = normalize_dbfs(wav)
        mel, f0_norm, f0_oh = extract_frontend(wav, gender)
        emb = self.speaker_embedding(wav)
        emb_trg = assets.obama_speaker_emb().astype(np.float32)
        outs = []
        T = mel.shape[0]
        for i in range(0, T, self.chunk):
            m = mel[i: i + self.chunk]
            f = f0_oh[i: i + self.chunk]
            pad = (-m.shape[0]) % 32
            if pad:
                m = np.pad(m, ((0, pad), (0, 0)))
                f = np.pad(f, ((0, pad), (0, 0)))
            out = self._fwd(
                self.autovc_variables,
                jnp.asarray(m, jnp.float32)[None],
                jnp.asarray(emb, jnp.float32)[None],
                jnp.asarray(emb_trg, jnp.float32)[None],
                jnp.asarray(f, jnp.float32)[None])
            out = np.asarray(out[0])
            if pad:
                out = out[:-pad]
            outs.append(out)
        mel_autovc = np.concatenate(outs, axis=0)
        return AudioFeatures(mel_autovc=mel_autovc, spk_emb=emb,
                             mel_raw=mel, f0_norm=f0_norm)


def normalize_audio_features(au: np.ndarray) -> np.ndarray:
    """Dataset-side normalization by the vendored mean/std
    (audio2landmark_dataset.py:47-53)."""
    mean, std = assets.autovc_mel_au_mean_std()
    return ((au - mean) / std).astype(np.float32)


def extract_stft_features(wav: np.ndarray, fps: int = 25
                          ) -> np.ndarray:
    """STFT-only 161-d features for the no-AutoVC path
    (convert_single_wav_to_input, AutoVC...py:146-196): log power of a
    scipy stft (nperseg 320 @ 25 fps), normalized by its max, with the last
    2 video frames dropped for A/V alignment."""
    from scipy.signal import stft as scipy_stft

    win = {25: 320, 30: 356}[fps]
    step = {25: 4, 30: 3}[fps]
    # the reference feeds raw int16-scale samples (scipy wav.read without
    # normalization); match that so the log-power max normalizer behaves
    x = normalize_dbfs(np.asarray(wav, np.float64)) * 32768.0
    _, _, zxx = scipy_stft(x, fs=SR, nperseg=win)
    feats = np.log(np.abs(zxx) ** 2 + 1e-10)
    feats /= np.max(feats)
    fl_length = feats.shape[1] // step
    feats = feats[:, : (fl_length - 2) * step]
    return feats.T.astype(np.float32)
