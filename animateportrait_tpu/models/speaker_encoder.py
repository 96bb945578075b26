"""Speaker-embedding encoder (resemblyzer VoiceEncoder-compatible).

The reference calls the external `resemblyzer` package
(`Module1/thirdparty/resemblyer_util/speaker_emb.py:6-21`) for a 256-d
speaker embedding. Its VoiceEncoder is a 3-layer LSTM(40 -> 256) over
40-bin mel frames (n_fft 400, hop 160) followed by Linear(256, 256) + ReLU
and L2 normalization; utterances are embedded as the normalized mean of
partial 160-frame windows. This module reimplements that contract in flax
(weights convertible from the resemblyzer checkpoint via
``load_voice_encoder_params``).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import LSTM
from animateportrait_tpu.ops.spectral import mel_filterbank, stft_magnitude

MEL_N_CHANNELS = 40
MEL_WINDOW_STEP = 160
MEL_N_FFT = 400
PARTIAL_N_FRAMES = 160


class VoiceEncoder(nn.Module):
    """(B, T, 40) mel frames -> (B, 256) L2-normalized embeddings."""

    hidden: int = 256
    emb_size: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, mels):
        out, final = LSTM(self.hidden, self.num_layers, name="lstm")(mels)
        last_h = final[-1][0]  # final hidden state of the top layer
        raw = nn.relu(nn.Dense(self.emb_size, name="linear")(last_h))
        return raw / jnp.maximum(
            jnp.linalg.norm(raw, axis=-1, keepdims=True), 1e-8)


def wav_to_mel40(wav: np.ndarray, sr: int = 16000) -> np.ndarray:
    """resemblyzer's mel front end: power mel spectrogram, 40 bins."""
    mel_fb = mel_filterbank(
        sr=sr, n_fft=MEL_N_FFT, n_mels=MEL_N_CHANNELS, fmin=0.0,
        fmax=sr / 2)
    mag = stft_magnitude(jnp.asarray(wav, jnp.float32), n_fft=MEL_N_FFT,
                         hop=MEL_WINDOW_STEP)
    power = jnp.square(mag)
    return np.asarray(power @ jnp.asarray(mel_fb.T))


def preprocess_wav(wav: np.ndarray, sr: int = 16000,
                   target_dbfs: float = -30.0,
                   vad_window_ms: float = 30.0,
                   vad_threshold: float = 0.01) -> np.ndarray:
    """resemblyzer preprocess_wav equivalent: normalize volume to -30 dBFS
    and trim long silences.

    The real package uses webrtcvad (unavailable here); silence trimming is
    substituted with a moving-RMS gate at `vad_threshold` of the post-
    normalization full scale — a deliberate approximation with the same
    role (drop long silent stretches so partial windows cover speech).
    """
    wav = np.asarray(wav, np.float64)
    rms = np.sqrt(np.mean(np.square(wav))) or 1e-12
    gain = 10 ** ((target_dbfs - 20 * np.log10(rms)) / 20.0)
    wav = wav * gain
    win = max(1, int(sr * vad_window_ms / 1000))
    energy = np.sqrt(np.convolve(wav ** 2, np.ones(win) / win, "same"))
    voiced = energy > vad_threshold
    # dilate the mask so word-internal dips survive (webrtcvad smoothing)
    k = win * 8
    voiced = np.convolve(voiced.astype(np.float64),
                         np.ones(k), "same") > 0
    if voiced.any():
        wav = wav[voiced]
    return wav


def embed_utterance(variables, wav: np.ndarray, sr: int = 16000,
                    rate: float = 2.0, min_coverage: float = 0.75
                    ) -> np.ndarray:
    """Normalized mean of partial-window embeddings
    (resemblyzer VoiceEncoder.embed_utterance semantics)."""
    mels = wav_to_mel40(wav, sr)
    T = mels.shape[0]
    samples_per_frame = MEL_WINDOW_STEP
    frame_step = max(1, int(np.round(
        (sr / rate) / samples_per_frame)))
    starts = list(range(0, max(1, T - PARTIAL_N_FRAMES + frame_step),
                        frame_step))
    wins = []
    for s in starts:
        e = s + PARTIAL_N_FRAMES
        if e > T:
            coverage = (T - s) / PARTIAL_N_FRAMES
            if coverage < min_coverage and len(wins) > 0:
                continue
            s, e = max(0, T - PARTIAL_N_FRAMES), T
        w = mels[s:e]
        if w.shape[0] < PARTIAL_N_FRAMES:
            w = np.pad(w, ((0, PARTIAL_N_FRAMES - w.shape[0]), (0, 0)))
        wins.append(w)
    batch = jnp.asarray(np.stack(wins), jnp.float32)
    partials = VoiceEncoder().apply(variables, batch)
    raw = np.asarray(partials).mean(axis=0)
    return raw / max(np.linalg.norm(raw), 1e-8)


def get_spk_emb(variables, wav: np.ndarray, sr: int = 16000,
                segment_len: float = 60.0) -> np.ndarray:
    """Reference get_spk_emb (speaker_emb.py:6-21): preprocess (volume
    normalize + silence trim), then the mean embedding over 60-second
    segments (embed_utterance rate=2 as the reference passes),
    renormalized."""
    wav = preprocess_wav(wav, sr)
    n = int(segment_len * sr)
    embs = [embed_utterance(variables, wav[i: i + n], sr)
            for i in range(0, max(1, len(wav)), n)
            if len(wav[i: i + n]) > sr // 4 or i == 0]
    emb = np.mean(np.stack(embs), axis=0)
    return emb / max(np.linalg.norm(emb), 1e-8)


def load_voice_encoder_params(sd) -> dict:
    """resemblyzer `pretrained.pt['model_state']` -> params."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    return {"params": {
        "lstm": tc.lstm_params(sd, "lstm.", 3),
        "linear": tc.dense(sd, "linear"),
    }}
