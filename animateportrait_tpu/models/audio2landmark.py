"""Audio -> landmark models (content + speaker/pos branches), TPU-native.

Behavioral reimplementation of the reference's landmark predictors
(`Module1/src/models/model_audio2landmark.py`):

- ``Audio2landmarkContent``: per-18-frame-window LSTM regressor of landmark
  displacements (:28-90).
- ``Audio2landmarkPos``: LSTM audio encoder + speaker-emb MLP feeding a small
  from-scratch transformer encoder over the *segment as a sequence* (:296-383)
  — one 512-frame inference segment is one attention sequence, batch dim 1.
- Training discriminators ``DiscriminatorMLP`` / ``TransformerDT`` /
  ``DiscriminatorGRU`` (:409-490).

Reference quirks preserved exactly (they change numerics):
- The positional-encoding table uses exponents 2i and 2(i+1) rather than the
  standard i (model_audio2landmark.py:109-115).
- ``Norm`` divides by (unbiased std + eps), not sqrt(var + eps) (:197-210).
- FeedForward hidden width is 2048 even though d_model is 64 (:184-194).

TPU-first: windows are batched (B, 18, 80) so LSTMs and the transformer run
as large MXU matmuls; no per-frame Python loops.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import LSTM, GRU

AUDIO_FEAT_SIZE = 161
FACE_ID_FEAT_SIZE = 204
Z_SIZE = 128


def _leaky(x, slope):
    return nn.leaky_relu(x, negative_slope=slope)


class BatchNorm1dTorch(nn.Module):
    """torch BatchNorm1d semantics over (N, C): eps 1e-5, momentum 0.1."""

    features: int

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9, epsilon=1e-5, name="bn")(x)


class TorchNorm(nn.Module):
    """The reference transformer's Norm: alpha*(x-mean)/(std+eps)+bias with
    torch's *unbiased* std (model_audio2landmark.py:197-210)."""

    d_model: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.d_model,))
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        n = x.shape[-1]
        var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (n - 1)
        return alpha * (x - mean) / (jnp.sqrt(var) + self.eps) + bias


def positional_encoding_table(d_model: int, max_seq_len: int = 512
                              ) -> np.ndarray:
    """Reference PE table incl. its nonstandard exponents
    (model_audio2landmark.py:109-115)."""
    pe = np.zeros((max_seq_len, d_model), np.float32)
    pos = np.arange(max_seq_len, dtype=np.float64)[:, None]
    i = np.arange(0, d_model, 2, dtype=np.float64)[None, :]
    pe[:, 0::2] = np.sin(pos / (10000.0 ** (2.0 * i / d_model)))
    pe[:, 1::2] = np.cos(pos / (10000.0 ** (2.0 * (i + 1) / d_model)))
    return pe


class MultiHeadAttention(nn.Module):
    heads: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic=True):
        B = q.shape[0]
        d_k = self.d_model // self.heads

        def proj(x, name):
            y = nn.Dense(self.d_model, name=name)(x)
            return y.reshape(B, -1, self.heads, d_k).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(q, "q"), proj(k, "k"), proj(v, "v")
        scores = qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(float(d_k))
        if mask is not None:
            scores = jnp.where(mask[:, None] == 0, -1e9, scores)
        scores = jax.nn.softmax(scores, axis=-1)
        scores = nn.Dropout(self.dropout, deterministic=deterministic)(scores)
        out = (scores @ vh).transpose(0, 2, 1, 3).reshape(B, -1, self.d_model)
        return nn.Dense(self.d_model, name="out")(out)


class FeedForward(nn.Module):
    d_model: int
    d_ff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.relu(nn.Dense(self.d_ff, name="l1")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.d_model, name="l2")(x)


class EncoderLayer(nn.Module):
    d_model: int
    heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        x2 = TorchNorm(self.d_model, name="norm1")(x)
        a = MultiHeadAttention(self.heads, self.d_model, name="attn")(
            x2, x2, x2, mask, deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(a)
        x2 = TorchNorm(self.d_model, name="norm2")(x)
        f = FeedForward(self.d_model, name="ff")(x2, deterministic)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(f)


class TransformerEncoder(nn.Module):
    """Reference Encoder (embed -> scaled PE -> N layers -> Norm)."""

    d_model: int
    num_layers: int
    heads: int
    max_seq_len: int = 512

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        x = nn.Dense(self.d_model, name="embed")(x)
        pe = positional_encoding_table(self.d_model, self.max_seq_len)
        T = x.shape[1]
        x = x * jnp.sqrt(float(self.d_model)) + jnp.asarray(pe)[None, :T]
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.heads, name=f"layer{i}")(
                x, mask, deterministic)
        return TorchNorm(self.d_model, name="norm")(x)


class Audio2landmarkContent(nn.Module):
    """Content branch: 18-frame audio window -> 204-d landmark displacement.

    Matches the reference instantiation (`train_audio2landmark.py:72-76`):
    use_prior_net=True, hidden 256, 3 LSTM layers.
    """

    num_window_frames: int = 18
    in_size: int = 80
    lstm_size: int = AUDIO_FEAT_SIZE
    hidden_size: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, au, face_id, train: bool = False):
        # au: (N, 18, 80); face_id: (1 or N, 204)
        N, W = au.shape[0], au.shape[1]
        x = au.reshape(N * W, self.in_size)
        x = nn.Dense(256, name="prior_l0")(x)
        x = BatchNorm1dTorch(256, name="prior_bn0")(x, not train)
        x = _leaky(x, 0.2)
        x = nn.Dense(self.lstm_size, name="prior_l1")(x)
        x = x.reshape(N, W, self.lstm_size)
        out, _ = LSTM(self.hidden_size, self.num_layers, name="lstm")(x)
        out = out[:, -1, :]
        if face_id.shape[0] == 1:
            face_id = jnp.broadcast_to(face_id, (N, face_id.shape[1]))
        y = jnp.concatenate([out, face_id], axis=1)
        y = nn.Dense(512, name="fc_l0")(y)
        y = BatchNorm1dTorch(512, name="fc_bn0")(y, not train)
        y = _leaky(y, 0.2)
        y = nn.Dense(256, name="fc_l1")(y)
        y = BatchNorm1dTorch(256, name="fc_bn1")(y, not train)
        y = _leaky(y, 0.2)
        y = nn.Dense(FACE_ID_FEAT_SIZE, name="fc_l2")(y)
        return y, face_id


class Audio2landmarkPos(nn.Module):
    """Speaker-aware position branch (model_audio2landmark.py:296-383).

    __call__(au (T,18,80), emb (T,256), face_id (*,204), z (T,128)) treats
    the whole segment as ONE transformer sequence (batch dim 1) — the
    reference's `src_feat = comb_encode.unsqueeze(0)` (:375); 512-frame
    segmenting is therefore a hard semantic boundary.
    """

    audio_feat_size: int = 80
    c_enc_hidden_size: int = 256
    num_layers: int = 3
    spk_emb_enc_size: int = 128
    transformer_d_model: int = 32
    N: int = 2
    heads: int = 2
    z_size: int = Z_SIZE

    @nn.compact
    def __call__(self, au, emb, face_id, z, deterministic=True):
        d_model = self.transformer_d_model * self.heads
        audio_encode, _ = LSTM(self.c_enc_hidden_size, self.num_layers,
                               name="audio_content_encoder")(au)
        audio_encode = audio_encode[:, -1, :]

        s = nn.Dense(256, name="spk_l0")(emb)
        s = _leaky(s, 0.02)
        s = nn.Dense(128, name="spk_l1")(s)
        s = _leaky(s, 0.02)
        spk_encode = nn.Dense(self.spk_emb_enc_size, name="spk_l2")(s)

        comb = jnp.concatenate([audio_encode, spk_encode, z], axis=1)
        e_out = TransformerEncoder(
            d_model, self.N, self.heads, name="encoder")(
            comb[None], deterministic=deterministic)[0]
        e_out = jnp.concatenate([e_out, z], axis=1)

        y = nn.Dense(512, name="out_l0")(e_out)
        y = _leaky(y, 0.02)
        y = nn.Dense(256, name="out_l1")(y)
        y = _leaky(y, 0.02)
        fl_pred = nn.Dense(FACE_ID_FEAT_SIZE, name="out_l2")(y)
        return fl_pred, face_id[0:1, :], spk_encode


class DiscriminatorMLP(nn.Module):
    """Frame-wise landmark discriminator (TalkingToon..._DL, :409-424)."""

    @nn.compact
    def __call__(self, feat):
        x = _leaky(nn.Dense(512, name="l0")(feat), 0.02)
        x = _leaky(nn.Dense(256, name="l1")(x), 0.02)
        return nn.Dense(1, name="l2")(x)


class TransformerDT(nn.Module):
    """Windowed transformer discriminator over landmark sequences
    (Transformer_DT, :427-450)."""

    transformer_d_model: int = 32
    N: int = 2
    heads: int = 2
    spk_emb_enc_size: int = 128

    @nn.compact
    def __call__(self, fls, spk_emb, win_size: int = 64, win_step: int = 1,
                 deterministic=True):
        d_model = self.transformer_d_model * self.heads
        feat = jnp.concatenate([fls, spk_emb], axis=1)
        T = feat.shape[0]
        w = T - 1 if T <= win_size else win_size
        n_win = T - w
        idx = (jnp.arange(n_win)[:, None]
               + jnp.arange(0, w, win_step)[None, :])
        d_in = feat[idx]  # (n_win, w, F) gather — batched, no Python loop
        d_out = TransformerEncoder(
            d_model, self.N, self.heads, name="encoder")(
            d_in, deterministic=deterministic)
        d_out = jnp.max(d_out, axis=1)
        x = _leaky(nn.Dense(512, name="l0")(d_out), 0.02)
        x = _leaky(nn.Dense(256, name="l1")(x), 0.02)
        return nn.Dense(1, name="l2")(x)


class DiscriminatorGRU(nn.Module):
    """GRU temporal discriminator (TalkingToon..._DT, :453-490)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, comb_encode, fls, win_size: int = 32,
                 win_step: int = 1):
        feat = jnp.concatenate([comb_encode, fls], axis=1)
        # temporal max-pool window 4 stride 1 over the sequence dim (:471-481)
        T = feat.shape[0]
        pooled = jax.lax.reduce_window(
            feat, -jnp.inf, jax.lax.max,
            window_dimensions=(4, 1), window_strides=(1, 1),
            padding="VALID")
        T = pooled.shape[0]
        w = T - 1 if T <= win_size else win_size
        n_win = T - w
        idx = (jnp.arange(n_win)[:, None]
               + jnp.arange(0, w, win_step)[None, :])
        d_in = pooled[idx]
        out, _ = GRU(self.hidden, 3, name="gru")(d_in)
        out = out[:, -1, :]
        x = _leaky(nn.Dense(512, name="l0")(out), 0.02)
        x = _leaky(nn.Dense(256, name="l1")(x), 0.02)
        return nn.Dense(1, name="l2")(x)


# --- checkpoint converters -------------------------------------------------


def _mlp(sd, tc, torch_prefix, names, indices):
    return {
        name: tc.dense(sd, f"{torch_prefix}.{i}") for name, i in
        zip(names, indices)
    }


def load_content_params(sd) -> dict:
    """Reference `ckpt_content_branch.pth['model_g_face_id']` -> params.

    torch module layout: fc_prior = Sequential(Linear, BatchNorm1d,
    LeakyReLU, Linear); fc = Sequential(Linear, BN, LReLU, Linear, BN,
    LReLU, Linear); bilstm.
    """
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params = {
        "prior_l0": tc.dense(sd, "fc_prior.0"),
        "prior_l1": tc.dense(sd, "fc_prior.3"),
        "lstm": tc.lstm_params(sd, "bilstm.", 3),
        "fc_l0": tc.dense(sd, "fc.0"),
        "fc_l1": tc.dense(sd, "fc.3"),
        "fc_l2": tc.dense(sd, "fc.6"),
    }
    stats = {}
    for ours, theirs in (("prior_bn0", "fc_prior.1"), ("fc_bn0", "fc.1"),
                         ("fc_bn1", "fc.4")):
        p, s = tc.batchnorm(sd, theirs)
        params[ours] = {"bn": p}
        stats[ours] = {"bn": s}
    return {"params": params, "batch_stats": stats}


def _transformer_encoder_params(sd, tc, prefix, num_layers=2):
    enc = {"embed": tc.dense(sd, f"{prefix}.embed.embed")}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        enc[f"layer{i}"] = {
            "norm1": {"alpha": np.asarray(sd[f"{lp}.norm_1.alpha"]),
                      "bias": np.asarray(sd[f"{lp}.norm_1.bias"])},
            "norm2": {"alpha": np.asarray(sd[f"{lp}.norm_2.alpha"]),
                      "bias": np.asarray(sd[f"{lp}.norm_2.bias"])},
            "attn": {
                "q": tc.dense(sd, f"{lp}.attn.q_linear"),
                "k": tc.dense(sd, f"{lp}.attn.k_linear"),
                "v": tc.dense(sd, f"{lp}.attn.v_linear"),
                "out": tc.dense(sd, f"{lp}.attn.out"),
            },
            "ff": {"l1": tc.dense(sd, f"{lp}.ff.linear_1"),
                   "l2": tc.dense(sd, f"{lp}.ff.linear_2")},
        }
    enc["norm"] = {"alpha": np.asarray(sd[f"{prefix}.norm.alpha"]),
                   "bias": np.asarray(sd[f"{prefix}.norm.bias"])}
    return enc


def load_pos_params(sd) -> dict:
    """Reference `ckpt_speaker_branch.pth['G']` -> params (comb_mlp and the
    unused transformer decoder are dropped, as the reference loader does,
    `train_audio2landmark.py:62-66`)."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params = {
        "audio_content_encoder": tc.lstm_params(
            sd, "audio_content_encoder.", 3),
        "spk_l0": tc.dense(sd, "spk_emb_encoder.0"),
        "spk_l1": tc.dense(sd, "spk_emb_encoder.2"),
        "spk_l2": tc.dense(sd, "spk_emb_encoder.4"),
        "encoder": _transformer_encoder_params(sd, tc, "encoder"),
        "out_l0": tc.dense(sd, "out.0"),
        "out_l1": tc.dense(sd, "out.2"),
        "out_l2": tc.dense(sd, "out.4"),
    }
    return {"params": params}


class Audio2landmarkSpeakerAware(nn.Module):
    """Speaker-aware branch with head-pose head (pos_dim=7: quaternion +
    translation), used by the speaker-branch trainer.

    The reference has drifted here (SURVEY.md 2.13): the trainer calls
    ``G(aus, embs*coef, face_id, add_z_spk=True)`` expecting 4 returns
    (train_speaker_aware.py:260-263) while the matching 4-return forward is
    the `_old` class with a `(au, face_id)` signature
    (model_audio2landmark_speaker_aware.py:229-321). This module reconciles
    the two: the pos-branch audio encoder + speaker MLP (as the trainer
    feeds embs), the transformer encoder, the face-id-conditioned landmark
    head, and the `out_pos_2` head.
    """

    spk_emb_enc_size: int = 128
    transformer_d_model: int = 32
    N: int = 2
    heads: int = 2
    pos_dim: int = 7

    @nn.compact
    def __call__(self, au, emb, face_id, add_z_spk: bool = False,
                 z_rng=None, deterministic=True):
        d_model = self.transformer_d_model * self.heads
        audio_encode, _ = LSTM(256, 3, name="audio_content_encoder")(au)
        audio_encode = audio_encode[:, -1, :]

        s = _leaky(nn.Dense(256, name="spk_l0")(emb), 0.02)
        s = _leaky(nn.Dense(128, name="spk_l1")(s), 0.02)
        spk_encode = nn.Dense(self.spk_emb_enc_size, name="spk_l2")(s)
        if add_z_spk:
            z = jax.random.normal(
                z_rng if z_rng is not None else self.make_rng("z_spk"),
                spk_encode.shape) * 0.01
            spk_encode = spk_encode + z

        comb = jnp.concatenate([audio_encode, spk_encode], axis=1)
        e_out = TransformerEncoder(
            d_model, self.N, self.heads, name="encoder")(
            comb[None], deterministic=deterministic)[0]

        if face_id.shape[0] == 1:
            face_id_t = jnp.broadcast_to(
                face_id, (e_out.shape[0], face_id.shape[1]))
        else:
            face_id_t = face_id
        fl_in = jnp.concatenate([e_out, face_id_t], axis=1)
        y = _leaky(nn.Dense(512, name="fls_l0")(fl_in), 0.02)
        y = _leaky(nn.Dense(256, name="fls_l1")(y), 0.02)
        fl_pred = nn.Dense(FACE_ID_FEAT_SIZE, name="fls_l2")(y)

        p = _leaky(nn.Dense(32, name="pos_l0")(e_out), 0.02)
        p = _leaky(nn.Dense(16, name="pos_l1")(p), 0.02)
        pos_pred = nn.Dense(self.pos_dim, name="pos_l2")(p)
        return fl_pred, pos_pred, face_id[0:1, :], spk_encode
