"""AutoVC voice-normalization generator, TPU-native.

Reimplements the behavior of the reference AutoVC generator
(`Module1/src/autovc/retrain_version/model_vc_37_1.py:165-200`): a content
encoder (3x Conv1d(k5)+GroupNorm32+ReLU -> 2-layer BiLSTM(dim_neck) with
freq-strided code downsampling), an autoregressive-free 3-layer LSTM(512)
decoder over [codes (+) target speaker emb (+) f0 one-hot], and a 5-conv
residual postnet.

TPU-first notes: sequences are (B, T, C) throughout (no NCW transposes);
convs run as NWC `lax.conv_general_dilated` which XLA tiles onto the MXU;
the code down/upsampling is a static reshape (T must be a multiple of
`freq` — the caller pads to a multiple of 32 as the reference pipeline
does, `AutoVC_mel_Convertor_retrain_version.py:249-266`); LSTMs are
`nn.scan`-based with torch-layout weights for direct checkpoint import.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import LSTM

DIM_FREQ = 80
DIM_F0 = 257
DIM_ENC = 512
DIM_DEC = 512
NUM_GRP = 32


class AutoVCEncoder(nn.Module):
    """Content encoder -> downsampled codes (B, T//freq, 2*dim_neck)."""

    dim_neck: int = 16
    freq: int = 16

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 80 + dim_emb)
        for i in range(3):
            x = nn.Conv(DIM_ENC, (5,), padding=2, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=NUM_GRP, epsilon=1e-5, name=f"gn{i}")(x)
            x = nn.relu(x)
        out, _ = LSTM(self.dim_neck, num_layers=2, bidirectional=True,
                      name="lstm")(x)
        fwd, bwd = out[..., : self.dim_neck], out[..., self.dim_neck:]
        B, T = out.shape[0], out.shape[1]
        nblk = T // self.freq
        # forward stream sampled at block ends, backward at block starts
        # (model_vc_37_1.py:82-86)
        fwd_codes = fwd.reshape(B, nblk, self.freq, self.dim_neck)[:, :, -1]
        bwd_codes = bwd.reshape(B, nblk, self.freq, self.dim_neck)[:, :, 0]
        return jnp.concatenate([fwd_codes, bwd_codes], axis=-1)


class AutoVCDecoder(nn.Module):
    """3-layer LSTM(512) + linear projection to 80 mel bins."""

    @nn.compact
    def __call__(self, x):
        out, _ = LSTM(DIM_DEC, num_layers=3, name="lstm")(x)
        return nn.Dense(DIM_FREQ, name="proj")(out)


class AutoVCPostnet(nn.Module):
    """5x Conv1d(k5)+GroupNorm residual refiner (model_vc_37_1.py:113-160)."""

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(512, (5,), padding=2, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=NUM_GRP, epsilon=1e-5, name=f"gn{i}")(x)
            x = jnp.tanh(x)
        x = nn.Conv(DIM_FREQ, (5,), padding=2, name="conv4")(x)
        x = nn.GroupNorm(num_groups=5, epsilon=1e-5, name="gn4")(x)
        return x


class AutoVCGenerator(nn.Module):
    """Full AutoVC generator.

    __call__(mel, spk_src, spk_trg, f0_onehot) with mel (B, T, 80),
    spk (B, dim_emb), f0_onehot (B, T, 257); returns
    (mel_dec, mel_postnet, codes_flat) as the reference does.
    """

    dim_neck: int = 16
    dim_emb: int = 256
    freq: int = 16

    @nn.compact
    def __call__(self, mel, spk_src, spk_trg, f0_onehot, enc_only=False):
        B, T = mel.shape[0], mel.shape[1]
        src = jnp.broadcast_to(spk_src[:, None, :], (B, T, self.dim_emb))
        codes = AutoVCEncoder(self.dim_neck, self.freq, name="encoder")(
            jnp.concatenate([mel, src], axis=-1))
        codes_flat = codes.reshape(B, -1)
        if enc_only:
            return codes_flat
        # nearest-neighbor upsample codes back to frame rate
        code_exp = jnp.repeat(codes, self.freq, axis=1)
        trg = jnp.broadcast_to(spk_trg[:, None, :], (B, T, self.dim_emb))
        dec_in = jnp.concatenate([code_exp, trg, f0_onehot], axis=-1)
        mel_dec = AutoVCDecoder(name="decoder")(dec_in)
        mel_post = mel_dec + AutoVCPostnet(name="postnet")(mel_dec)
        return mel_dec, mel_post, codes_flat


def load_autovc_params(sd) -> dict:
    """Convert a reference AutoVC `.pth` state dict (possibly under a 'G' /
    'model' key and 'module.' prefixes) to this module's param tree."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    enc: dict = {}
    for i in range(3):
        enc[f"conv{i}"] = tc.conv1d(sd, f"encoder.convolutions.{i}.0.conv")
        enc[f"gn{i}"] = tc.norm_affine(sd, f"encoder.convolutions.{i}.1")
    enc["lstm"] = tc.lstm_params(sd, "encoder.lstm.", 2, bidirectional=True)
    dec = {
        "lstm": tc.lstm_params(sd, "decoder.lstm.", 3),
        "proj": tc.dense(sd, "decoder.linear_projection.linear_layer"),
    }
    post: dict = {}
    for i in range(5):
        post[f"conv{i}"] = tc.conv1d(sd, f"postnet.convolutions.{i}.0.conv")
        post[f"gn{i}"] = tc.norm_affine(sd, f"postnet.convolutions.{i}.1")
    return {"params": {"encoder": enc, "decoder": dec, "postnet": post}}
