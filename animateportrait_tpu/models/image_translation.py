"""Module1 image-translation renderer (MakeItTalk texture branch).

Behavioral reimplementation of
`Module1/src/models/model_image_translation.py`: ResUnetGenerator
(:412-507, Unet with stride-2 conv downs, two ResidualBlocks per side,
nearest-upsample + conv ups), Vgg19 slice extractor (:510-540), perceptual
VGGLoss with optional Gram-matrix StyleLoss x 3e7 (:542-596). Used by the
optional Module1 renderer trainer (`train_image_translation.py`), not by
the end-to-end driver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class ResidualBlock(nn.Module):
    """conv-BN-relu-conv-BN + skip, trailing relu (:385-409)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv0")(x)
        y = nn.relu(_BN(name="bn0")(y, train))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv1")(y)
        y = _BN(name="bn1")(y, train)
        return nn.relu(x + y)


def _up2_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class ResUnetSkipBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    inner: nn.Module | None = None
    outermost: bool = False
    innermost: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.inner_nc, (3, 3), strides=2, padding=1,
                    use_bias=False, name="down")(x)
        if not (self.outermost or self.innermost):
            y = _BN(name="down_bn")(y, train)
        y = nn.relu(y)
        y = ResidualBlock(self.inner_nc, name="down_res0")(y, train)
        y = ResidualBlock(self.inner_nc, name="down_res1")(y, train)
        if self.inner is not None:
            y = self.inner(y, train)
        y = _up2_nearest(y)
        y = nn.Conv(self.outer_nc, (3, 3), padding=1, use_bias=False,
                    name="up")(y)
        if self.outermost:
            return y
        y = nn.relu(_BN(name="up_bn")(y, train))
        y = ResidualBlock(self.outer_nc, name="up_res0")(y, train)
        y = ResidualBlock(self.outer_nc, name="up_res1")(y, train)
        return jnp.concatenate([x, y], axis=-1)


class ResUnetGenerator(nn.Module):
    """ResUnet (input 6ch = image + landmark sketch in MakeItTalk)."""

    output_nc: int = 3
    num_downs: int = 6
    ngf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        ngf = self.ngf
        block = ResUnetSkipBlock(ngf * 8, ngf * 8, innermost=True,
                                 name="inner")
        for i in range(self.num_downs - 5):
            block = ResUnetSkipBlock(ngf * 8, ngf * 8, inner=block,
                                     name=f"mid{i}")
        block = ResUnetSkipBlock(ngf * 4, ngf * 8, inner=block, name="up4")
        block = ResUnetSkipBlock(ngf * 2, ngf * 4, inner=block, name="up2")
        block = ResUnetSkipBlock(ngf, ngf * 2, inner=block, name="up1")
        block = ResUnetSkipBlock(self.output_nc, ngf, inner=block,
                                 outermost=True, name="outer")
        return block(x, train)


_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
# torchvision vgg19.features layer indices of the slice boundaries
_SLICE_ENDS = (2, 7, 12, 21, 30)


class Vgg19Features(nn.Module):
    """torchvision vgg19.features sliced at [0,2,7,12,21,30)
    (model_image_translation.py:510-540)."""

    @nn.compact
    def __call__(self, x):
        outs = []
        layer_idx = 0
        target = set(_SLICE_ENDS)
        for v in _VGG19_CFG:
            if v == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                layer_idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=1,
                            name=f"conv{layer_idx}")(x)
                layer_idx += 1
                x = nn.relu(x)
                layer_idx += 1
            if layer_idx in target:
                outs.append(x)
        return outs


def gram_matrix(x: jax.Array) -> jax.Array:
    """(:542-550) — NCHW flattening order preserved."""
    a, h, w, c = x.shape
    feats = jnp.transpose(x, (0, 3, 1, 2)).reshape(a * c, h * w)
    return feats @ feats.T / (a * c * h * w)


def vgg_loss(vgg_vars, x, y, style: bool = False):
    """VGGLoss (:561-596): sum of per-slice L1 (+ Gram MSE x 3e7)."""
    model = Vgg19Features()
    fx = model.apply(vgg_vars, x)
    fy = model.apply(vgg_vars, y)
    loss = 0.0
    style_loss = 0.0
    for a, b in zip(fx, fy):
        b = jax.lax.stop_gradient(b)
        loss = loss + jnp.mean(jnp.abs(a - b))
        if style:
            style_loss = style_loss + jnp.mean(
                jnp.square(gram_matrix(a) - gram_matrix(b))) * 30000000.0
    if style:
        return loss, style_loss
    return loss


def load_vgg19_params(sd) -> dict:
    """torchvision vgg19 state dict ('features.<i>.weight') -> params."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    p = {}
    layer_idx = 0
    for v in _VGG19_CFG:
        if v == "M":
            layer_idx += 1
            continue
        key = f"features.{layer_idx}"
        if f"{key}.weight" in sd:
            p[f"conv{layer_idx}"] = tc.conv2d(sd, key)
        layer_idx += 2
    return {"params": p}
