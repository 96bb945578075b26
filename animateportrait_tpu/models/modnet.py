"""MODNet portrait matting (MobileNetV2 backbone), TPU-native NHWC.

Behavioral reimplementation of `Module2/models/modnet.py` +
`Module2/models/backbones/{mobilenetv2,wrapper}.py`: LR semantic branch
(backbone + SE + two 5x5 convs), HR detail branch, fusion branch -> matte.
The pipeline consumes only the matte (thresholded > 0.5 into a foreground
mask, `geomgm_ifw_fore_model.py:519-520`); the semantic/detail heads are
kept behind ``training=True`` for loss parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import InstanceNorm, interpolate_bilinear

ENC_CHANNELS = (16, 24, 32, 96, 1280)
HR_CHANNELS = 32


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class ConvBN(nn.Module):
    """conv_bn / conv_1x1_bn: Conv(no bias) + BN + ReLU6."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding,
                    use_bias=False, name="conv")(x)
        return _relu6(_BN(name="norm")(x))


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (mobilenetv2.py:45-84)."""

    inp: int
    oup: int
    stride: int
    expansion: int

    @nn.compact
    def __call__(self, x):
        hidden = round(self.inp * self.expansion)
        y = x
        i = 0
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), padding=0, use_bias=False,
                        name=f"conv{i}")(y)
            y = _relu6(_BN(name=f"norm{i}")(y))
            i += 1
        y = nn.Conv(hidden, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=hidden, use_bias=False,
                    name=f"conv{i}")(y)
        y = _relu6(_BN(name=f"norm{i}")(y))
        i += 1
        y = nn.Conv(self.oup, (1, 1), padding=0, use_bias=False,
                    name=f"conv{i}")(y)
        y = _BN(name=f"norm{i}")(y)
        if self.stride == 1 and self.inp == self.oup:
            return x + y
        return y


_MOBILENET_SETTING = (
    # (t, c, n, s)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2Backbone(nn.Module):
    """Returns [enc2x, enc4x, enc8x, enc16x, enc32x] (wrapper.py:38-73)."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, stride=2, name="feat0")(x)
        idx, inp = 1, 32
        outs = []
        for t, c, n, s in _MOBILENET_SETTING:
            for i in range(n):
                x = InvertedResidual(inp, c, s if i == 0 else 1, t,
                                     name=f"feat{idx}")(x)
                inp = c
                if idx in (1, 3, 6, 13):
                    outs.append(x)
                idx += 1
        x = ConvBN(1280, kernel=1, padding=0, name=f"feat{idx}")(x)
        outs.append(x)
        return outs


class IBNorm(nn.Module):
    """Half BatchNorm(affine) / half InstanceNorm (modnet.py:12-29)."""

    features: int

    @nn.compact
    def __call__(self, x):
        half = self.features // 2
        bn = _BN(name="bnorm")(x[..., :half])
        inorm = InstanceNorm()(x[..., half:])
        return jnp.concatenate([bn, inorm], axis=-1)


class ConvIBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    with_ibn: bool = True
    with_relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding,
                    name="conv")(x)
        if self.with_ibn:
            x = IBNorm(self.features, name="ibn")(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


class SEBlock(nn.Module):
    features: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        w = jnp.mean(x, axis=(1, 2))
        w = nn.relu(nn.Dense(self.features // self.reduction, use_bias=False,
                             name="fc0")(w))
        w = jax.nn.sigmoid(nn.Dense(self.features, use_bias=False,
                                    name="fc1")(w))
        return x * w[:, None, None, :]


def _up2x(x):
    return interpolate_bilinear(
        x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)


def _down(x, factor):
    return interpolate_bilinear(
        x, (x.shape[1] // factor, x.shape[2] // factor), align_corners=False)


class MODNet(nn.Module):
    """__call__(img (N,H,W,3) in [-1,1]) -> (semantic, detail, matte);
    semantic/detail are None unless training=True."""

    hr_channels: int = HR_CHANNELS

    @nn.compact
    def __call__(self, img, training: bool = False):
        enc = MobileNetV2Backbone(name="backbone")(img)
        enc2x, enc4x, enc32x = enc[0], enc[1], enc[4]

        # LR branch
        e32 = SEBlock(ENC_CHANNELS[4], name="se_block")(enc32x)
        lr16x = ConvIBNRelu(ENC_CHANNELS[3], 5, padding=2,
                            name="conv_lr16x")(_up2x(e32))
        lr8x = ConvIBNRelu(ENC_CHANNELS[2], 5, padding=2,
                           name="conv_lr8x")(_up2x(lr16x))
        pred_semantic = None
        if training:
            pred_semantic = jax.nn.sigmoid(
                ConvIBNRelu(1, 3, stride=2, padding=1, with_ibn=False,
                            with_relu=False, name="conv_lr")(lr8x))

        # HR branch
        hc = self.hr_channels
        img2x, img4x = _down(img, 2), _down(img, 4)
        enc2x_hr = ConvIBNRelu(hc, 1, name="tohr_enc2x")(enc2x)
        hr4x = ConvIBNRelu(hc, 3, stride=2, padding=1, name="conv_enc2x")(
            jnp.concatenate([img2x, enc2x_hr], axis=-1))
        enc4x_hr = ConvIBNRelu(hc, 1, name="tohr_enc4x")(enc4x)
        hr4x = ConvIBNRelu(2 * hc, 3, padding=1, name="conv_enc4x")(
            jnp.concatenate([hr4x, enc4x_hr], axis=-1))
        lr4x = _up2x(lr8x)
        y = jnp.concatenate([hr4x, lr4x, img4x], axis=-1)
        y = ConvIBNRelu(2 * hc, 3, padding=1, name="conv_hr4x_0")(y)
        y = ConvIBNRelu(2 * hc, 3, padding=1, name="conv_hr4x_1")(y)
        hr4x = ConvIBNRelu(hc, 3, padding=1, name="conv_hr4x_2")(y)
        y = jnp.concatenate([_up2x(hr4x), enc2x_hr], axis=-1)
        y = ConvIBNRelu(2 * hc, 3, padding=1, name="conv_hr2x_0")(y)
        y = ConvIBNRelu(hc, 3, padding=1, name="conv_hr2x_1")(y)
        y = ConvIBNRelu(hc, 3, padding=1, name="conv_hr2x_2")(y)
        hr2x = ConvIBNRelu(hc, 3, padding=1, name="conv_hr2x_3")(y)
        pred_detail = None
        if training:
            d = jnp.concatenate([_up2x(hr2x), img], axis=-1)
            d = ConvIBNRelu(hc, 3, padding=1, name="conv_hr_0")(d)
            pred_detail = jax.nn.sigmoid(
                ConvIBNRelu(1, 1, with_ibn=False, with_relu=False,
                            name="conv_hr_1")(d))

        # fusion branch
        lr4x_f = ConvIBNRelu(hc, 5, padding=2, name="conv_lr4x")(_up2x(lr8x))
        lr2x = _up2x(lr4x_f)
        f2x = ConvIBNRelu(hc, 3, padding=1, name="conv_f2x")(
            jnp.concatenate([lr2x, hr2x], axis=-1))
        f = jnp.concatenate([_up2x(f2x), img], axis=-1)
        f = ConvIBNRelu(hc // 2, 3, padding=1, name="conv_f_0")(f)
        pred_matte = jax.nn.sigmoid(
            ConvIBNRelu(1, 1, with_ibn=False, with_relu=False,
                        name="conv_f_1")(f))
        return pred_semantic, pred_detail, pred_matte


def load_modnet_params(sd) -> dict:
    """Reference `modnet_photographic_portrait_matting.ckpt` -> variables."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def put(path_ours: tuple, sub: dict, kind: str):
        node_p, node_s = params, stats
        for seg in path_ours[:-1]:
            node_p = node_p.setdefault(seg, {})
            node_s = node_s.setdefault(seg, {})
        leaf = path_ours[-1]
        if kind == "bn":
            p, s = tc.batchnorm(sd, sub["name"])
            node_p[leaf] = {"bn": p}
            node_s[leaf] = {"bn": s}
        elif kind == "conv":
            node_p[leaf] = tc.conv2d(sd, sub["name"], bias=sub.get(
                "bias", True))

    # --- backbone ---
    bb = "lr_branch.backbone.model.features"
    put(("backbone", "feat0", "conv"), {"name": f"{bb}.0.0",
                                        "bias": False}, "conv")
    put(("backbone", "feat0", "norm"), {"name": f"{bb}.0.1"}, "bn")
    idx, inp = 1, 32
    for t, c, n, s in _MOBILENET_SETTING:
        for i in range(n):
            seq = f"{bb}.{idx}.conv"
            convs = [0, 3, 6] if t != 1 else [0, 3]
            # torch Sequential: (pw conv, bn, relu6)? dw conv, bn, relu6,
            # pw-linear conv, bn — conv indices 0,3,6 (expansion) or 0,3
            for j, ci in enumerate(convs):
                put(("backbone", f"feat{idx}", f"conv{j}"),
                    {"name": f"{seq}.{ci}", "bias": False}, "conv")
                put(("backbone", f"feat{idx}", f"norm{j}"),
                    {"name": f"{seq}.{ci + 1}"}, "bn")
            inp = c
            idx += 1
    put(("backbone", f"feat{idx}", "conv"), {"name": f"{bb}.{idx}.0",
                                             "bias": False}, "conv")
    put(("backbone", f"feat{idx}", "norm"), {"name": f"{bb}.{idx}.1"}, "bn")

    # --- helpers for Conv2dIBNormRelu ---
    def cibr(ours: tuple, theirs: str, with_ibn=True):
        put(ours + ("conv",), {"name": f"{theirs}.layers.0"}, "conv")
        if with_ibn:
            put(ours + ("ibn", "bnorm"), {"name": f"{theirs}.layers.1.bnorm"},
                "bn")

    params["se_block"] = {
        "fc0": {"kernel": tc.linear_kernel(sd["lr_branch.se_block.fc.0.weight"])},
        "fc1": {"kernel": tc.linear_kernel(sd["lr_branch.se_block.fc.2.weight"])},
    }
    cibr(("conv_lr16x",), "lr_branch.conv_lr16x")
    cibr(("conv_lr8x",), "lr_branch.conv_lr8x")
    if "lr_branch.conv_lr.layers.0.weight" in sd:
        cibr(("conv_lr",), "lr_branch.conv_lr", with_ibn=False)

    cibr(("tohr_enc2x",), "hr_branch.tohr_enc2x")
    cibr(("conv_enc2x",), "hr_branch.conv_enc2x")
    cibr(("tohr_enc4x",), "hr_branch.tohr_enc4x")
    cibr(("conv_enc4x",), "hr_branch.conv_enc4x")
    for i in range(3):
        cibr((f"conv_hr4x_{i}",), f"hr_branch.conv_hr4x.{i}")
    for i in range(4):
        cibr((f"conv_hr2x_{i}",), f"hr_branch.conv_hr2x.{i}")
    if "hr_branch.conv_hr.0.layers.0.weight" in sd:
        cibr(("conv_hr_0",), "hr_branch.conv_hr.0")
        cibr(("conv_hr_1",), "hr_branch.conv_hr.1", with_ibn=False)

    cibr(("conv_lr4x",), "f_branch.conv_lr4x")
    cibr(("conv_f2x",), "f_branch.conv_f2x")
    cibr(("conv_f_0",), "f_branch.conv_f.0")
    cibr(("conv_f_1",), "f_branch.conv_f.1", with_ibn=False)

    return {"params": params, "batch_stats": stats}
