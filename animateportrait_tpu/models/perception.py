"""Frozen perception nets used in training losses: MobileFaceNet (68-pt
landmark regressor) and Sphere20a (sphereface features for FaceLoss).

Behavioral reimplementation of `Module2/models/mobilefacenet.py` (GDC head,
embedding 136 = 68 x (x, y) in [0, 1]) and `Module2/models/facenet.py:200-282`
(4 PReLU-residual stages on 112x96 input returning the 5-element feature
list consumed by the weighted-L1 FaceLoss, `networks.py:2862-3055`).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import PReLU


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class ConvBlock(nn.Module):
    """Conv(no bias) + BN + PReLU (mobilefacenet.py:17-27)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding,
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = _BN(name="bn")(x)
        return PReLU(self.features, name="prelu")(x)


class LinearBlock(nn.Module):
    """Conv(no bias) + BN, no activation (mobilefacenet.py:29-37)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding,
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        return _BN(name="bn")(x)


class DepthWise(nn.Module):
    """pointwise expand -> depthwise -> pointwise project
    (mobilefacenet.py:39-56)."""

    features: int
    groups: int
    stride: int = 2
    residual: bool = False

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.groups, name="conv")(x)
        y = ConvBlock(self.groups, kernel=3, stride=self.stride, padding=1,
                      groups=self.groups, name="conv_dw")(y)
        y = LinearBlock(self.features, name="project")(y)
        return x + y if self.residual else y


class MobileFaceNet(nn.Module):
    """__call__(img (N,112,112,3) in [0,1]) -> (landmarks136, features)."""

    embedding_size: int = 136

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(64, kernel=3, stride=2, padding=1, name="conv1")(x)
        x = ConvBlock(64, kernel=3, stride=1, padding=1, groups=64,
                      name="conv2_dw")(x)
        x = DepthWise(64, 128, name="conv_23")(x)
        for i in range(4):
            x = DepthWise(64, 128, stride=1, residual=True,
                          name=f"conv_3_{i}")(x)
        x = DepthWise(128, 256, name="conv_34")(x)
        for i in range(6):
            x = DepthWise(128, 256, stride=1, residual=True,
                          name=f"conv_4_{i}")(x)
        x = DepthWise(128, 512, name="conv_45")(x)
        for i in range(2):
            x = DepthWise(128, 256, stride=1, residual=True,
                          name=f"conv_5_{i}")(x)
        features = ConvBlock(512, name="conv_6_sep")(x)
        # GDC head
        y = LinearBlock(512, kernel=7, groups=512, name="conv_6_dw")(features)
        y = y.reshape(y.shape[0], -1)
        y = nn.Dense(self.embedding_size, use_bias=False, name="linear")(y)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name="out_bn")(y)
        return y, features


class Sphere20a(nn.Module):
    """__call__(img (N,112,96,3) in [-1,1]) -> 5-element feature list."""

    @nn.compact
    def __call__(self, x):
        feats = []

        def conv(name, ch, stride=1):
            def f(y):
                y = nn.Conv(ch, (3, 3), strides=stride, padding=1,
                            name=f"conv{name}")(y)
                return PReLU(ch, name=f"relu{name}")(y)
            return f

        x = conv("1_1", 64, 2)(x)
        x = x + conv("1_3", 64)(conv("1_2", 64)(x))
        feats.append(x)

        x = conv("2_1", 128, 2)(x)
        x = x + conv("2_3", 128)(conv("2_2", 128)(x))
        x = x + conv("2_5", 128)(conv("2_4", 128)(x))
        feats.append(x)

        x = conv("3_1", 256, 2)(x)
        x = x + conv("3_3", 256)(conv("3_2", 256)(x))
        x = x + conv("3_5", 256)(conv("3_4", 256)(x))
        x = x + conv("3_7", 256)(conv("3_6", 256)(x))
        x = x + conv("3_9", 256)(conv("3_8", 256)(x))
        feats.append(x)

        x = conv("4_1", 512, 2)(x)
        x = x + conv("4_3", 512)(conv("4_2", 512)(x))
        feats.append(x)

        # torch flattens NCHW: transpose back before reshape for parity
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(512, name="fc5")(x)
        feats.append(x)
        return feats


def face_loss(sphere_apply, variables, img1, img2) -> jax.Array:
    """FaceLoss.compute_loss (networks.py:2995-3009): unweighted sum of L1
    distances between the 5 sphere feature levels. Inputs NHWC 112x96 in
    [-1, 1]; img2 is treated as the (stop-gradient) reference."""
    f1 = sphere_apply(variables, img1)
    f2 = sphere_apply(variables, img2)
    loss = 0.0
    for a, b in zip(f1, f2):
        loss = loss + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss


def crop_head_bbox(imgs: jax.Array, bboxs: jax.Array,
                   out_hw: tuple[int, int] = (112, 96)) -> jax.Array:
    """FaceLoss.crop_head_bbox (networks.py:3014-3037): crop per-sample
    bbox [lt_x, rt_x, lt_y, rt_y] and resize to 112x96.

    Dynamic crop sizes can't be traced, so this gathers a bilinear sample
    grid over the bbox instead — numerically equivalent to crop+resize
    with torch align_corners=True semantics.
    """
    from animateportrait_tpu.ops.warp import sample_bilinear

    N = imgs.shape[0]
    H, W = out_hw
    x0, x1 = bboxs[:, 0].astype(jnp.float32), bboxs[:, 1].astype(jnp.float32)
    y0, y1 = bboxs[:, 2].astype(jnp.float32), bboxs[:, 3].astype(jnp.float32)
    ty = jnp.linspace(0.0, 1.0, H)[None, :, None]
    tx = jnp.linspace(0.0, 1.0, W)[None, None, :]
    iy = y0[:, None, None] + ty * (y1 - 1 - y0)[:, None, None]
    ix = x0[:, None, None] + tx * (x1 - 1 - x0)[:, None, None]
    iy = jnp.broadcast_to(iy, (N, H, W))
    ix = jnp.broadcast_to(ix, (N, H, W))
    return sample_bilinear(imgs, iy, ix, padding_mode="border")


def load_mobilefacenet_params(sd) -> dict:
    """Reference `mobilefacenet_model_best.pth.tar['state_dict']` ->
    variables."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def cb(ours: str, theirs: str, prelu: bool = True):
        """ConvBlock/LinearBlock: dotted `ours` path -> nested subtree."""
        p: dict = {"conv": tc.conv2d(sd, f"{theirs}.conv", bias=False)}
        bn_p, bn_s = tc.batchnorm(sd, f"{theirs}.bn")
        p["bn"] = {"bn": bn_p}
        if prelu and f"{theirs}.prelu.weight" in sd:
            p["prelu"] = {"alpha": sd[f"{theirs}.prelu.weight"]}

        def insert(tree, path, leaf):
            node = tree
            for seg in path[:-1]:
                node = node.setdefault(seg, {})
            node[path[-1]] = leaf

        insert(params, ours.split("."), p)
        insert(stats, ours.split("."), {"bn": {"bn": bn_s}})

    def dw(ours, theirs):
        for sub in ("conv", "conv_dw", "project"):
            cb(f"{ours}.{sub}", f"{theirs}.{sub}")

    cb("conv1", "conv1")
    cb("conv2_dw", "conv2_dw")
    dw("conv_23", "conv_23")
    for i in range(4):
        dw(f"conv_3_{i}", f"conv_3.model.{i}")
    dw("conv_34", "conv_34")
    for i in range(6):
        dw(f"conv_4_{i}", f"conv_4.model.{i}")
    dw("conv_45", "conv_45")
    for i in range(2):
        dw(f"conv_5_{i}", f"conv_5.model.{i}")
    cb("conv_6_sep", "conv_6_sep")
    cb("conv_6_dw", "output_layer.conv_6_dw")

    params["linear"] = {
        "kernel": tc.linear_kernel(sd["output_layer.linear.weight"])}
    bn_p, bn_s = tc.batchnorm(sd, "output_layer.bn")
    params["out_bn"] = bn_p
    stats["out_bn"] = bn_s
    return {"params": params, "batch_stats": stats}


def load_sphere20a_params(sd) -> dict:
    """Reference `sphere20a_20171020.pth` -> variables (fc6 dropped, as in
    networks.py:3044-3053)."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params: dict = {}
    names = (["1_1", "1_2", "1_3"]
             + [f"2_{i}" for i in range(1, 6)]
             + [f"3_{i}" for i in range(1, 10)]
             + [f"4_{i}" for i in range(1, 4)])
    for n in names:
        params[f"conv{n}"] = tc.conv2d(sd, f"conv{n}")
        params[f"relu{n}"] = {"alpha": sd[f"relu{n}.weight"]}
    params["fc5"] = tc.dense(sd, "fc5")
    return {"params": params}


class SEBottleneck(nn.Module):
    """SENet bottleneck with the reference's inline SE (conv4/conv5)
    squeeze-excite (facenet.py:67-117). Stride applies in conv1."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), strides=self.stride, padding=0,
                      use_bias=False, name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = nn.relu(_BN(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), padding=0, use_bias=False,
                      name="conv3")(out)
        out = _BN(name="bn3")(out)

        se = jnp.mean(out, axis=(1, 2), keepdims=True)
        se = nn.relu(nn.Conv(self.planes * 4 // 16, (1, 1), padding=0,
                             name="conv4")(se))
        se = jax.nn.sigmoid(nn.Conv(self.planes * 4, (1, 1), padding=0,
                                    name="conv5")(se))

        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=self.stride, padding=0,
                               use_bias=False, name="down_conv")(x)
            residual = _BN(name="down_bn")(residual)
        return nn.relu(se * out + residual)


class SENet50(nn.Module):
    """senet50(include_top=False) feature extractor
    (facenet.py:120-195): returns [x0..x4] for the 224x224 FaceLoss
    variant."""

    layers: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, get_feat: bool = True):
        from animateportrait_tpu.nn import max_pool_ceil

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_BN(name="bn1")(x))
        # torch MaxPool2d(3, 2, padding=0, ceil_mode=True)
        x0 = max_pool_ceil(x, 3, 2)
        feats = [x0]
        inplanes = 64
        y = x0
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                  self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                down = bi == 0 and (stride != 1 or inplanes != planes * 4)
                y = SEBottleneck(planes, stride if bi == 0 else 1,
                                 downsample=down,
                                 name=f"layer{li + 1}_{bi}")(y)
                inplanes = planes * 4
            feats.append(y)
        if get_feat:
            return feats
        return jax.lax.reduce_window(
            y, 0.0, jax.lax.add, (1, 7, 7, 1), (1, 1, 1, 1), "VALID") / 49.0


def load_senet50_params(weights: dict) -> dict:
    """Reference senet50_ft pickle (numpy dict, fc dropped as in
    FaceLoss.load_senet_model, networks.py:3030-3042) -> variables."""
    import re

    params: dict = {}
    stats: dict = {}

    def put(ours, arr, kind, leaf=None):
        node_p, node_s = params, stats
        for seg in ours[:-1]:
            node_p = node_p.setdefault(seg, {})
            node_s = node_s.setdefault(seg, {})
        name = ours[-1]
        if kind == "conv":
            node_p[name] = {"kernel": np.transpose(arr, (2, 3, 1, 0))}
        elif kind == "conv_b":
            node_p.setdefault(name, {})[leaf] = (
                np.transpose(arr, (2, 3, 1, 0)) if leaf == "kernel"
                else arr.reshape(-1))

    # the senet50_ft pickle uses names like 'conv1/7x7_s2/weight' — map
    # layerN.M.convK etc. from a torch-style dict when given one instead
    for k, v in weights.items():
        v = np.asarray(v)
        k = k.replace("module.", "")
        if k.startswith("fc"):
            continue
        parts = k.split(".")
        if parts[0] == "conv1":
            put(["conv1"], v, "conv")
        elif parts[0] == "bn1":
            stats.setdefault("bn1", {}).setdefault("bn", {})
            tgt = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                   "running_mean": ("stats", "mean"),
                   "running_var": ("stats", "var")}.get(parts[1])
            if tgt:
                (params if tgt[0] == "params" else stats).setdefault(
                    "bn1", {}).setdefault("bn", {})[tgt[1]] = v
        elif re.match(r"layer\d", parts[0]):
            li = parts[0]
            bi = parts[1]
            sub = parts[2]
            name = f"{li}_{bi}"
            node_p = params.setdefault(name, {})
            node_s = stats.setdefault(name, {})
            if sub.startswith("conv") and parts[-1] == "weight":
                node_p.setdefault(sub, {})["kernel"] = np.transpose(
                    v, (2, 3, 1, 0))
            elif sub.startswith("conv") and parts[-1] == "bias":
                node_p.setdefault(sub, {})["bias"] = v.reshape(-1)
            elif sub.startswith("bn"):
                tgt = {"weight": (node_p, "scale"), "bias": (node_p, "bias"),
                       "running_mean": (node_s, "mean"),
                       "running_var": (node_s, "var")}.get(parts[-1])
                if tgt:
                    tgt[0].setdefault(sub, {}).setdefault("bn", {})[
                        tgt[1]] = v
            elif sub == "downsample":
                idx = parts[3]
                if idx == "0" and parts[-1] == "weight":
                    node_p.setdefault("down_conv", {})["kernel"] = (
                        np.transpose(v, (2, 3, 1, 0)))
                elif idx == "1":
                    tgt = {"weight": (node_p, "scale"),
                           "bias": (node_p, "bias"),
                           "running_mean": (node_s, "mean"),
                           "running_var": (node_s, "var")}.get(parts[-1])
                    if tgt:
                        tgt[0].setdefault("down_bn", {}).setdefault(
                            "bn", {})[tgt[1]] = v
    return {"params": params, "batch_stats": stats}
