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

import numpy as np

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


# ---------------------------------------------------------------------------
# Geometric Matching Module (MakeItTalk leftovers,
# model_image_translation.py:102-624: FeatureExtraction :102-121,
# FeatureL2Norm :124-131, FeatureCorrelation :133-147, FeatureRegression
# :149-180, AffineGridGen :183-196, TpsGridGen :198-290, GMM :599-623)
# ---------------------------------------------------------------------------

class FeatureExtraction(nn.Module):
    """Strided conv tower with the reference's conv->ReLU->BN order."""

    ngf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)(y)

        x = nn.relu(nn.Conv(self.ngf, (4, 4), strides=2, padding=1,
                            name="conv0")(x))
        x = bn(x, "bn0")
        for i in range(self.n_layers):
            cin = 2 ** i * self.ngf
            cout = 2 ** (i + 1) * self.ngf if cin < 512 else 512
            x = nn.relu(nn.Conv(cout, (4, 4), strides=2, padding=1,
                                name=f"conv{i + 1}")(x))
            x = bn(x, f"bn{i + 1}")
        x = nn.relu(nn.Conv(512, (3, 3), padding=1, name="conv4")(x))
        x = bn(x, "bn4")
        return nn.relu(nn.Conv(512, (3, 3), padding=1, name="conv5")(x))


def feature_l2_norm(feat: jax.Array, eps: float = 1e-6) -> jax.Array:
    """FeatureL2Norm (:124-131), channel-last."""
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True)
                    + eps)
    return feat / norm


def feature_correlation(fa: jax.Array, fb: jax.Array) -> jax.Array:
    """FeatureCorrelation (:133-147): (N,H,W,C) x2 -> (N,H,W,W*H).

    Channel j of the output indexes feature-A position column-major
    (j = x*H + y), matching the torch flattening order.
    """
    n, h, w, c = fa.shape
    fa_flat = jnp.transpose(fa, (0, 2, 1, 3)).reshape(n, w * h, c)
    fb_flat = fb.reshape(n, h * w, c)
    corr = jnp.einsum("npc,nqc->npq", fb_flat, fa_flat)
    return corr.reshape(n, h, w, w * h)


class FeatureRegression(nn.Module):
    """(:149-180): correlation -> 2*grid_size^2 TPS offsets in [-1,1]."""

    output_dim: int = 18

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)(y)

        for i, (ch, k, s) in enumerate(((512, 4, 2), (256, 4, 2),
                                        (128, 3, 1), (64, 3, 1))):
            x = nn.Conv(ch, (k, k), strides=s, padding=1,
                        name=f"conv{i}")(x)
            x = nn.relu(bn(x, f"bn{i}"))
        # torch flattens channel-major
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return jnp.tanh(nn.Dense(self.output_dim, name="linear")(x))


def affine_grid(theta: jax.Array, size_hw: tuple[int, int]) -> jax.Array:
    """AffineGridGen (:183-196) == F.affine_grid(align_corners=False):
    theta (N,2,3) -> normalized sampling grid (N,H,W,2)."""
    h, w = size_hw
    # align_corners=False base grid: pixel centers
    xs = (jnp.arange(w) + 0.5) * 2.0 / w - 1.0
    ys = (jnp.arange(h) + 0.5) * 2.0 / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H,W,3)
    return jnp.einsum("hwk,nck->nhwc", base, theta)


def _tps_l_inverse(grid_size: int) -> tuple[np.ndarray, np.ndarray]:
    """compute_L_inverse (:255-270) for the regular control grid."""
    ax = np.linspace(-1, 1, grid_size)
    py, px = np.meshgrid(ax, ax)
    px = px.reshape(-1, 1)
    py = py.reshape(-1, 1)
    n = grid_size * grid_size
    d2 = (px - px.T) ** 2 + (py - py.T) ** 2
    d2[d2 == 0] = 1.0
    k = d2 * np.log(d2)
    p = np.concatenate([np.ones((n, 1)), px, py], axis=1)
    l_mat = np.block([[k, p], [p.T, np.zeros((3, 3))]])
    return np.linalg.inv(l_mat).astype(np.float32), \
        np.concatenate([px, py], axis=1).astype(np.float32)


def tps_grid(theta: jax.Array, size_hw: tuple[int, int],
             grid_size: int = 3) -> jax.Array:
    """TpsGridGen (:198-290): theta (N, 2*grid_size^2) control-point
    offsets -> normalized sampling grid (N,H,W,2)."""
    h, w = size_hw
    li, ctrl = _tps_l_inverse(grid_size)
    n_pts = grid_size * grid_size
    qx = theta[:, :n_pts] + ctrl[:, 0]
    qy = theta[:, n_pts:] + ctrl[:, 1]
    wx = jnp.einsum("ij,nj->ni", li[:n_pts, :n_pts], qx)
    wy = jnp.einsum("ij,nj->ni", li[:n_pts, :n_pts], qy)
    ax = jnp.einsum("ij,nj->ni", li[n_pts:, :n_pts], qx)  # (N,3)
    ay = jnp.einsum("ij,nj->ni", li[n_pts:, :n_pts], qy)
    gx, gy = jnp.meshgrid(jnp.linspace(-1, 1, w), jnp.linspace(-1, 1, h))
    d2 = (gx[..., None] - ctrl[:, 0]) ** 2 + \
        (gy[..., None] - ctrl[:, 1]) ** 2
    d2 = jnp.where(d2 == 0, 1.0, d2)
    u = d2 * jnp.log(d2)  # (H,W,n_pts)
    px = ax[:, None, None, 0] + ax[:, None, None, 1] * gx \
        + ax[:, None, None, 2] * gy + jnp.einsum("hwj,nj->nhw", u, wx)
    py = ay[:, None, None, 0] + ay[:, None, None, 1] * gx \
        + ay[:, None, None, 2] * gy + jnp.einsum("hwj,nj->nhw", u, wy)
    return jnp.stack([px, py], axis=-1)


class GMM(nn.Module):
    """Geometric Matching Module (:599-623): (inputA, inputB) ->
    (sampling grid (N,H,W,2), theta)."""

    input_nc: int = 1
    fine_height: int = 256
    fine_width: int = 192
    grid_size: int = 3

    @nn.compact
    def __call__(self, input_a, input_b, train: bool = False):
        fa = FeatureExtraction(name="extractionA")(input_a, train)
        fb = FeatureExtraction(name="extractionB")(input_b, train)
        corr = feature_correlation(feature_l2_norm(fa),
                                   feature_l2_norm(fb))
        theta = FeatureRegression(
            output_dim=2 * self.grid_size ** 2,
            name="regression")(corr, train)
        grid = tps_grid(theta, (self.fine_height, self.fine_width),
                        self.grid_size)
        return grid, theta


def load_gmm_params(sd) -> dict:
    """torch GMM state dict -> GMM variables."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params: dict = {}
    stats: dict = {}
    for ext in ("extractionA", "extractionB"):
        p, s = {}, {}
        # model indices: [conv,relu,bn] then 3x[conv,relu,bn] then
        # [conv,relu,bn] + [conv,relu]
        conv_idx = [0, 3, 6, 9, 12, 15]
        bn_idx = [2, 5, 8, 11, 14]
        for i, t in enumerate(conv_idx):
            p[f"conv{i}"] = tc.conv2d(sd, f"{ext}.model.{t}")
        for i, t in enumerate(bn_idx):
            bp, bs = tc.batchnorm(sd, f"{ext}.model.{t}")
            p[f"bn{i}"] = bp
            s[f"bn{i}"] = bs
        params[ext] = p
        stats[ext] = s
    rp, rs = {}, {}
    for i, t in enumerate((0, 3, 6, 9)):
        rp[f"conv{i}"] = tc.conv2d(sd, f"regression.conv.{t}")
        bp, bs = tc.batchnorm(sd, f"regression.conv.{t + 1}")
        rp[f"bn{i}"] = bp
        rs[f"bn{i}"] = bs
    rp["linear"] = tc.dense(sd, "regression.linear")
    params["regression"] = rp
    stats["regression"] = rs
    return {"params": params, "batch_stats": stats}
