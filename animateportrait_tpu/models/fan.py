"""FAN stacked-hourglass landmark detector (AdaptiveWingLoss variant).

Behavioral reimplementation of
`Module1/thirdparty/AdaptiveWingLoss/core/{models,coord_conv}.py`: CoordConv
stem (x/y/r coordinate channels), pre-activation dense ConvBlocks, depth-4
hourglasses with boundary-aware CoordConv between stacks, and per-stack
(num_landmarks+1)-channel heatmap heads at 64x64. Used by the reference for
98-pt ground truth in the image-translation trainer
(`train_image_translation.py:22-23`) and as our convertible stand-in for
the external `face_alignment` FAN the driver calls
(`main_end2end_module2.py:188`).

`heatmaps_to_landmarks` reproduces `get_preds_fromhm`
(AdaptiveWingLoss/utils/utils.py:259-287) as a vectorized computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


def _add_coords(x, with_r=True, heatmap=None, with_boundary=False):
    """AddCoordsTh (coord_conv.py:8-78), NHWC: xx varies along H, yy along
    W (the reference's convention), both in [-1, 1]."""
    N, H, W, _ = x.shape
    xx = jnp.broadcast_to(
        (jnp.arange(H, dtype=jnp.float32) / (H - 1) * 2 - 1)[:, None],
        (H, W))[None, ..., None]
    yy = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.float32) / (W - 1) * 2 - 1)[None, :],
        (H, W))[None, ..., None]
    xx = jnp.broadcast_to(xx, (N, H, W, 1))
    yy = jnp.broadcast_to(yy, (N, H, W, 1))
    chans = [x, xx, yy]
    if with_r:
        rr = jnp.sqrt(xx ** 2 + yy ** 2)
        chans.append(rr / jnp.max(rr))
    if with_boundary and heatmap is not None:
        b = jnp.clip(heatmap[..., -1:], 0.0, 1.0)
        keep = b > 0.05
        chans.append(jnp.where(keep, xx, 0.0))
        chans.append(jnp.where(keep, yy, 0.0))
    return jnp.concatenate(chans, axis=-1)


class CoordConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    with_r: bool = True
    with_boundary: bool = False

    @nn.compact
    def __call__(self, x, heatmap=None):
        ret = _add_coords(x, self.with_r, heatmap, self.with_boundary)
        last = ret[..., -2:]
        out = nn.Conv(self.features, (self.kernel, self.kernel),
                      strides=self.stride, padding=self.padding,
                      name="conv")(ret)
        return out, last


class FANConvBlock(nn.Module):
    """Pre-activation dense block (models.py:46-90)."""

    out_planes: int

    @nn.compact
    def __call__(self, x):
        o = self.out_planes
        y1 = nn.Conv(o // 2, (3, 3), padding=1, use_bias=False,
                     name="conv1")(nn.relu(_BN(name="bn1")(x)))
        y2 = nn.Conv(o // 4, (3, 3), padding=1, use_bias=False,
                     name="conv2")(nn.relu(_BN(name="bn2")(y1)))
        y3 = nn.Conv(o // 4, (3, 3), padding=1, use_bias=False,
                     name="conv3")(nn.relu(_BN(name="bn3")(y2)))
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        res = x
        if x.shape[-1] != o:
            res = nn.Conv(o, (1, 1), padding=0, use_bias=False,
                          name="down_conv")(
                nn.relu(_BN(name="down_bn")(x)))
        return out + res


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _up2_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FANHourGlass(nn.Module):
    """Depth-4 hourglass with boundary CoordConv (models.py:92-142)."""

    depth: int = 4
    first_one: bool = False

    @nn.compact
    def __call__(self, x, heatmap=None):
        cc = CoordConv(256, with_boundary=not self.first_one,
                       name="coordconv")
        x, last = cc(x, heatmap)

        def level(inp, lv):
            up1 = FANConvBlock(256, name=f"b1_{lv}")(inp)
            low1 = FANConvBlock(256, name=f"b2_{lv}")(_avg_pool2(inp))
            if lv > 1:
                low2 = level(low1, lv - 1)
            else:
                low2 = FANConvBlock(256, name=f"b2_plus_{lv}")(low1)
            low3 = FANConvBlock(256, name=f"b3_{lv}")(low2)
            return up1 + _up2_nearest(low3)

        return level(x, self.depth), last


class FAN(nn.Module):
    """__call__(img (N,256,256,3) in [0,1]) -> (heatmap list, boundary
    channels); each heatmap (N, 64, 64, num_landmarks+1)."""

    num_modules: int = 4
    num_landmarks: int = 98
    end_relu: bool = False

    @nn.compact
    def __call__(self, x):
        x, _ = CoordConv(64, kernel=7, stride=2, padding=3,
                         name="conv1")(x)
        x = nn.relu(_BN(name="bn1")(x))
        x = _avg_pool2(FANConvBlock(128, name="conv2")(x))
        x = FANConvBlock(128, name="conv3")(x)
        x = FANConvBlock(256, name="conv4")(x)

        previous, tmp_out = x, None
        outputs, boundaries = [], []
        for i in range(self.num_modules):
            hg, boundary = FANHourGlass(
                depth=4, first_one=(i == 0), name=f"m{i}")(
                previous, tmp_out)
            ll = FANConvBlock(256, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), padding=0, name=f"conv_last{i}")(ll)
            ll = nn.relu(_BN(name=f"bn_end{i}")(ll))
            tmp_out = nn.Conv(self.num_landmarks + 1, (1, 1), padding=0,
                              name=f"l{i}")(ll)
            if self.end_relu:
                tmp_out = nn.relu(tmp_out)
            outputs.append(tmp_out)
            boundaries.append(boundary)
            if i < self.num_modules - 1:
                ll2 = nn.Conv(256, (1, 1), padding=0, name=f"bl{i}")(ll)
                al = nn.Conv(256, (1, 1), padding=0, name=f"al{i}")(
                    tmp_out)
                previous = previous + ll2 + al
        return outputs, boundaries


def heatmaps_to_landmarks(hm: jax.Array) -> jax.Array:
    """get_preds_fromhm (utils.py:259-287), vectorized.

    hm: (N, H, W, C) heatmaps -> (N, C, 2) landmark coords in heatmap
    pixels (1-based like the reference, then -0.5)."""
    N, H, W, C = hm.shape
    flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(N, C, H * W)
    idx = jnp.argmax(flat, axis=2)
    px = idx % W
    py = idx // W
    # quarter-pixel shift toward the stronger neighbor
    def gather(y, x):
        yc = jnp.clip(y, 0, H - 1)
        xc = jnp.clip(x, 0, W - 1)
        lin = yc * W + xc
        return jnp.take_along_axis(flat, lin[..., None], axis=2)[..., 0]

    dx = jnp.sign(gather(py, px + 1) - gather(py, px - 1))
    dy = jnp.sign(gather(py + 1, px) - gather(py - 1, px))
    interior = ((px > 0) & (px < W - 1) & (py > 0) & (py < H - 1))
    fx = px + 1 + jnp.where(interior, dx * 0.25, 0.0)
    fy = py + 1 + jnp.where(interior, dy * 0.25, 0.0)
    return jnp.stack([fx - 0.5, fy - 0.5], axis=-1)
