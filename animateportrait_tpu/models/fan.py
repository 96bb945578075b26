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
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
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
    def __call__(self, x, train: bool = False):
        o = self.out_planes
        y1 = nn.Conv(o // 2, (3, 3), padding=1, use_bias=False,
                     name="conv1")(nn.relu(_BN(name="bn1")(x, train)))
        y2 = nn.Conv(o // 4, (3, 3), padding=1, use_bias=False,
                     name="conv2")(nn.relu(_BN(name="bn2")(y1, train)))
        y3 = nn.Conv(o // 4, (3, 3), padding=1, use_bias=False,
                     name="conv3")(nn.relu(_BN(name="bn3")(y2, train)))
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        res = x
        if x.shape[-1] != o:
            res = nn.Conv(o, (1, 1), padding=0, use_bias=False,
                          name="down_conv")(
                nn.relu(_BN(name="down_bn")(x, train)))
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
    def __call__(self, x, heatmap=None, train: bool = False):
        cc = CoordConv(256, with_boundary=not self.first_one,
                       name="coordconv")
        x, last = cc(x, heatmap)

        def level(inp, lv):
            up1 = FANConvBlock(256, name=f"b1_{lv}")(inp, train)
            low1 = FANConvBlock(256, name=f"b2_{lv}")(
                _avg_pool2(inp), train)
            if lv > 1:
                low2 = level(low1, lv - 1)
            else:
                low2 = FANConvBlock(256, name=f"b2_plus_{lv}")(low1,
                                                               train)
            low3 = FANConvBlock(256, name=f"b3_{lv}")(low2, train)
            return up1 + _up2_nearest(low3)

        return level(x, self.depth), last


class FAN(nn.Module):
    """__call__(img (N,256,256,3) in [0,1]) -> (heatmap list, boundary
    channels); each heatmap (N, 64, 64, num_landmarks+1)."""

    num_modules: int = 4
    num_landmarks: int = 98
    end_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, _ = CoordConv(64, kernel=7, stride=2, padding=3,
                         name="conv1")(x)
        x = nn.relu(_BN(name="bn1")(x, train))
        x = _avg_pool2(FANConvBlock(128, name="conv2")(x, train))
        x = FANConvBlock(128, name="conv3")(x, train)
        x = FANConvBlock(256, name="conv4")(x, train)

        previous, tmp_out = x, None
        outputs, boundaries = [], []
        for i in range(self.num_modules):
            hg, boundary = FANHourGlass(
                depth=4, first_one=(i == 0), name=f"m{i}")(
                previous, tmp_out, train)
            ll = FANConvBlock(256, name=f"top_m_{i}")(hg, train)
            ll = nn.Conv(256, (1, 1), padding=0, name=f"conv_last{i}")(ll)
            ll = nn.relu(_BN(name=f"bn_end{i}")(ll, train))
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


def draw_gaussian(heatmap: jax.Array, point: jax.Array,
                  sigma: int = 1) -> jax.Array:
    """AdaptiveWingLoss/utils/utils.py:42-81, vectorized.

    Adds a (6*sigma+1)-wide gaussian around ``point`` (x, y) into
    ``heatmap`` (H, W), preserving the reference's 1-indexed placement
    (peak at floor(point) - 1 in 0-indexed pixels) and its border
    behavior (the patch is re-anchored, i.e. shifted, when the window
    crosses the top/left edge), then clips to 1.
    """
    h, w = heatmap.shape
    size = 6 * sigma + 1
    ulx = jnp.floor(jnp.floor(point[0]) - 3 * sigma)
    uly = jnp.floor(jnp.floor(point[1]) - 3 * sigma)
    brx = jnp.floor(jnp.floor(point[0]) + 3 * sigma)
    bry = jnp.floor(jnp.floor(point[1]) + 3 * sigma)
    skip = (ulx > w) | (uly > h) | (brx < 1) | (bry < 1)

    def axis_vals(coords, ul, br, n):
        # patch-row index for image coordinate R (utils.py:52-57); the
        # patch gaussian always has relative sigma 0.25 of its size
        # (_gaussian's default, utils.py:18,51)
        r = coords - jnp.maximum(1.0, ul) + jnp.maximum(1.0, -ul)
        val = jnp.exp(-0.5 * jnp.square((r - 3 * sigma) / (0.25 * size)))
        inside = (coords >= jnp.maximum(1.0, ul) - 1) & \
            (coords < jnp.minimum(br, n))
        return val * inside

    gy = axis_vals(jnp.arange(h, dtype=jnp.float32), uly, bry, h)
    gx = axis_vals(jnp.arange(w, dtype=jnp.float32), ulx, brx, w)
    patch = gy[:, None] * gx[None, :]
    out = jnp.clip(heatmap + patch, None, 1.0)
    return jnp.where(skip, heatmap, out)


def gaussian_heatmaps(points: jax.Array, size_hw: tuple[int, int],
                      sigma: int = 1, boundary: bool = False) -> jax.Array:
    """GT heatmap stack for FAN training: points (N, 2) -> (H, W, N)
    (+1 accumulated boundary channel when ``boundary``)."""
    zero = jnp.zeros(size_hw, jnp.float32)
    maps = jax.vmap(lambda p: draw_gaussian(zero, p, sigma))(points)
    if boundary:
        acc = zero
        for i in range(points.shape[0]):
            acc = draw_gaussian(acc, points[i], sigma)
        maps = jnp.concatenate([maps, acc[None]], axis=0)
    return jnp.transpose(maps, (1, 2, 0))


def adaptive_wing_map(pred: jax.Array, target: jax.Array,
                      omega: float = 14.0, theta: float = 0.5,
                      epsilon: float = 1.0, alpha: float = 2.1
                      ) -> jax.Array:
    """Per-element Adaptive Wing loss map (Wang et al. 2019) — the loss
    the reference's FAN checkpoints were trained with (the
    AdaptiveWingLoss project the reference vendors ships only the trained
    model; the formula is from the paper)."""
    delta = jnp.abs(target - pred)
    a = omega * (1.0 / (1.0 + jnp.power(theta / epsilon,
                                        alpha - target))) * \
        (alpha - target) * jnp.power(theta / epsilon,
                                     alpha - target - 1.0) / epsilon
    c = theta * a - omega * jnp.log1p(jnp.power(theta / epsilon,
                                                alpha - target))
    small = omega * jnp.log1p(jnp.power(delta / epsilon, alpha - target))
    large = a * delta - c
    return jnp.where(delta < theta, small, large)


def adaptive_wing_loss(pred: jax.Array, target: jax.Array,
                       **kw) -> jax.Array:
    """Mean Adaptive Wing loss (see :func:`adaptive_wing_map`)."""
    return jnp.mean(adaptive_wing_map(pred, target, **kw))


_NME_EVAL = {"68", "98", "29", "19"}


def fan_nme(pred_heatmaps: jax.Array, gt_landmarks: jax.Array,
            num_landmarks: int = 68, stride: float = 4.0) -> jax.Array:
    """fan_NME (utils.py:188-223): summed normalized mean error over the
    batch. pred heatmaps (N, H, W, C); gt landmarks (N, C, 2) in image
    pixels (heatmap * stride)."""
    pred = heatmaps_to_landmarks(pred_heatmaps) * stride
    gt = gt_landmarks
    if num_landmarks == 68:
        left = jnp.mean(gt[:, 36:42], axis=1)
        right = jnp.mean(gt[:, 42:48], axis=1)
        norm = jnp.linalg.norm(left - right, axis=-1)
    elif num_landmarks == 98:
        norm = jnp.linalg.norm(gt[:, 60] - gt[:, 72], axis=-1)
    elif num_landmarks == 29:
        norm = jnp.linalg.norm(gt[:, 16] - gt[:, 17], axis=-1)
    elif num_landmarks == 19:
        # last two rows carry the bbox corners (utils.py:214-218)
        lt, rb = gt[:, -2], gt[:, -1]
        norm = jnp.sqrt(jnp.abs(rb[:, 0] - lt[:, 0])
                        * jnp.abs(lt[:, 1] - rb[:, 1]))
        gt = gt[:, :-2]
        pred = pred[:, :gt.shape[1]]
    else:
        raise ValueError(f"num_landmarks must be one of {_NME_EVAL}")
    per = jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=1) / norm
    return jnp.sum(per)
