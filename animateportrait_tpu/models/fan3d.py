"""face_alignment-equivalent FAN: the 68-pt 2D/3D landmark predictor the
reference driver depends on.

The reference's step 2 is the external ``face_alignment`` package:
``FaceAlignment(LandmarksType._3D).get_landmarks`` in
`main_end2end_module2.py:188-193`, and the 2D variant in the dataset builder
`Module1/src/dataset/utils/Av2Flau_Convertor.py:52`. That package is not
vendored by the reference; this module reimplements its network and API
semantics TPU-first (NHWC flax, batched/jittable forward + vectorized
heatmap decode), with converters matching the public face_alignment torch
checkpoint layouts (``2DFAN4``/``3DFAN4`` + ``depth``) so real weights load
mechanically.

Architecture (Bulat & Tzimiropoulos, ICCV 2017 "How far are we from solving
the 2D & 3D Face Alignment problem?"):
  - FAN: 7x7/s2 stem + ConvBlocks to 256ch @64x64, then ``num_modules``
    (shipped: 4) depth-4 hourglass stacks, each emitting 68 heatmap
    channels at 64x64; intermediate supervision feeds back via 1x1 convs.
  - ResNetDepth: ResNet-152-style bottleneck net ([3, 8, 36, 3]) over the
    256x256 crop concatenated with 68 landmark gaussians, regressing 68 z
    values.

API semantics preserved (quirks and all):
  - bbox -> (center, scale): center y shifted up by 0.12*h, scale =
    (w + h) / 195 (the SFD detector's reference_scale).
  - ``transform`` truncates to integer coordinates (torch ``.long()``) both
    for the crop corners and the final image-space landmarks.
  - crop: integer-cropped patch zero-padded at borders, cv2 INTER_LINEAR
    resized to 256.
  - heatmap decode: argmax + quarter-pixel shift toward the stronger
    neighbor, then -0.5 (1-based convention).
  - depth conditioning: gaussians (sigma=2) drawn at the *256-space* 2D
    predictions; z scaled by (200 * scale) / 256.
"""
from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from animateportrait_tpu.io import torch_convert as tc

FA_REFERENCE_SCALE = 195.0  # SFD face detector reference_scale


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class ConvBlockFA(nn.Module):
    """face_alignment models.py ConvBlock: pre-activation 3-branch dense
    block (out/2 + out/4 + out/4 channels concatenated) with a
    BN-ReLU-1x1 shortcut when in != out."""

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
                          name="ds_conv")(nn.relu(_BN(name="ds_bn")(x)))
        return out + res


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _up2_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class HourGlassFA(nn.Module):
    """Depth-4 hourglass (face_alignment HourGlass; no CoordConv, unlike
    the AdaptiveWingLoss variant in models/fan.py)."""

    depth: int = 4
    features: int = 256

    @nn.compact
    def __call__(self, x):
        f = self.features

        def level(inp, lv):
            up1 = ConvBlockFA(f, name=f"b1_{lv}")(inp)
            low1 = ConvBlockFA(f, name=f"b2_{lv}")(_avg_pool2(inp))
            if lv > 1:
                low2 = level(low1, lv - 1)
            else:
                low2 = ConvBlockFA(f, name=f"b2_plus_{lv}")(low1)
            low3 = ConvBlockFA(f, name=f"b3_{lv}")(low2)
            return up1 + _up2_nearest(low3)

        return level(x, self.depth)


class FAN3D(nn.Module):
    """__call__(img (N, 256, 256, 3) RGB in [0, 1]) -> list of
    ``num_modules`` heatmaps, each (N, 64, 64, 68)."""

    num_modules: int = 4
    num_landmarks: int = 68

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_BN(name="bn1")(
            nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1")(x)))
        x = _avg_pool2(ConvBlockFA(128, name="conv2")(x))
        x = ConvBlockFA(128, name="conv3")(x)
        x = ConvBlockFA(256, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlassFA(name=f"m{i}")(previous)
            ll = ConvBlockFA(256, name=f"top_m_{i}")(hg)
            ll = nn.relu(_BN(name=f"bn_end{i}")(
                nn.Conv(256, (1, 1), padding=0, name=f"conv_last{i}")(ll)))
            tmp_out = nn.Conv(self.num_landmarks, (1, 1), padding=0,
                              name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = nn.Conv(256, (1, 1), padding=0, name=f"bl{i}")(ll)
                al = nn.Conv(256, (1, 1), padding=0, name=f"al{i}")(
                    tmp_out)
                previous = previous + ll + al
        return outputs


class BottleneckFA(nn.Module):
    """torchvision-style ResNet bottleneck (expansion 4)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_BN(name="bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)))
        y = nn.relu(_BN(name="bn2")(
            nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(y)))
        y = _BN(name="bn3")(
            nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    name="conv3")(y))
        res = x
        if self.has_downsample:
            res = _BN(name="ds_bn")(
                nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                        use_bias=False, name="ds_conv")(x))
        return nn.relu(y + res)


class ResNetDepth(nn.Module):
    """__call__((N, 256, 256, 71) [rgb/255 ++ 68 gaussians]) -> (N, 68) z.

    face_alignment ResNetDepth: layers [3, 8, 36, 3]; the final AvgPool2d(7)
    on the 8x8 map covers only the top-left 7x7 window (torch floor-mode
    pooling) — replicated exactly.
    """

    layers: tuple[int, ...] = (3, 8, 36, 3)
    num_classes: int = 68

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_BN(name="bn1")(
            nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        inplanes = 64
        for li, (planes, n) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for b in range(n):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or inplanes != planes * 4)
                x = BottleneckFA(planes, stride=s, has_downsample=ds,
                                 name=f"layer{li + 1}_{b}")(x)
                inplanes = planes * 4
        x = jnp.mean(x[:, :7, :7, :], axis=(1, 2))  # AvgPool2d(7) on 8x8
        return nn.Dense(self.num_classes, name="fc")(x)


# ---------------------------------------------------------------------------
# face_alignment API semantics (host side: crop; device side: decode)
# ---------------------------------------------------------------------------

def bbox_to_center_scale(box) -> tuple[np.ndarray, float]:
    """face_alignment api.py: bbox -> (center, scale); center y is lifted
    by 12% of the box height, scale = (w + h) / 195."""
    x1, y1, x2, y2 = (float(v) for v in box[:4])
    center = np.array([x2 - (x2 - x1) / 2.0, y2 - (y2 - y1) / 2.0])
    center[1] = center[1] - (y2 - y1) * 0.12
    scale = (x2 - x1 + y2 - y1) / FA_REFERENCE_SCALE
    return center, scale


def fa_transform(point, center, scale, resolution: float,
                 invert: bool = False) -> np.ndarray:
    """face_alignment utils.transform: maps between original-image space
    and the resolution x resolution crop space. Returns int64 (torch
    ``.long()`` truncation — a deliberate quirk preserved for parity)."""
    h = 200.0 * scale
    t = np.eye(3)
    t[0, 0] = resolution / h
    t[1, 1] = resolution / h
    t[0, 2] = resolution * (-center[0] / h + 0.5)
    t[1, 2] = resolution * (-center[1] / h + 0.5)
    if invert:
        t = np.linalg.inv(t)
    pt = np.array([float(point[0]), float(point[1]), 1.0])
    out = t @ pt
    return np.trunc(out[:2]).astype(np.int64)


def fa_crop(image: np.ndarray, center, scale,
            resolution: int = 256) -> np.ndarray:
    """face_alignment utils.crop: integer-corner crop, zero padding, cv2
    INTER_LINEAR resize to resolution. image: (H, W, 3) uint8 RGB."""
    import cv2

    ul = fa_transform([1, 1], center, scale, resolution, invert=True)
    br = fa_transform([resolution, resolution], center, scale, resolution,
                      invert=True)
    ht, wd = image.shape[:2]
    new_img = np.zeros((int(br[1] - ul[1]), int(br[0] - ul[0]),
                        image.shape[2]), dtype=np.uint8)
    new_x = [int(max(1, -ul[0] + 1)), int(min(br[0], wd) - ul[0])]
    new_y = [int(max(1, -ul[1] + 1)), int(min(br[1], ht) - ul[1])]
    old_x = [int(max(1, ul[0] + 1)), int(min(br[0], wd))]
    old_y = [int(max(1, ul[1] + 1)), int(min(br[1], ht))]
    new_img[new_y[0] - 1: new_y[1], new_x[0] - 1: new_x[1]] = \
        image[old_y[0] - 1: old_y[1], old_x[0] - 1: old_x[1]]
    return cv2.resize(new_img, dsize=(resolution, resolution),
                      interpolation=cv2.INTER_LINEAR)


def decode_heatmaps(hm: jax.Array) -> jax.Array:
    """face_alignment get_preds_fromhm, vectorized: (N, H, W, C) heatmaps
    -> (N, C, 2) sub-pixel peak coords in heatmap space (1-based minus
    0.5, exactly the reference's preds tensor)."""
    N, H, W, C = hm.shape
    flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(N, C, H * W)
    idx = jnp.argmax(flat, axis=2)
    px = idx % W
    py = idx // W

    def gather(y, x):
        lin = jnp.clip(y, 0, H - 1) * W + jnp.clip(x, 0, W - 1)
        return jnp.take_along_axis(flat, lin[..., None], axis=2)[..., 0]

    dx = jnp.sign(gather(py, px + 1) - gather(py, px - 1))
    dy = jnp.sign(gather(py + 1, px) - gather(py - 1, px))
    interior = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    fx = px + 1 + jnp.where(interior, dx * 0.25, 0.0)
    fy = py + 1 + jnp.where(interior, dy * 0.25, 0.0)
    return jnp.stack([fx - 0.5, fy - 0.5], axis=-1)


def draw_gaussian_fa(size_hw: tuple[int, int], points: jax.Array,
                     sigma: int = 2) -> jax.Array:
    """face_alignment utils.draw_gaussian over a fresh zero image,
    vectorized over C points: (C, 2) 1-based coords -> (C, H, W) maps.

    The (6*sigma+1)-wide patch gaussian has relative sigma 0.25 and center
    0.5 of its size (``_gaussian`` defaults), is shifted (not clipped) when
    the window crosses the top/left edge, and the whole draw is skipped
    when the window lies outside the image.
    """
    h, w = size_hw
    spatch = 6 * sigma + 1

    def one(p):
        ulx = jnp.floor(p[0] - 3 * sigma)
        uly = jnp.floor(p[1] - 3 * sigma)
        brx = jnp.floor(p[0] + 3 * sigma)
        bry = jnp.floor(p[1] + 3 * sigma)
        skip = (ulx > w) | (uly > h) | (brx < 1) | (bry < 1)

        def axis_vals(coords, ul, br, n):
            # 1-based patch index for 1-based image coordinate X:
            # G = X - max(1, ul) + max(1, -ul); gaussian center at
            # 0.5 * size + 0.5 (face_alignment _gaussian: mean * width
            # + 0.5 with mean_horz/vert = 0.5)
            g = (coords + 1.0) - jnp.maximum(1.0, ul) + \
                jnp.maximum(1.0, -ul)
            val = jnp.exp(-0.5 * jnp.square(
                (g - (0.5 * spatch + 0.5)) / (0.25 * spatch)))
            inside = ((coords + 1.0) >= jnp.maximum(1.0, ul)) & \
                ((coords + 1.0) <= jnp.minimum(br, n))
            return val * inside

        gy = axis_vals(jnp.arange(h, dtype=jnp.float32), uly, bry, h)
        gx = axis_vals(jnp.arange(w, dtype=jnp.float32), ulx, brx, w)
        patch = jnp.clip(gy[:, None] * gx[None, :], None, 1.0)
        return jnp.where(skip, jnp.zeros((h, w), jnp.float32), patch)

    return jax.vmap(one)(points.astype(jnp.float32))


# ---------------------------------------------------------------------------
# weight converters (face_alignment checkpoint layout)
# ---------------------------------------------------------------------------

def _convblock(sd, pfx: str, in_planes: int, out_planes: int
               ) -> tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = tc.conv2d(sd, f"{pfx}.conv{i}", bias=False)
        params[f"bn{i}"] = {}
        params[f"bn{i}"]["bn"], stats[f"bn{i}"] = {}, {}
        p, s = tc.batchnorm(sd, f"{pfx}.bn{i}")
        params[f"bn{i}"]["bn"] = p
        stats[f"bn{i}"] = {"bn": s}
    if in_planes != out_planes:
        # torch: downsample = Sequential(BN, ReLU, Conv1x1)
        p, s = tc.batchnorm(sd, f"{pfx}.downsample.0")
        params["ds_bn"] = {"bn": p}
        stats["ds_bn"] = {"bn": s}
        params["ds_conv"] = tc.conv2d(sd, f"{pfx}.downsample.2",
                                      bias=False)
    return params, stats


def _bn(sd, pfx: str) -> tuple[dict, dict]:
    p, s = tc.batchnorm(sd, pfx)
    return {"bn": p}, {"bn": s}


def load_fan3d_params(sd, num_modules: int = 4) -> dict:
    """face_alignment 2DFAN4/3DFAN4 torch state dict -> FAN3D variables."""
    sd = tc.strip_module_prefix(sd)
    params: dict = {"conv1": tc.conv2d(sd, "conv1")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for name, i, o in (("conv2", 64, 128), ("conv3", 128, 128),
                       ("conv4", 128, 256)):
        params[name], stats[name] = _convblock(sd, name, i, o)
    for m in range(num_modules):
        hp: dict = {}
        hs: dict = {}
        for lv in range(4, 0, -1):
            for b in (f"b1_{lv}", f"b2_{lv}", f"b3_{lv}"):
                hp[b], hs[b] = _convblock(sd, f"m{m}.{b}", 256, 256)
        hp["b2_plus_1"], hs["b2_plus_1"] = _convblock(
            sd, f"m{m}.b2_plus_1", 256, 256)
        params[f"m{m}"], stats[f"m{m}"] = hp, hs
        params[f"top_m_{m}"], stats[f"top_m_{m}"] = _convblock(
            sd, f"top_m_{m}", 256, 256)
        params[f"conv_last{m}"] = tc.conv2d(sd, f"conv_last{m}")
        params[f"bn_end{m}"], stats[f"bn_end{m}"] = _bn(sd, f"bn_end{m}")
        params[f"l{m}"] = tc.conv2d(sd, f"l{m}")
        if m < num_modules - 1:
            params[f"bl{m}"] = tc.conv2d(sd, f"bl{m}")
            params[f"al{m}"] = tc.conv2d(sd, f"al{m}")
    return {"params": params, "batch_stats": stats}


def load_depth_params(sd, layers: tuple[int, ...] = (3, 8, 36, 3)) -> dict:
    """face_alignment depth (ResNetDepth) state dict -> variables."""
    sd = tc.strip_module_prefix(sd)
    params: dict = {"conv1": tc.conv2d(sd, "conv1", bias=False)}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    inplanes = 64
    for li, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
        stride = 1 if li == 0 else 2
        for b in range(n):
            pfx = f"layer{li + 1}.{b}"
            name = f"layer{li + 1}_{b}"
            bp: dict = {}
            bs: dict = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = tc.conv2d(sd, f"{pfx}.conv{i}",
                                           bias=False)
                bp[f"bn{i}"], bs[f"bn{i}"] = _bn(sd, f"{pfx}.bn{i}")
            s = stride if b == 0 else 1
            if b == 0 and (s != 1 or inplanes != planes * 4):
                bp["ds_conv"] = tc.conv2d(sd, f"{pfx}.downsample.0",
                                          bias=False)
                bp["ds_bn"], bs["ds_bn"] = _bn(sd, f"{pfx}.downsample.1")
            params[name], stats[name] = bp, bs
            inplanes = planes * 4
    params["fc"] = tc.dense(sd, "fc")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# end-to-end predictor (the driver's FaceAlignment(3D).get_landmarks)
# ---------------------------------------------------------------------------

class FaceAlignment3D:
    """bbox-conditioned 68x3 landmark predictor over an aligned photo.

    Replaces the reference driver's
    ``face_alignment.FaceAlignment(LandmarksType._3D)`` call
    (main_end2end_module2.py:188-193). The face box comes from our MTCNN
    detector (the upstream package uses its bundled SFD detector — boxes
    differ slightly; center/scale conversion is identical).

    Without ``depth_variables`` the z column is 0 — harmless for the
    driver path, where ``norm_input_face`` overwrites z with the canonical
    face's (util/utils.py:357: ``shape_3d[:, -1] = face_std[:, -1]*0.1``).
    """

    def __init__(self, fan_variables, depth_variables=None,
                 num_modules: int = 4,
                 depth_layers: tuple[int, ...] = (3, 8, 36, 3)):
        import functools

        self._fan = FAN3D(num_modules=num_modules)
        self._fan_v = fan_variables
        self._depth = (ResNetDepth(layers=depth_layers)
                       if depth_variables is not None else None)
        self._depth_v = depth_variables

        @functools.partial(jax.jit)
        def _fwd(variables, img):  # img (N, 256, 256, 3) in [0, 1]
            hm = self._fan.apply(variables, img)[-1]
            return hm, decode_heatmaps(hm)

        self._fwd = _fwd

        if self._depth is not None:
            @functools.partial(jax.jit)
            def _depth_fwd(variables, img, preds256):
                # gaussians at the 256-space 2D predictions (api.py);
                # points with x <= 0 draw nothing
                def one(pts):
                    maps = draw_gaussian_fa((256, 256), pts, sigma=2)
                    maps = jnp.where((pts[:, 0] > 0)[:, None, None],
                                     maps, 0.0)
                    return jnp.transpose(maps, (1, 2, 0))

                heat = jax.vmap(one)(preds256)
                inp = jnp.concatenate([img, heat], axis=-1)
                return self._depth.apply(variables, inp)

            self._depth_fwd = _depth_fwd

    def landmarks_from_box(self, img_rgb: np.ndarray, box) -> np.ndarray:
        """img_rgb: (H, W, 3) uint8; box: (x1, y1, x2, y2[, score]).
        Returns (68, 3) float64 landmarks in image pixels (x, y truncated
        to ints per the reference's transform; z in the same scale)."""
        center, scale = bbox_to_center_scale(box)
        crop = fa_crop(img_rgb, center, scale)
        inp = crop.astype(np.float32)[None] / 255.0
        hm, preds = self._fwd(self._fan_v, jnp.asarray(inp))
        preds = np.asarray(preds)[0]  # (68, 2) heatmap space
        pts_img = np.stack([
            fa_transform(p, center, scale, hm.shape[1], invert=True)
            for p in preds]).astype(np.float64)
        if self._depth is None:
            z = np.zeros((68, 1))
        else:
            depth = np.asarray(self._depth_fwd(
                self._depth_v, jnp.asarray(inp),
                jnp.asarray(preds[None] * 4.0)))[0]
            z = (depth * (200.0 * scale / 256.0))[:, None]
        return np.concatenate([pts_img, z], axis=1)

    def __call__(self, img_rgb: np.ndarray, boxes) -> list[np.ndarray]:
        """get_landmarks: one (68, 3) array per detected box."""
        return [self.landmarks_from_box(img_rgb, b) for b in boxes]


def make_fan_landmark_fn(fa: FaceAlignment3D, detector):
    """BGR frame -> (68, 3) landmark hook for the end-to-end pipeline and
    the Av2Flau dataset builder: detect with MTCNN, predict with the FAN
    on the first box (the driver takes ``shapes[0]``,
    main_end2end_module2.py:193)."""

    def fn(img_bgr: np.ndarray) -> np.ndarray:
        rgb = np.ascontiguousarray(img_bgr[:, :, ::-1])
        boxes, _ = detector(rgb.astype(np.float32))
        if len(boxes) == 0:
            raise ValueError("no face detected for FAN landmarks")
        return fa.landmarks_from_box(rgb, boxes[0])

    return fn


# checkpoint filenames shipped by the public face_alignment package
FAN_CKPT_NAMES = ("3DFAN4-4a694010b9.zip", "3DFAN4-7835d9f11d.pth.tar",
                  "3DFAN4.pth", "2DFAN4-cd938726ad.zip",
                  "2DFAN4-11f355bf06.pth.tar", "2DFAN4.pth")
DEPTH_CKPT_NAMES = ("depth-6c4283c0e0.zip", "depth-2a464da4ea.pth.tar",
                    "depth.pth")


def find_fan_checkpoints(ckpt_dir: str) -> tuple[str | None, str | None]:
    """Probe <ckpt_dir>[/face_alignment] for FAN / depth checkpoints by
    the public filenames (and a *FAN4*/depth* glob fallback)."""
    import glob
    import os

    roots = [ckpt_dir, os.path.join(ckpt_dir, "face_alignment")]
    fan = depth = None
    for root in roots:
        for n in FAN_CKPT_NAMES:
            p = os.path.join(root, n)
            if fan is None and os.path.exists(p):
                fan = p
        for n in DEPTH_CKPT_NAMES:
            p = os.path.join(root, n)
            if depth is None and os.path.exists(p):
                depth = p
        if fan is None:
            g = sorted(glob.glob(os.path.join(root, "*FAN4*.pth*")))
            fan = g[0] if g else None
        if depth is None:
            g = sorted(glob.glob(os.path.join(root, "depth-*.pth*")))
            depth = g[0] if g else None
    return fan, depth
