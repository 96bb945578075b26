"""MTCNN face-detection cascade, batched XLA re-design.

Reference: MTCNN/{get_nets,first_stage,box_utils,detector}.py. The reference
runs a host-driven image pyramid with dynamic-shape ``np.where`` box lists and
per-stage numpy NMS. Here the whole cascade is fixed-capacity:

- the pyramid scales are computed host-side from the (static) image size;
- each PNet level threshold becomes masked top-K (no dynamic shapes);
- NMS is :func:`animateportrait_tpu.ops.nms.masked_nms` on padded buffers;
- RNet/ONet run on fixed-size batches of bilinear crops sampled directly from
  the device-resident image (no host crop round-trips).

Architecture parity (MTCNN/get_nets.py): PNet 27-55, RNet 75-117,
ONet 120-170, including the pretrained-weight ``Flatten`` transpose(3, 2)
quirk (:22) which is reproduced as an NHWC->NCWH permute before the dense
head. Box arithmetic parity: _generate_bboxes stride 2 / cell 12 / the +1
(first_stage.py:89-96), calibrate/square/round (detector.py:70-73,95-97),
inclusive-coordinate IoU.
"""
from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import PReLU, max_pool_ceil
from animateportrait_tpu.ops.nms import masked_nms, topk_mask
from animateportrait_tpu.ops.warp import sample_bilinear


class PNet(nn.Module):
    """Fully-convolutional proposal net (12x12 eq. window, stride 2)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(10, name="prelu1")(x)
        x = max_pool_ceil(x, 2, 2)
        x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(16, name="prelu2")(x)
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
        x = PReLU(32, name="prelu3")(x)
        offsets = nn.Conv(4, (1, 1), name="conv4_2")(x)
        logits = nn.Conv(2, (1, 1), name="conv4_1")(x)
        probs = jax.nn.softmax(logits, axis=-1)
        return offsets, probs


def _torch_flatten(x):
    """NHWC -> flat in torch (C, W, H) order (get_nets.py:22 quirk)."""
    n = x.shape[0]
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(n, -1)


class RNet(nn.Module):
    """24x24 refinement net."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(28, name="prelu1")(x)
        x = max_pool_ceil(x, 3, 2)
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(48, name="prelu2")(x)
        x = max_pool_ceil(x, 3, 2)
        x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
        x = PReLU(64, name="prelu3")(x)
        x = _torch_flatten(x)
        x = nn.Dense(128, name="conv4")(x)
        x = PReLU(128, name="prelu4")(x)
        offsets = nn.Dense(4, name="conv5_2")(x)
        probs = jax.nn.softmax(nn.Dense(2, name="conv5_1")(x), axis=-1)
        return offsets, probs


class ONet(nn.Module):
    """48x48 output net with 5-point landmarks."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(32, name="prelu1")(x)
        x = max_pool_ceil(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(64, name="prelu2")(x)
        x = max_pool_ceil(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
        x = PReLU(64, name="prelu3")(x)
        x = max_pool_ceil(x, 2, 2)
        x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
        x = PReLU(128, name="prelu4")(x)
        x = _torch_flatten(x)
        x = nn.Dense(256, name="conv5")(x)
        x = PReLU(256, name="prelu5")(x)
        landmarks = nn.Dense(10, name="conv6_3")(x)
        offsets = nn.Dense(4, name="conv6_2")(x)
        probs = jax.nn.softmax(nn.Dense(2, name="conv6_1")(x), axis=-1)
        return landmarks, offsets, probs


# ---------------------------------------------------------------------------
# weight conversion from the reference's .npy dumps
# ---------------------------------------------------------------------------

def _convert_conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def load_pnet_params(npy_path: str) -> dict:
    d = np.load(npy_path, allow_pickle=True)[()]

    def conv(name):
        return {
            "kernel": _convert_conv(d[f"{name}.weight"]),
            "bias": d[f"{name}.bias"],
        }

    def prelu(name):
        return {"alpha": d[f"{name}.weight"]}

    return {
        "params": {
            "conv1": conv("features.conv1"),
            "prelu1": prelu("features.prelu1"),
            "conv2": conv("features.conv2"),
            "prelu2": prelu("features.prelu2"),
            "conv3": conv("features.conv3"),
            "prelu3": prelu("features.prelu3"),
            "conv4_1": conv("conv4_1"),
            "conv4_2": conv("conv4_2"),
        }
    }


def _load_rnet_onet(npy_path: str, convs, denses, prelus) -> dict:
    d = np.load(npy_path, allow_pickle=True)[()]
    params: dict[str, Any] = {}
    for ours, theirs in convs.items():
        params[ours] = {
            "kernel": _convert_conv(d[f"{theirs}.weight"]),
            "bias": d[f"{theirs}.bias"],
        }
    for ours, theirs in denses.items():
        params[ours] = {
            "kernel": d[f"{theirs}.weight"].T,
            "bias": d[f"{theirs}.bias"],
        }
    for ours, theirs in prelus.items():
        params[ours] = {"alpha": d[f"{theirs}.weight"]}
    return {"params": params}


def load_rnet_params(npy_path: str) -> dict:
    return _load_rnet_onet(
        npy_path,
        convs={f"conv{i}": f"features.conv{i}" for i in (1, 2, 3)},
        denses={"conv4": "features.conv4", "conv5_1": "conv5_1",
                "conv5_2": "conv5_2"},
        prelus={**{f"prelu{i}": f"features.prelu{i}" for i in (1, 2, 3, 4)}},
    )


def load_onet_params(npy_path: str) -> dict:
    return _load_rnet_onet(
        npy_path,
        convs={f"conv{i}": f"features.conv{i}" for i in (1, 2, 3, 4)},
        denses={"conv5": "features.conv5", "conv6_1": "conv6_1",
                "conv6_2": "conv6_2", "conv6_3": "conv6_3"},
        prelus={**{f"prelu{i}": f"features.prelu{i}" for i in (1, 2, 3, 4, 5)}},
    )


# ---------------------------------------------------------------------------
# cascade
# ---------------------------------------------------------------------------

def pyramid_scales(height: int, width: int, min_face_size: float = 20.0,
                   min_detection_size: int = 12, factor: float = 0.707
                   ) -> list[float]:
    """Image-pyramid scales (detector.py:30-50); host-side, static."""
    m = min_detection_size / min_face_size
    min_length = min(height, width) * m
    scales = []
    count = 0
    while min_length > min_detection_size:
        scales.append(m * factor**count)
        min_length *= factor
        count += 1
    return scales


def _preprocess(img):
    return (img - 127.5) * 0.0078125


def _crop_resize(img, boxes, size):
    """Sample (K, size, size, 3) crops from img (H, W, 3) at inclusive boxes.

    Reference get_image_boxes pads out-of-image regions with zeros
    (box_utils.py:127-160) and resizes with PIL BILINEAR; here crops are
    bilinearly sampled in one batched gather (zeros padding mode).
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    u = (jnp.arange(size) + 0.5) / size
    sx = x1[:, None] + u[None, :] * w[:, None] - 0.5
    sy = y1[:, None] + u[None, :] * h[:, None] - 0.5
    iy = jnp.broadcast_to(sy[:, :, None], (*sy.shape, size))
    ix = jnp.broadcast_to(sx[:, None, :], (*sx.shape[:1], size, size))
    crops = sample_bilinear(img[None], iy.reshape(1, -1), ix.reshape(1, -1),
                            padding_mode="zeros")
    return crops.reshape(boxes.shape[0], size, size, 3)


def _calibrate(boxes, offsets):
    """detector-style box calibration (box_utils.py:94-125)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w = (x2 - x1 + 1.0)[:, None]
    h = (y2 - y1 + 1.0)[:, None]
    trans = jnp.concatenate([w, h, w, h], axis=1) * offsets
    return boxes + trans


def _to_square(boxes):
    """box_utils.py:71-91."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    h = y2 - y1 + 1.0
    w = x2 - x1 + 1.0
    side = jnp.maximum(h, w)
    nx1 = x1 + w * 0.5 - side * 0.5
    ny1 = y1 + h * 0.5 - side * 0.5
    return jnp.stack([nx1, ny1, nx1 + side - 1.0, ny1 + side - 1.0], axis=1)


class MTCNNDetector:
    """Batched-XLA three-stage cascade.

    Capacities (static): K1 per-scale candidates, K2 RNet boxes, K3 ONet
    boxes. Returns padded arrays plus validity masks.
    """

    def __init__(self, pnet_params, rnet_params, onet_params,
                 k_scale: int = 256, k_stage2: int = 128, k_stage3: int = 32,
                 device: str = "cpu"):
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        self.params = (pnet_params, rnet_params, onet_params)
        self.k_scale, self.k2, self.k3 = k_scale, k_stage2, k_stage3
        self._jit_cache: dict[Any, Any] = {}
        # detection runs ONCE per photo and is ~100 MFLOP, but its ~15
        # per-scale programs cost seconds EACH of per-process program
        # loading over a remote-TPU tunnel (measured 221 s for the first
        # detect of a fresh process with a warm compile cache, 0.2 s
        # after). Defaulting the cascade to the local CPU backend makes
        # program loads local-disk fast and the compute is negligible.
        self._device = None
        if device == "cpu":
            try:
                self._device = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                self._device = None

    # ---- stage 1 ----------------------------------------------------------
    def _stage1_one_scale(self, img, scale, h, w, threshold):
        """PNet at one pyramid level -> padded (K1, 9) candidates + mask."""
        sh, sw = math.ceil(h * scale), math.ceil(w * scale)
        scaled = jax.image.resize(img, (sh, sw, 3), method="linear")
        inp = _preprocess(scaled)[None]
        offsets, probs = self.pnet.apply(self.params[0], inp)
        prob = probs[0, :, :, 1]
        off = offsets[0]
        oh, ow = prob.shape
        flat_p = prob.reshape(-1)
        k = min(self.k_scale, flat_p.shape[0])
        vals, idx = jax.lax.top_k(flat_p, k)
        valid = vals > threshold
        rows = idx // ow
        cols = idx % ow
        stride, cell = 2.0, 12.0
        x1 = jnp.round((stride * cols + 1.0) / scale)
        y1 = jnp.round((stride * rows + 1.0) / scale)
        x2 = jnp.round((stride * cols + 1.0 + cell) / scale)
        y2 = jnp.round((stride * rows + 1.0 + cell) / scale)
        offs = off.reshape(-1, 4)[idx]
        boxes = jnp.stack([x1, y1, x2, y2], axis=1)
        # per-scale NMS@0.5 (first_stage.py:44)
        keep = masked_nms(boxes, vals, valid, 0.5)
        cand = jnp.concatenate([boxes, vals[:, None], offs], axis=1)
        pad = self.k_scale - k
        if pad:
            cand = jnp.pad(cand, ((0, pad), (0, 0)))
            keep = jnp.pad(keep, (0, pad))
        return cand, keep

    def _stage1_all(self, img, scales, h, w, thresholds):
        cands, masks = [], []
        for s in scales:
            c, m = self._stage1_one_scale(img, s, h, w, thresholds[0])
            cands.append(c)
            masks.append(m)
        return jnp.concatenate(cands, axis=0), jnp.concatenate(masks,
                                                               axis=0)

    def _stage23(self, img, cand, mask, thresholds, nms_thresholds):

        # cross-scale NMS on top-K2 survivors
        idx, vmask = topk_mask(cand[:, 4], mask, self.k2)
        cand = cand[idx]
        keep = masked_nms(cand[:, :4], cand[:, 4], vmask, nms_thresholds[0])
        boxes = _calibrate(cand[:, :4], cand[:, 5:9])
        boxes = jnp.round(_to_square(boxes))
        scores = cand[:, 4]
        valid = keep

        # ---- stage 2 ----
        crops = _crop_resize(img, boxes, 24)
        off2, p2 = self.rnet.apply(self.params[1], _preprocess(crops))
        scores = p2[:, 1]
        valid = valid & (scores > thresholds[1])
        keep = masked_nms(boxes, scores, valid, nms_thresholds[1])
        boxes = _calibrate(boxes, off2)
        boxes = jnp.round(_to_square(boxes))
        valid = keep

        # ---- stage 3 ----
        idx, vmask = topk_mask(scores, valid, self.k3)
        boxes3 = boxes[idx]
        crops = _crop_resize(img, boxes3, 48)
        lm3, off3, p3 = self.onet.apply(self.params[2], _preprocess(crops))
        scores3 = p3[:, 1]
        valid3 = vmask & (scores3 > thresholds[2])
        bw = boxes3[:, 2] - boxes3[:, 0] + 1.0
        bh = boxes3[:, 3] - boxes3[:, 1] + 1.0
        lmx = boxes3[:, 0:1] + bw[:, None] * lm3[:, 0:5]
        lmy = boxes3[:, 1:2] + bh[:, None] * lm3[:, 5:10]
        landmarks = jnp.concatenate([lmx, lmy], axis=1)
        boxes3 = _calibrate(boxes3, off3)
        keep = masked_nms(boxes3, scores3, valid3, nms_thresholds[2],
                          mode="min")
        out_boxes = jnp.concatenate([boxes3, scores3[:, None]], axis=1)
        return out_boxes, landmarks, keep

    def _detect(self, img, scales, h, w, thresholds, nms_thresholds):
        cand, mask = self._stage1_all(img, scales, h, w, thresholds)
        return self._stage23(img, cand, mask, thresholds, nms_thresholds)

    def __call__(self, img: np.ndarray, min_face_size: float = 20.0,
                 thresholds=(0.6, 0.7, 0.8),
                 nms_thresholds=(0.7, 0.7, 0.7)):
        """Detect faces in an (H, W, 3) uint8/float RGB image.

        Returns (boxes (k, 5), landmarks (k, 10)) numpy arrays of the
        surviving detections (like MTCNN/detector.py:16-128).

        Stage 1 compiles one small program per pyramid level and stages
        2/3 compile once per (thresholds,) — a whole-cascade monolith took
        ~19 min to compile over the remote-TPU tunnel; split programs
        compile in seconds each and land in the persistent cache.
        """
        import contextlib

        ctx = (jax.default_device(self._device) if self._device is not None
               else contextlib.nullcontext())
        with ctx:
            return self._detect_host(img, min_face_size, thresholds,
                                     nms_thresholds)

    def _detect_host(self, img, min_face_size, thresholds, nms_thresholds):
        h, w = img.shape[:2]
        scales = tuple(pyramid_scales(h, w, min_face_size))
        img_j = jnp.asarray(img, jnp.float32)

        cands, masks = [], []
        for s in scales:
            k1 = ("s1", h, w, s, thresholds[0])
            if k1 not in self._jit_cache:
                self._jit_cache[k1] = jax.jit(
                    lambda im, s=s: self._stage1_one_scale(
                        im, s, h, w, thresholds[0]))
            c, m = self._jit_cache[k1](img_j)
            cands.append(c)
            masks.append(m)
        cand = jnp.concatenate(cands, axis=0)
        mask = jnp.concatenate(masks, axis=0)

        k23 = ("s23", h, w, cand.shape[0], tuple(thresholds),
               tuple(nms_thresholds))
        if k23 not in self._jit_cache:
            self._jit_cache[k23] = jax.jit(
                lambda im, c, m: self._stage23(im, c, m, thresholds,
                                               nms_thresholds))
        boxes, lms, keep = self._jit_cache[k23](img_j, cand, mask)
        keep = np.asarray(keep)
        return np.asarray(boxes)[keep], np.asarray(lms)[keep]
