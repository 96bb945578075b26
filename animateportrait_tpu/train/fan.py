"""FAN landmark-detector training: AdaptiveWingLoss's data pipeline and
train/eval loop, TPU-native.

Behavioral reimplementation of
`Module1/thirdparty/AdaptiveWingLoss/core/{dataloader,evaler}.py`:

- ``boundary_groups`` / ``boundary_heatmap``: the AddBoundary transform
  (dataloader.py:25-191) — interpolating B-splines through each facial
  curve (scipy splprep k=min(4,n)-1, s=0), rasterized onto the 64x64
  heatmap grid and turned into a line heatmap by a distance transform
  with gaussian falloff exp(-d^2/2) cut at 3 sigma. (The reference
  rasterizes through a matplotlib figure; here points round straight to
  pixels.)
- ``weight_map``: AddWeightMap (:193-204) — 3x3 grey dilation of each
  GT map, weight 1 where the dilation exceeds 0.2.
- ``make_fan_targets``: GT gaussian heatmaps at landmarks/4 + 1 with
  sigma 1 (:336) + boundary channel + weight maps.
- ``build_fan_train_step``: one jitted step, weighted Adaptive Wing loss
  over all hourglass stacks (loss * (weight_map * w + 1), the paper's
  W=10), Adam.
- ``evaluate_fan``: eval_model's NME accounting (evaler.py:21-128) using
  fan_nme.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animateportrait_tpu.models.fan import (FAN, adaptive_wing_map,
                                            fan_nme,
                                            gaussian_heatmaps)

BOUNDARY_GROUPS_68 = {
    "cheek": list(range(0, 17)),
    "left_eyebrow": list(range(17, 22)),
    "right_eyebrow": list(range(22, 27)),
    "upper_left_eyelid": list(range(36, 40)),
    "lower_left_eyelid": [36, 41, 40, 39],
    "upper_right_eyelid": list(range(42, 46)),
    "lower_right_eyelid": [42, 47, 46, 45],
    "nose": list(range(27, 31)),
    "nose_bot": list(range(31, 36)),
    "upper_outer_lip": list(range(48, 55)),
    "upper_inner_lip": [60, 61, 62, 63, 64],
    "lower_outer_lip": [48, 59, 58, 57, 56, 55, 54],
    "lower_inner_lip": [60, 67, 66, 65, 64],
}

BOUNDARY_GROUPS_98 = {
    "cheek": list(range(0, 33)),
    "left_eyebrow": list(range(33, 38)),
    "right_eyebrow": list(range(42, 47)),
    "upper_left_eyelid": list(range(60, 65)),
    "lower_left_eyelid": [60, 67, 66, 65, 64],
    "upper_right_eyelid": list(range(68, 73)),
    "lower_right_eyelid": [68, 75, 74, 73, 72],
    "nose": list(range(51, 55)),
    "nose_bot": list(range(55, 60)),
    "upper_outer_lip": list(range(76, 83)),
    "upper_inner_lip": [88, 89, 90, 91, 92],
    "lower_outer_lip": [76, 87, 86, 85, 84, 83, 82],
    "lower_inner_lip": [88, 95, 94, 93, 92],
}


def boundary_heatmap(landmarks: np.ndarray, size: int = 64,
                     sigma: float = 1.0) -> np.ndarray:
    """AddBoundary (dataloader.py:25-191): landmarks in image pixels
    (256-space) -> (size, size) boundary-line heatmap."""
    from scipy import interpolate, ndimage

    groups = (BOUNDARY_GROUPS_98 if landmarks.shape[0] >= 98
              else BOUNDARY_GROUPS_68)
    lm64 = np.floor(landmarks[:, :2] / 4.0)
    mask = np.ones((size, size), np.float32)  # 1 = background
    for inds in groups.values():
        pts = lm64[inds]
        # drop consecutive duplicates (:138-147)
        keep = [0]
        for i in range(1, len(pts)):
            if not np.all(pts[i] == pts[keep[-1]]):
                keep.append(i)
        pts = pts[keep]
        if pts.shape[0] == 1:
            pts = np.concatenate([pts, pts + 0.001], axis=0)
        k = min(4, pts.shape[0]) - 1
        tck, _ = interpolate.splprep([pts[:, 0], pts[:, 1]], k=k, s=0)
        out = interpolate.splev(np.arange(0, 1, 0.01), tck, der=0)
        xs = np.clip(np.round(out[0]).astype(int), 0, size - 1)
        ys = np.clip(np.round(out[1]).astype(int), 0, size - 1)
        mask[ys, xs] = 0.0
    dist = ndimage.distance_transform_edt(mask)
    return np.where(dist < 3 * sigma,
                    np.exp(-dist * dist / (2 * sigma * sigma)),
                    0.0).astype(np.float32)


def weight_map(heatmaps: np.ndarray) -> np.ndarray:
    """AddWeightMap (:193-204): (H, W, C) GT maps -> same-shape weights,
    1 where the 3x3 grey dilation exceeds 0.2."""
    from scipy import ndimage

    w = np.zeros_like(heatmaps)
    for c in range(heatmaps.shape[-1]):
        d = ndimage.grey_dilation(heatmaps[..., c], size=(3, 3))
        w[..., c] = (d > 0.2).astype(heatmaps.dtype)
    return w


def make_fan_targets(landmarks: np.ndarray, hm_size: int = 64
                     ) -> tuple[np.ndarray, np.ndarray]:
    """landmarks (P, 2) in 256-space -> (GT heatmaps (hm, hm, P+1),
    weight maps (hm, hm, P+1)); GT at landmarks/4 + 1 with sigma 1
    (:336) plus the boundary channel."""
    p = landmarks.shape[0]
    hm = np.zeros((hm_size, hm_size, p + 1), np.float32)
    hm[..., :p] = np.asarray(gaussian_heatmaps(
        jnp.asarray(landmarks[:, :2] / 4.0 + 1.0), (hm_size, hm_size), 1))
    hm[..., p] = boundary_heatmap(landmarks, size=hm_size)
    return hm, weight_map(hm)


@dataclasses.dataclass(frozen=True)
class FANTrainConfig:
    lr: float = 1e-4
    loss_w: float = 10.0
    num_modules: int = 4
    num_landmarks: int = 98


class FANTrainState(struct.PyTreeNode):
    step: jax.Array
    variables: Any
    opt: Any


def init_fan_state(cfg: FANTrainConfig, rng,
                   size: int = 256) -> tuple[FANTrainState, Any]:
    model = FAN(num_modules=cfg.num_modules,
                num_landmarks=cfg.num_landmarks)
    variables = model.init(rng, jnp.zeros((1, size, size, 3)))
    tx = optax.adam(cfg.lr)
    state = FANTrainState(step=jnp.zeros((), jnp.int32),
                          variables=variables,
                          opt=tx.init(variables["params"]))
    return state, tx


def build_fan_train_step(cfg: FANTrainConfig, tx):
    model = FAN(num_modules=cfg.num_modules,
                num_landmarks=cfg.num_landmarks)

    def loss_fn(params, variables, images, gt, weights):
        # FAN outputs already carry the boundary channel (P+1 maps);
        # BatchNorm runs in train mode with running-stat updates
        (outputs, _), mutated = model.apply(
            {**variables, "params": params}, images, train=True,
            mutable=["batch_stats"])
        loss = 0.0
        for pred in outputs:
            # weighted AWing: per-pixel loss map scaled by (W*mask + 1)
            loss = loss + jnp.mean(
                adaptive_wing_map(pred, gt) * (weights * cfg.loss_w + 1.0))
        return loss, mutated["batch_stats"]

    @jax.jit
    def train_step(state: FANTrainState, images, gt, weights):
        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.variables["params"], state.variables, images, gt,
            weights)
        updates, opt = tx.update(grads, state.opt,
                                 state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        return state.replace(
            step=state.step + 1,
            variables={**state.variables, "params": params,
                       "batch_stats": batch_stats},
            opt=opt), loss

    return train_step


def evaluate_fan(variables, images: np.ndarray, gt_landmarks: np.ndarray,
                 cfg: FANTrainConfig, batch_size: int = 8) -> float:
    """Mean NME over a dataset (evaler.py:21-128)."""
    fwd = _eval_forward(cfg.num_modules, cfg.num_landmarks)
    total, n = 0.0, 0
    for i in range(0, len(images), batch_size):
        xb = np.asarray(images[i:i + batch_size], np.float32)
        k = len(xb)
        if k < batch_size:  # pad the ragged tail to avoid a recompile
            xb = np.concatenate(
                [xb, np.zeros((batch_size - k,) + xb.shape[1:],
                              np.float32)])
        hm = fwd(variables, jnp.asarray(xb))[:k]
        total += float(fan_nme(hm, jnp.asarray(gt_landmarks[i:i + k]),
                               cfg.num_landmarks))
        n += k
    return total / max(n, 1)


@functools.lru_cache(maxsize=4)
def _eval_forward(num_modules: int, num_landmarks: int):
    model = FAN(num_modules=num_modules, num_landmarks=num_landmarks)

    @jax.jit
    def fwd(variables, x):
        outputs, _ = model.apply(variables, x)
        # drop the boundary channel before decoding landmarks
        return outputs[-1][..., :num_landmarks]

    return fwd
