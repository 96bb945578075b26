"""face_of_art heatmap-network trainer + artistic augmentation.

TPU-native rebuild of the reference's FOA *training* subsystem — the
part that produces the artistic-landmark checkpoints consumed by
``models/face_of_art.py``:

- geometric artistic deformation of 68-pt ibug landmarks
  (ref ``Module1/thirdparty/face_of_art/deformation_functions.py``),
- the augmentation stack texture -> geometric -> basic
  (ref ``menpo_functions.py:158-238,260-283``; order per
  ``load_menpo_image_list``, :279-283),
- approximate gaussian GT heatmaps at full and quarter resolution
  (ref ``data_loading_functions.py:31-160``),
- the L2 primary/fusion/upsample training step with Adam + staircase
  exponential lr decay (ref ``deep_heatmaps_model_fusion_net.py:338-494``).

Design: per-item augmentation is host-side numpy with an injected
``np.random.Generator`` (the reference uses the global ``np.random``
state; draw *order* therefore differs, distributions match). The TPS
image warp and the GT heatmap rendering are jitted device code reusing
``ops/tps.py`` / dense masked gaussians — no menpo, no per-landmark
host loops.
"""
from __future__ import annotations

import dataclasses
import functools
import glob
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animateportrait_tpu.models.face_of_art import ArtisticHeatmapNet

# ibug-68 part index groups (menpo_functions.py:12-20)
JAW = np.arange(0, 17)
LBROW = np.arange(17, 22)
RBROW = np.arange(22, 27)
NOSE = np.arange(27, 36)
LEYE = np.arange(36, 42)
REYE = np.arange(42, 48)
MOUTH = np.arange(48, 68)


# --------------------------------------------------------------------
# geometric artistic deformation (deformation_functions.py)
# all landmark arrays are (68, 2) in menpo (y, x) pixel order
# --------------------------------------------------------------------

def deform_part(lms: np.ndarray, inds: np.ndarray, scale_y: float = 1.0,
                scale_x: float = 1.0, shift_ver: float = 0.0,
                shift_horiz: float = 0.0) -> np.ndarray:
    """Scale a part about its own mean, then translate it
    (deformation_functions.py:4-20)."""
    part = lms[inds].astype(np.float64)
    mean = part.mean(0)
    part = (part - mean) * np.array([scale_y, scale_x]) + mean
    part = part + np.array([shift_ver, shift_horiz])
    out = lms.copy()
    out[inds] = part
    return out


def _part_bounds(lms: np.ndarray) -> np.ndarray:
    """[[x_min, x_max], [y_min, y_max]] of a point set
    (deformation_functions.py:363-366)."""
    ymin, xmin = lms.min(0)
    ymax, xmax = lms.max(0)
    return np.array([[xmin, xmax], [ymin, ymax]])


def check_deformation_spatial_errors(def_lms: np.ndarray,
                                     inds: np.ndarray,
                                     pad: int = 0) -> bool:
    """True when any *other* landmark falls strictly inside the
    (rounded, pad-shrunk) bounding box of the deformed part
    (deformation_functions.py:369-386)."""
    part = def_lms[inds]
    others = np.round(np.delete(def_lms, inds, axis=0).reshape(-1, 2))
    b = np.round(_part_bounds(part))
    b[:, 0] += pad
    b[:, 1] -= pad
    in_y = (others[:, 0] > b[1, 0]) & (others[:, 0] < b[1, 1])
    in_x = (others[:, 1] > b[0, 0]) & (others[:, 1] < b[0, 1])
    return bool(np.any(in_y & in_x))


def _scale_about_mean(lms, inds, rng, lo, x_lim, y_lim, cap,
                      err_ind_groups, pad, scale_x_range=None):
    """Shared scale machinery: draw (scale_y, scale_x) so the scaled
    part stays inside the [y_lim, x_lim] = (min, max) corridors, apply,
    and revert on a spatial-error check. ``scale_x_range`` overrides the
    corridor-derived x cap (the nose draws scale_x ~ U(0.7, 1.5)
    outright, deformation_functions.py:131)."""
    part = lms[inds]
    mean = part.mean(0)
    rel = part - mean
    ry0, rx0 = rel.min(0)
    ry1, rx1 = rel.max(0)
    smax_y = min((y_lim[0] - mean[0]) / ry0, (y_lim[1] - mean[0]) / ry1)
    if cap is not None:
        smax_y = min(smax_y, cap)
    scale_y = rng.uniform(lo, smax_y)
    if scale_x_range is not None:
        scale_x = rng.uniform(*scale_x_range)
    else:
        smax_x = min((x_lim[0] - mean[1]) / rx0,
                     (x_lim[1] - mean[1]) / rx1)
        if cap is not None:
            smax_x = min(smax_x, cap)
        scale_x = rng.uniform(lo, smax_x)
    out = deform_part(lms, inds, scale_y=scale_y, scale_x=scale_x)
    if any(check_deformation_spatial_errors(out, g, pad=pad)
           for g in err_ind_groups):
        return lms.copy()
    return out


def _shift_within(lms, inds, rng, x_lim, y_lim, err_ind_groups, pad,
                  x_bound_rows=None):
    """Shared shift machinery: draw a translation keeping the part's
    bounds inside the corridors, apply, revert on error.
    ``x_bound_rows`` restricts which rows define the part's x extent
    (the nose uses only its 4 bridge points — the reference's
    2-vector-bound quirk at deformation_functions.py:150-156 reduces to
    exactly this, since the [0]-component of its uniform draw is
    multiplied away in deform_part)."""
    part = lms[inds]
    mean = part.mean(0)
    rel = part - mean
    ry0, ry1 = rel[:, 0].min(), rel[:, 0].max()
    xr = rel if x_bound_rows is None else rel[x_bound_rows]
    rx0, rx1 = xr[:, 1].min(), xr[:, 1].max()
    shift_x = rng.uniform(x_lim[0] - (mean[1] + rx0),
                          x_lim[1] - (mean[1] + rx1))
    shift_y = rng.uniform(y_lim[0] - (mean[0] + ry0),
                          y_lim[1] - (mean[0] + ry1))
    out = deform_part(lms, inds, shift_ver=shift_y, shift_horiz=shift_x)
    if any(check_deformation_spatial_errors(out, g, pad=pad)
           for g in err_ind_groups):
        return lms.copy()
    return out


def deform_mouth(lms: np.ndarray, rng: np.random.Generator,
                 p_scale: float = 0.0, p_shift: float = 0.0,
                 pad: int = 5) -> np.ndarray:
    """deformation_functions.py:23-95."""
    jaw_mid = lms[JAW[4:-4]]
    x_max = (lms[MOUTH, 1].max()
             + (jaw_mid[:, 1].max() - lms[MOUTH, 1].max()) * 0.5 - pad)
    x_min = (jaw_mid[:, 1].min()
             + (lms[MOUTH, 1].min() - jaw_mid[:, 1].min()) * 0.5 + pad)
    y_min = (lms[NOSE, 0].max()
             + (lms[MOUTH, 0].min() - lms[NOSE, 0].max()) * 0.5)
    max_jaw = min(lms[JAW, 0].max(), lms[8, 0])
    y_max = max_jaw - (max_jaw - lms[MOUTH, 0].max()) * 0.5 - pad

    scale_draw = rng.random()
    out = lms.copy()
    if p_scale > 0.5 and scale_draw > 0.5:
        out = _scale_about_mean(out, MOUTH, rng, 0.7, (x_min, x_max),
                                (y_min, y_max), 1.2, [MOUTH], pad)
    if p_shift > 0.5 and (rng.random() > 0.5 or not scale_draw):
        out = _shift_within(out, MOUTH, rng, (x_min, x_max),
                            (y_min, y_max), [MOUTH], pad)
    return out


def deform_nose(lms: np.ndarray, rng: np.random.Generator,
                p_scale: float = 0.0, p_shift: float = 0.0,
                pad: int = 5) -> np.ndarray:
    """deformation_functions.py:98-170. Bridge = nose[:4]; error checks
    split bridge/base; y_max keeps the reference's degenerate
    ``+ (...) * 0`` term (:115)."""
    bridge, base = NOSE[:4], NOSE[4:]
    x_max = (lms[bridge, 1].max()
             + (lms[REYE, 1].min() - lms[bridge, 1].max()) * 0.5 - pad)
    x_min = (lms[LEYE, 1].max()
             + (lms[bridge, 1].min() - lms[LEYE, 1].max()) * 0.5 + pad)
    max_brows = lms[21:23, 0].max()
    y_min = (lms[NOSE, 0].min()
             + (max_brows - lms[NOSE, 0].min()) * 0.5)
    y_max = lms[NOSE, 0].max() - pad

    scale_draw = rng.random()
    out = lms.copy()
    if p_scale > 0.5 and scale_draw > 0.5:
        out = _scale_about_mean(out, NOSE, rng, 0.7, None,
                                (y_min, y_max), None, [bridge, base],
                                pad, scale_x_range=(0.7, 1.5))
    if p_shift > 0.5 and (rng.random() > 0.5 or not scale_draw):
        out = _shift_within(out, NOSE, rng, (x_min, x_max),
                            (y_min, y_max), [bridge, base], pad,
                            x_bound_rows=slice(0, 4))
    return out


def deform_eyes(lms: np.ndarray, rng: np.random.Generator,
                p_scale: float = 0.0, p_shift: float = 0.0,
                pad: int = 10) -> np.ndarray:
    """deformation_functions.py:172-303: both eye+brow groups scale by
    one shared factor (the min of the two sides' corridors, capped at
    1.5); shifts are drawn per side."""
    right = np.hstack([RBROW, REYE])
    left = np.hstack([LBROW, LEYE])

    def corridors(part_inds, side):
        if side == "right":
            x_max = (lms[part_inds, 1].max()
                     + (lms[16, 1] - lms[part_inds, 1].max()) * 0.5 - pad)
            x_min = (lms[NOSE[:4], 1].max()
                     + (lms[part_inds, 1].min()
                        - lms[NOSE[:4], 1].max()) * 0.5 + pad)
        else:
            x_max = (lms[part_inds, 1].max()
                     + (lms[NOSE[:4], 1].min()
                        - lms[part_inds, 1].max()) * 0.5 - pad)
            x_min = (lms[0, 1]
                     + (lms[part_inds, 1].min() - lms[0, 1]) * 0.5 + pad)
        y_max = (lms[part_inds, 0].max()
                 + (lms[33, 0] - lms[part_inds, 0].max()) * 0.25 - pad)
        y_min = 2 * pad
        return (x_min, x_max), (y_min, y_max)

    (xr, yr) = corridors(right, "right")
    (xl, yl) = corridors(left, "left")

    def side_caps(part_inds, x_lim, y_lim):
        part = lms[part_inds]
        mean = part.mean(0)
        rel = part - mean
        ry0, rx0 = rel.min(0)
        ry1, rx1 = rel.max(0)
        sy = min((y_lim[0] - mean[0]) / ry0,
                 (y_lim[1] - mean[0]) / ry1, 1.5)
        sx = min((x_lim[0] - mean[1]) / rx0,
                 (x_lim[1] - mean[1]) / rx1, 1.5)
        return sy, sx

    scale_draw = rng.random()
    out = lms.copy()
    if p_scale > 0.5 and scale_draw > 0.5:
        sy_r, sx_r = side_caps(right, xr, yr)
        sy_l, sx_l = side_caps(left, xl, yl)
        scale_y = rng.uniform(0.8, min(sy_l, sy_r))
        scale_x = rng.uniform(0.8, min(sx_l, sx_r))
        cand = deform_part(out, right, scale_y=scale_y, scale_x=scale_x)
        cand = deform_part(cand, left, scale_y=scale_y, scale_x=scale_x)
        err = (check_deformation_spatial_errors(cand, right, pad=pad)
               or check_deformation_spatial_errors(cand, left, pad=pad))
        out = out if err else cand

    if p_shift > 0.5 and (rng.random() > 0.5 or not scale_draw):
        # post-scale y floor (deformation_functions.py:261-262)
        yr2 = (max(0.8 * out[right, 0].min(), pad), yr[1])
        yl2 = (max(0.8 * out[left, 0].min(), pad), yl[1])
        out = _shift_within(out, right, rng, xr, yr2, [right], pad)
        out = _shift_within(out, left, rng, xl, yl2, [left], pad)
    return out


def deform_scale_face(lms: np.ndarray, rng: np.random.Generator,
                      p_scale: float = 0.0, pad: int = 5,
                      image_size: int = 256) -> np.ndarray:
    """Whole-face scale / aspect change (deformation_functions.py:306-350).
    Error rule differs from the parts: any coordinate out of the canvas,
    or two landmarks landing on the same integer pixel."""
    if not p_scale > 0.5:
        return lms.copy()
    all_inds = np.arange(68)
    x_max = (lms[:, 1].max()
             + (image_size - lms[:, 1].max()) * 0.5 - pad)
    x_min = lms[:, 1].min() * 0.5 + pad
    y_min = 2 * pad
    y_max = (lms[:, 0].max()
             + (image_size - lms[:, 0].max()) * 0.5 - pad)

    mean = lms.mean(0)
    rel = lms - mean
    ry0, rx0 = rel.min(0)
    ry1, rx1 = rel.max(0)
    smax_y = min((y_min - mean[0]) / ry0, (y_max - mean[0]) / ry1, 1.2)
    smax_x = min((x_min - mean[1]) / rx0, (x_max - mean[1]) / rx1, 1.2)
    out = deform_part(lms, all_inds, scale_y=rng.uniform(0.6, smax_y),
                      scale_x=rng.uniform(0.6, smax_x))
    oob = np.sum(out >= image_size) + np.sum(out < 0)
    dup = len(np.unique(out.astype(int), axis=0)) != len(out)
    return lms.copy() if (oob or dup) else out


def deform_face_geometric_style(lms: np.ndarray,
                                rng: np.random.Generator,
                                p_scale: float = 0.0,
                                p_shift: float = 0.0) -> np.ndarray:
    """Full geometric-style chain, all pads forced to 0
    (deformation_functions.py:353-360)."""
    out = deform_scale_face(lms.copy(), rng, p_scale=p_scale, pad=0)
    out = deform_nose(out, rng, p_scale=p_scale, p_shift=p_shift, pad=0)
    out = deform_mouth(out, rng, p_scale=p_scale, p_shift=p_shift, pad=0)
    out = deform_eyes(out, rng, p_scale=p_scale, p_shift=p_shift, pad=0)
    return out


# --------------------------------------------------------------------
# image-space augmentation (menpo_functions.py:158-238)
# images are (H, W, C) float in [0, 1]; landmarks (68, 2) (y, x)
# --------------------------------------------------------------------

def warp_image_tps(image: np.ndarray, lms_yx: np.ndarray,
                   new_lms_yx: np.ndarray) -> np.ndarray:
    """Warp so the content at ``lms_yx`` appears at ``new_lms_yx`` —
    menpo ``ThinPlateSplines(new, old)`` + ``warp_to_shape`` with
    constant (zero) fill (menpo_functions.py:228-238). Same r^2 log r
    kernel as the reference's sparse_image_warp; runs on device via
    ``ops/tps.py``."""
    from animateportrait_tpu.ops.tps import sparse_image_warp

    warped, _ = sparse_image_warp(
        jnp.asarray(image, jnp.float32)[None],
        jnp.asarray(lms_yx, jnp.float32)[None],
        jnp.asarray(new_lms_yx, jnp.float32)[None])
    return np.asarray(warped[0])


def augment_geom(image: np.ndarray, lms_yx: np.ndarray,
                 rng: np.random.Generator, p_geom: float
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Geometric artistic augmentation: deform the landmarks, TPS-warp
    the image to them (menpo_functions.py:217-225). ``p_geom`` is
    binarized per-item like the reference (:263-264)."""
    p = 1.0 * (rng.random() < p_geom)
    if not p > 0.5:
        return image, lms_yx
    new_lms = deform_face_geometric_style(lms_yx.copy(), rng,
                                          p_scale=p, p_shift=p)
    try:
        return warp_image_tps(image, lms_yx, new_lms), new_lms
    except Exception:  # singular spline solve: keep the original
        return image, lms_yx


def augment_texture(image: np.ndarray, img_path: str, img_dir_ns: str,
                    rng: np.random.Generator, p_texture: float
                    ) -> np.ndarray:
    """Texture-style augmentation: swap in a pre-stylized copy
    ``<stem>_ns*`` from ``img_dir_ns`` (menpo_functions.py:202-215)."""
    p = 1.0 * (rng.random() < p_texture)
    if not p > 0.5 or not img_dir_ns:
        return image
    stem = os.path.basename(img_path).split(".")[0]
    variants = sorted(glob.glob(os.path.join(img_dir_ns, stem + "_ns*")))
    if not variants:
        return image
    import cv2

    pick = variants[int(rng.integers(0, len(variants)))]
    ns = cv2.imread(pick, cv2.IMREAD_COLOR)[:, :, ::-1]
    return ns.astype(np.float32) / 255.0


def augment_basic(image: np.ndarray, lms_yx: np.ndarray,
                  rng: np.random.Generator, image_size: int = 256,
                  crop_size: int | None = None, angle_range: float = 30.0,
                  flip: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Basic augmentation: random crop -> random flip -> random rotation
    (always, with canvas expansion like menpo) -> resize back
    (menpo_functions.py:158-201; rotation/crop always on per ECT).
    ``crop_size`` defaults to the reference's 256->248 margin scaled to
    ``image_size``."""
    import cv2

    from animateportrait_tpu.data.umlvd_ifw import FLIP_REMAP

    if crop_size is None:
        crop_size = image_size - 8

    img = np.asarray(image, np.float32)
    lms = np.asarray(lms_yx, np.float64).copy()

    y0, x0 = rng.integers(0, image_size - crop_size, 2)
    img = img[y0:y0 + crop_size, x0:x0 + crop_size]
    lms -= np.array([y0, x0])

    if flip and rng.random() > 0.5:
        img = img[:, ::-1]
        lms[:, 1] = img.shape[1] - lms[:, 1]
        lms = lms[FLIP_REMAP]

    angle = 2.0 * angle_range * rng.random() - angle_range
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D(((w - 1) / 2.0, (h - 1) / 2.0),
                                angle, 1.0)
    cos_a, sin_a = abs(m[0, 0]), abs(m[0, 1])
    nw = int(h * sin_a + w * cos_a)
    nh = int(h * cos_a + w * sin_a)
    m[0, 2] += nw / 2.0 - (w - 1) / 2.0
    m[1, 2] += nh / 2.0 - (h - 1) / 2.0
    img = cv2.warpAffine(img, m, (nw, nh))
    pts_xy = lms[:, ::-1]
    pts_xy = pts_xy @ m[:, :2].T + m[:, 2]
    lms = pts_xy[:, ::-1]

    sy, sx = image_size / img.shape[0], image_size / img.shape[1]
    img = cv2.resize(img, (image_size, image_size),
                     interpolation=cv2.INTER_LINEAR)
    lms *= np.array([sy, sx])
    return np.ascontiguousarray(img), lms


def augment_foa_item(image: np.ndarray, lms_yx: np.ndarray,
                     rng: np.random.Generator, img_path: str = "",
                     img_dir_ns: str = "", p_texture: float = 0.0,
                     p_geom: float = 0.0, basic: bool = True,
                     image_size: int = 256
                     ) -> tuple[np.ndarray, np.ndarray]:
    """One training item through the reference's augmentation order:
    texture -> geometric -> basic (menpo_functions.py:279-283)."""
    if p_texture > 0:
        image = augment_texture(image, img_path, img_dir_ns, rng,
                                p_texture)
    if p_geom > 0:
        image, lms_yx = augment_geom(image, lms_yx, rng, p_geom)
    if basic:
        image, lms_yx = augment_basic(image, lms_yx, rng,
                                      image_size=image_size)
    return image, lms_yx


# --------------------------------------------------------------------
# GT heatmaps (data_loading_functions.py:31-160)
# --------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("size", "sigma",
                                             "win_mult"))
def approx_gaussian_heatmaps(lms_yx: jax.Array, size: int,
                             sigma: float = 6.0,
                             win_mult: float = 3.33335) -> jax.Array:
    """(..., 68, 2) int-cast landmarks -> (..., size, size, 68) windowed
    gaussians, amplitude (8/3)*sigma ("same as in ECT"). Dense masked
    evaluation — exactly the reference's clipped patch paste
    (create_approx_heat_maps_alloc_once) without the per-landmark host
    loop; edge clipping falls out of the mask."""
    win = int(win_mult * sigma)
    lm = jnp.minimum(lms_yx, size - 1).astype(jnp.int32)
    r = jnp.arange(size, dtype=jnp.int32)
    dy = r - lm[..., 0:1]                      # (..., 68, size)
    dx = r - lm[..., 1:2]
    amp = (8.0 / 3.0) / np.sqrt(2.0 * np.pi)   # (8/3)σ · 1/(√(2π)σ)
    gy = jnp.exp(-0.5 * jnp.square(dy / sigma)) * (jnp.abs(dy) <= win)
    gx = jnp.exp(-0.5 * jnp.square(dx / sigma)) * (jnp.abs(dx) <= win)
    maps = amp * gy[..., :, None] * gx[..., None, :]
    return jnp.moveaxis(maps, -3, -1)          # channels last


def make_foa_targets(lms_yx: np.ndarray, image_size: int = 256,
                     sigma: float = 6.0, win_mult: float = 3.33335
                     ) -> tuple[np.ndarray, np.ndarray]:
    """(GT maps_small (S/4, S/4, 68), maps (S, S, 68)) for one item —
    the small maps use landmarks/4 and sigma/4
    (load_images_landmarks_approx_maps_alloc_once:126-154)."""
    lms = np.asarray(lms_yx, np.float64)
    large = approx_gaussian_heatmaps(
        jnp.asarray(lms), image_size, sigma=sigma, win_mult=win_mult)
    small = approx_gaussian_heatmaps(
        jnp.asarray(lms / 4.0), image_size // 4, sigma=sigma / 4.0,
        win_mult=win_mult)
    return np.asarray(small), np.asarray(large)


# --------------------------------------------------------------------
# training step (deep_heatmaps_model_fusion_net.py:338-494)
# --------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FOATrainConfig:
    lr: float = 1e-3
    lr_step: int = 100000          # staircase exponential decay
    gamma: float = 0.1
    adam: bool = True
    momentum: float = 0.95
    l_weight_primary: float = 1.0
    l_weight_fusion: float = 1.0
    l_weight_upsample: float = 3.0
    reg: float = 0.0               # L2 on non-bias weights
    num_landmarks: int = 68


class FOATrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt: Any


def _make_tx(cfg: FOATrainConfig):
    sched = optax.exponential_decay(cfg.lr, cfg.lr_step, cfg.gamma,
                                    staircase=True)
    if cfg.adam:
        return optax.adam(sched)
    return optax.sgd(sched, momentum=cfg.momentum)


def init_foa_state(cfg: FOATrainConfig, rng, size: int = 256
                   ) -> FOATrainState:
    model = ArtisticHeatmapNet(num_landmarks=cfg.num_landmarks)
    variables = model.init(rng, jnp.zeros((1, size, size, 3)))
    return FOATrainState(step=jnp.zeros((), jnp.int32),
                         params=variables["params"],
                         opt=_make_tx(cfg).init(variables["params"]))


def build_foa_train_step(cfg: FOATrainConfig):
    model = ArtisticHeatmapNet(num_landmarks=cfg.num_landmarks)
    tx = _make_tx(cfg)

    def loss_fn(params, images, maps_small, maps):
        primary, fusion, up = model.apply({"params": params}, images)
        l2_primary = jnp.mean(jnp.square(primary - maps_small))
        l2_fusion = jnp.mean(jnp.square(fusion - maps_small))
        l2_upsample = jnp.mean(jnp.square(up - maps))
        total = 1000.0 * (cfg.l_weight_primary * l2_primary
                          + cfg.l_weight_fusion * l2_fusion
                          + cfg.l_weight_upsample * l2_upsample)
        if cfg.reg > 0:
            # tf.nn.l2_loss (= sum(x^2)/2) over every non-bias variable
            total += cfg.reg * sum(
                0.5 * jnp.sum(jnp.square(x))
                for p, x in jax.tree_util.tree_leaves_with_path(params)
                if "bias" not in jax.tree_util.keystr(p))
        return total, {"l2_primary": l2_primary, "l2_fusion": l2_fusion,
                       "l2_upsample": l2_upsample, "total": total}

    @jax.jit
    def train_step(state: FOATrainState, images, maps_small, maps):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, maps_small, maps)
        updates, opt = tx.update(grads, state.opt, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt=opt), losses

    return train_step


# --------------------------------------------------------------------
# NME eval + training driver
# (deep_heatmaps_model_fusion_net.py:340-361,495-720;
#  train_heatmaps_network.py)
# --------------------------------------------------------------------

def nme_norm_eyes(pred_yx: np.ndarray, gt_yx: np.ndarray) -> np.ndarray:
    """Per-image mean landmark error normalized by the GT inter-pupil
    distance (eye-center means of points 36-41 / 42-47;
    deep_heatmaps_model_fusion_net.py:340-361)."""
    pred = np.asarray(pred_yx, np.float64)
    gt = np.asarray(gt_yx, np.float64)
    err = np.mean(np.sqrt(np.sum((pred - gt) ** 2, axis=2)), axis=1)
    p1 = gt[:, 42:48].mean(1)
    p2 = gt[:, 36:42].mean(1)
    eye_dist = np.sqrt(np.sum((p1 - p2) ** 2, axis=1))
    return err / eye_dist


@functools.lru_cache(maxsize=4)
def _foa_eval_fn(num_landmarks: int, model):
    """One jitted eval forward per network config — a fresh jit(lambda)
    per evaluate_foa call would re-trace/compile the whole net at every
    validation pass."""
    from animateportrait_tpu.models.face_of_art import (
        heatmaps_to_landmarks_yx)

    return jax.jit(lambda p, x: heatmaps_to_landmarks_yx(
        model.apply({"params": p}, x)[2]))


def evaluate_foa(state: FOATrainState, cfg: FOATrainConfig,
                 images: np.ndarray, lms_yx: np.ndarray,
                 batch_size: int = 4) -> float:
    """Mean NME of argmax-decoded upsampled heatmaps on a validation
    set (the reference's valid_nme_loss, :384-385)."""
    model = ArtisticHeatmapNet(num_landmarks=cfg.num_landmarks)
    apply_fn = _foa_eval_fn(cfg.num_landmarks, model)
    nmes = []
    for s in range(0, len(images), batch_size):
        batch = jnp.asarray(images[s:s + batch_size])
        pred = np.asarray(apply_fn(state.params, batch))
        nmes.append(nme_norm_eyes(pred, lms_yx[s:s + batch_size]))
    return float(np.concatenate(nmes).mean())


def train_foa(items, cfg: FOATrainConfig | None = None,
              train_iter: int = 1000, batch_size: int = 4,
              image_size: int = 256, sigma: float = 6.0,
              img_dir_ns: str = "", p_texture: float = 0.0,
              p_geom: float = 0.0, augment: bool = True,
              valid_items=None, log_valid_every: int = 5,
              print_every: int = 100, save_every: int = 20000,
              checkpoint_dir: str | None = None, seed: int = 0,
              state: FOATrainState | None = None,
              log_fn=print) -> FOATrainState:
    """The reference FOA training loop (train_heatmaps_network.py +
    DeepHeatmapsModel.train :495-720): per-epoch reshuffle + augment,
    staircase-lr step, periodic loss prints, NME validation every
    ``log_valid_every`` epochs, periodic checkpoints. ``items`` is a
    ``data/face_of_art.load_foa_image_list`` result (or any list of
    objects with .image/.lms/.path)."""
    from animateportrait_tpu.data.face_of_art import foa_epoch_batches

    if len(items) < batch_size:
        # foa_epoch_batches drops the incomplete tail batch, so an
        # undersized item list would yield zero batches per epoch and
        # the while loop below would spin forever without advancing
        raise ValueError(
            f"need at least batch_size={batch_size} items, got "
            f"{len(items)}")
    cfg = cfg or FOATrainConfig()
    rng = np.random.default_rng(seed)
    if state is None:
        state = init_foa_state(cfg, jax.random.key(seed), size=image_size)
    step_fn = build_foa_train_step(cfg)
    mgr = None
    if checkpoint_dir:
        from animateportrait_tpu.io.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)

    step = int(state.step)
    epoch = 0
    try:
        while step < train_iter:
            for imgs, smalls, larges, _ in foa_epoch_batches(
                    items, batch_size, rng, img_dir_ns=img_dir_ns,
                    p_texture=p_texture, p_geom=p_geom, augment=augment,
                    image_size=image_size, sigma=sigma):
                state, losses = step_fn(
                    state, jnp.asarray(imgs), jnp.asarray(smalls),
                    jnp.asarray(larges))
                step = int(state.step)
                if print_every and step % print_every == 0:
                    log_fn(
                        f"epoch: [{epoch}] step: [{step}/{train_iter}] "
                        f"primary: [{float(losses['l2_primary']):.6f}] "
                        f"fusion: [{float(losses['l2_fusion']):.6f}] "
                        f"upsample: [{float(losses['l2_upsample']):.6f}] "
                        f"total: [{float(losses['total']):.6f}]")
                if mgr is not None and save_every and \
                        step % save_every == 0:
                    mgr.save(step, state, force=True)
                if step >= train_iter:
                    break
            epoch += 1
            if valid_items and log_valid_every and \
                    epoch % log_valid_every == 0:
                vi = np.stack([v.image for v in valid_items])
                vl = np.stack([v.lms for v in valid_items])
                log_fn(f"epoch: [{epoch}] valid NME: "
                       f"[{evaluate_foa(state, cfg, vi, vl):.6f}]")
        if mgr is not None:
            mgr.save(step, state, force=True)
    finally:
        if mgr is not None:
            mgr.close()
    return state
