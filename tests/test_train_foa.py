"""face_of_art training subsystem: artistic deformation, augmentation
stack, approx gaussian GT heatmaps, fusion-net train step (reference:
face_of_art/{deformation_functions,menpo_functions,
data_loading_functions,deep_heatmaps_model_fusion_net}.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animateportrait_tpu.train.face_of_art import (
    FOATrainConfig, approx_gaussian_heatmaps, augment_basic, augment_geom,
    build_foa_train_step, check_deformation_spatial_errors, deform_part,
    deform_face_geometric_style, init_foa_state, make_foa_targets)


def _face_lms(size=256, seed=0):
    """Roughly face-shaped ibug-68 layout (y, x) inside the canvas."""
    from animateportrait_tpu.utils.assets import std_face_landmarks

    lm = std_face_landmarks().reshape(68, 3)[:, :2]  # (x, y)
    lm = lm - lm.min(0)
    lm = lm / lm.max() * (0.55 * size) + 0.22 * size
    return lm[:, ::-1].copy()  # -> (y, x)


def test_deform_part_scale_and_shift_math():
    lms = _face_lms()
    inds = np.arange(48, 68)
    out = deform_part(lms, inds, scale_y=2.0, scale_x=0.5,
                      shift_ver=3.0, shift_horiz=-4.0)
    mean = lms[inds].mean(0)
    want = (lms[inds] - mean) * np.array([2.0, 0.5]) + mean + [3.0, -4.0]
    np.testing.assert_allclose(out[inds], want, rtol=1e-12)
    others = np.delete(np.arange(68), inds)
    np.testing.assert_array_equal(out[others], lms[others])


def test_spatial_error_check():
    lms = _face_lms()
    mouth = np.arange(48, 68)
    # clean layout: nothing inside the mouth bbox
    assert not check_deformation_spatial_errors(lms, mouth, pad=0)
    # drag the nose tip into the mouth box -> error
    bad = lms.copy()
    bad[33] = lms[mouth].mean(0)
    assert check_deformation_spatial_errors(bad, mouth, pad=0)


def test_geometric_style_identity_when_p_zero():
    lms = _face_lms()
    out = deform_face_geometric_style(lms, np.random.default_rng(0),
                                      p_scale=0.0, p_shift=0.0)
    np.testing.assert_array_equal(out, lms)


def test_geometric_style_deforms_and_stays_sane():
    lms = _face_lms()
    moved = 0
    for seed in range(4):
        out = deform_face_geometric_style(
            lms, np.random.default_rng(seed), p_scale=1.0, p_shift=1.0)
        assert out.shape == (68, 2) and np.isfinite(out).all()
        # stays broadly on canvas (reference reverts out-of-bounds draws)
        assert out.min() > -30 and out.max() < 300
        moved += float(np.abs(out - lms).max() > 1.0)
    assert moved >= 3  # the chain actually fires


def test_augment_basic_transforms_pixels_with_landmarks(rng):
    size = 64
    lms = _face_lms(size)
    img = np.zeros((size, size, 3), np.float32)
    iy, ix = int(lms[30, 0]), int(lms[30, 1])  # nose tip marker
    img[iy - 1:iy + 2, ix - 1:ix + 2] = 1.0
    out, olms = augment_basic(img, lms, rng, image_size=size,
                              crop_size=56)
    assert out.shape == (size, size, 3) and olms.shape == (68, 2)
    peak = np.unravel_index(np.argmax(out.sum(-1)), out.shape[:2])
    # the marker must track the transformed landmark within a few px
    assert np.hypot(peak[0] - olms[30, 0], peak[1] - olms[30, 1]) < 4.0


def test_approx_heatmaps_match_reference_paste():
    """Dense masked evaluation == the reference's clipped patch paste
    (data_loading_functions.py:67-112), incl. edge clipping."""
    size, sigma = 32, 2.0
    win = int(3.33335 * sigma)  # reference win_mult (flags + model init)
    lms = np.array([[5.7, 3.2], [0.0, 0.0], [31.0, 31.0], [16.0, 2.0]],
                   np.float64)

    # verbatim reference semantics in numpy
    def gaussian(x, y, x0, y0, s):
        return (1.0 / (np.sqrt(2 * np.pi) * s)
                * np.exp(-0.5 * ((x - x0) ** 2 + (y - y0) ** 2) / s ** 2))

    fs = 2 * win + 1
    gx, gy = np.mgrid[0:fs, 0:fs]
    filt = (8.0 / 3) * sigma * gaussian(gx, gy, win, win, sigma)
    want = np.zeros((size, size, len(lms)), np.float32)
    ilms = np.minimum(lms, size - 1).astype(int)
    for i, (r, c) in enumerate(ilms):
        r0, r1 = r - win, r + win + 1
        c0, c1 = c - win, c + win + 1
        gr0, gc0 = max(0, -r0), max(0, -c0)
        gr1 = fs - max(0, r1 - size)
        gc1 = fs - max(0, c1 - size)
        want[max(r0, 0):min(r1, size), max(c0, 0):min(c1, size), i] = \
            filt[gr0:gr1, gc0:gc1]

    got = np.asarray(approx_gaussian_heatmaps(
        jnp.asarray(lms), size, sigma=sigma))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_make_foa_targets_shapes_and_peaks():
    lms = _face_lms(64)
    small, large = make_foa_targets(lms, image_size=64, sigma=4.0)
    assert small.shape == (16, 16, 68) and large.shape == (64, 64, 68)
    amp = (8.0 / 3.0) / np.sqrt(2.0 * np.pi)
    assert abs(large.max() - amp) < 1e-5
    # small maps peak at landmarks/4
    i = 30
    peak = np.unravel_index(np.argmax(small[..., i]), (16, 16))
    assert np.abs(np.array(peak) - lms[i] / 4.0).max() <= 1.5


@pytest.mark.slow
def test_augment_geom_warps_image_toward_deformed_lms(rng):
    size = 64
    lms = _face_lms(size)
    img = np.tile(np.linspace(0, 1, size, dtype=np.float32)[None, :, None],
                  (size, 1, 3))
    out, olms = augment_geom(img, lms, np.random.default_rng(3), p_geom=1.0)
    assert out.shape == img.shape and olms.shape == (68, 2)
    assert np.abs(olms - lms).max() > 0.5       # deformation fired
    assert np.abs(out - img).max() > 1e-3       # image actually warped


@pytest.mark.slow
def test_foa_train_step_descends():
    size = 64
    cfg = FOATrainConfig(lr=1e-4)
    state = init_foa_state(cfg, jax.random.key(0), size=size)
    step = build_foa_train_step(cfg)
    lms = _face_lms(size)
    small, large = make_foa_targets(lms, image_size=size, sigma=4.0)
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, size, size, 3)),
        jnp.float32)
    smalls = jnp.asarray(small)[None]
    larges = jnp.asarray(large)[None]
    state, first = step(state, imgs, smalls, larges)
    for _ in range(6):
        state, losses = step(state, imgs, smalls, larges)
    assert float(losses["total"]) < float(first["total"])
    assert int(state.step) == 7
    for k in ("l2_primary", "l2_fusion", "l2_upsample"):
        assert np.isfinite(float(losses[k]))


# ------------------------------------------------------------------
# data loading (data/face_of_art.py) + training driver
# ------------------------------------------------------------------

def _write_foa_dir(tmp_path, n=3, size=100):
    import cv2
    rng = np.random.default_rng(7)
    lms_all = []
    for i in range(n):
        img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"im{i}.png"), img)
        lms = _face_lms(size)  # (y, x) 0-based
        lms_all.append(lms)
        with open(tmp_path / f"im{i}.pts", "w") as fp:
            fp.write("version: 1\nn_points: 68\n{\n")
            for y, x in lms:  # pts files are 1-based (x, y)
                fp.write(f"{x + 1.0:.6f} {y + 1.0:.6f}\n")
            fp.write("}\n")
    return lms_all


def test_load_pts_roundtrip(tmp_path):
    from animateportrait_tpu.data.face_of_art import load_pts

    lms = _write_foa_dir(tmp_path, n=1)[0]
    got = load_pts(str(tmp_path / "im0.pts"))
    np.testing.assert_allclose(got, lms, atol=1e-5)


def test_center_margin_bb_square_margin():
    from animateportrait_tpu.data.face_of_art import center_margin_bb

    bb = np.array([[10.0, 20.0, 50.0, 40.0]])  # 40 x 20 box
    out = center_margin_bb(bb, (200, 200), margin=0.25)
    # max side 40 -> target 50; x grows by 5 each side, y by 15
    np.testing.assert_allclose(out, [[5.0, 5.0, 55.0, 55.0]])
    # clamping at image bounds
    out2 = center_margin_bb(bb, (45, 52), margin=0.25)
    assert out2[0, 2] <= 52 and out2[0, 3] <= 45


def test_crop_to_face_image_carries_landmarks():
    from animateportrait_tpu.data.face_of_art import crop_to_face_image

    size = 100
    lms = _face_lms(size)
    img = np.zeros((size, size, 3), np.float32)
    iy, ix = int(lms[30, 0]), int(lms[30, 1])
    img[iy - 1:iy + 2, ix - 1:ix + 2] = 1.0
    out, olms = crop_to_face_image(img, lms, image_size=64)
    assert out.shape == (64, 64, 3) and olms.shape == (68, 2)
    assert 0.0 <= out.min() and out.max() <= 1.0
    peak = np.unravel_index(np.argmax(out.sum(-1)), out.shape[:2])
    assert np.hypot(peak[0] - olms[30, 0], peak[1] - olms[30, 1]) < 3.0


def test_load_foa_image_list_and_batches(tmp_path):
    from animateportrait_tpu.data.face_of_art import (
        foa_epoch_batches, load_foa_image_list)

    _write_foa_dir(tmp_path, n=3)
    items = load_foa_image_list(str(tmp_path), image_size=64)
    assert len(items) == 3
    assert items[0].image.shape == (64, 64, 3)
    batches = list(foa_epoch_batches(
        items, 2, np.random.default_rng(0), augment=True, image_size=64,
        sigma=4.0))
    assert len(batches) == 1  # floor(3/2), trailing item dropped
    imgs, smalls, larges, lms = batches[0]
    assert imgs.shape == (2, 64, 64, 3)
    assert smalls.shape == (2, 16, 16, 68)
    assert larges.shape == (2, 64, 64, 68)
    assert lms.shape == (2, 68, 2)


def test_nme_norm_eyes_manual():
    from animateportrait_tpu.train.face_of_art import nme_norm_eyes

    gt = _face_lms(256)[None]
    pred = gt + 2.0  # uniform offset of 2*sqrt(2) px per landmark
    eye = np.linalg.norm(gt[0, 42:48].mean(0) - gt[0, 36:42].mean(0))
    got = nme_norm_eyes(pred, gt)
    np.testing.assert_allclose(got, [2.0 * np.sqrt(2) / eye], rtol=1e-12)


@pytest.mark.slow
def test_train_foa_driver_runs_and_checkpoints(tmp_path):
    from animateportrait_tpu.data.face_of_art import load_foa_image_list
    from animateportrait_tpu.train.face_of_art import (
        FOATrainConfig, train_foa)

    _write_foa_dir(tmp_path, n=2)
    items = load_foa_image_list(str(tmp_path), image_size=64)
    logs = []
    state = train_foa(
        items, FOATrainConfig(lr=1e-4), train_iter=3, batch_size=2,
        image_size=64, sigma=4.0, augment=False, valid_items=items,
        log_valid_every=1, print_every=1, save_every=2,
        checkpoint_dir=str(tmp_path / "ckpt"), log_fn=logs.append)
    assert int(state.step) == 3
    assert any("total:" in m for m in logs)
    assert any("valid NME:" in m for m in logs)
    import glob as g
    assert g.glob(str(tmp_path / "ckpt" / "*"))


def test_train_foa_rejects_undersized_item_list():
    """items < batch_size would yield zero batches per epoch (the
    incomplete tail is dropped) and the driver would spin forever; it
    must raise up front instead."""
    from animateportrait_tpu.train.face_of_art import train_foa

    with pytest.raises(ValueError, match="batch_size"):
        train_foa([object()] * 3, train_iter=10, batch_size=4)
