"""Postalign stabilizer: LK tracking vs cv2, reflect shift vs scipy,
end-to-end stabilization of a synthetically drifting clip
(reference: Module1/util/postalign.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from animateportrait_tpu.pipeline.postalign import (
    good_feature, postalign_video, rgb_to_gray, shift_reflect, track_point)


def _texture(h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 8, w // 8))
    img = np.kron(base, np.ones((8, 8)))
    # smooth a bit so gradients are informative
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d
    return convolve2d(img, k, mode="same", boundary="symm").astype(
        np.float32)


def test_track_point_recovers_translation():
    img = _texture()
    dx, dy = 3.0, -2.0
    # integer-shift the image (roll) so ground truth is exact
    moved = np.roll(np.roll(img, int(dy), axis=0), int(dx), axis=1)
    pt = jnp.array([64.0, 64.0])
    new = track_point(jnp.asarray(img), jnp.asarray(moved), pt)
    np.testing.assert_allclose(np.asarray(new), [64 + dx, 64 + dy],
                               atol=0.25)


def test_track_point_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _texture().astype(np.uint8)
    m = np.float32([[1, 0, 2.3], [0, 1, -1.7]])
    moved = cv2.warpAffine(img, m, (128, 128))
    p0 = np.array([[[60.0, 70.0]]], np.float32)
    p1, st, _ = cv2.calcOpticalFlowPyrLK(
        img, moved, p0, None, winSize=(15, 15), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10,
                  0.03))
    ours = track_point(jnp.asarray(img, jnp.float32),
                       jnp.asarray(moved, jnp.float32),
                       jnp.array([60.0, 70.0]))
    assert st[0, 0] == 1
    np.testing.assert_allclose(np.asarray(ours), p1[0, 0], atol=0.5)


def test_good_feature_finds_strong_corner():
    img = np.zeros((64, 64), np.float32)
    img[30:, 30:] = 200.0  # one sharp corner at (30, 30)
    pt = np.asarray(good_feature(jnp.asarray(img)))
    assert abs(pt[0] - 30) <= 2 and abs(pt[1] - 30) <= 2


def test_good_feature_respects_mask():
    img = np.zeros((64, 64), np.float32)
    img[10:20, 10:20] = 200.0
    img[40:50, 40:50] = 100.0
    mask = np.zeros((64, 64), np.float32)
    mask[32:, 32:] = 1.0
    pt = np.asarray(good_feature(jnp.asarray(img), jnp.asarray(mask)))
    assert pt[0] >= 32 and pt[1] >= 32


def test_shift_reflect_matches_scipy_order1():
    from scipy.ndimage import shift as nd_shift
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 20)).astype(np.float32)
    for dy, dx in ((2.0, -3.0), (0.5, 1.25), (-4.75, 0.0)):
        ours = np.asarray(shift_reflect(jnp.asarray(img),
                                        jnp.array([dy, dx])))
        ref = nd_shift(img, [dy, dx], order=1, mode="reflect")
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_postalign_video_stabilizes_drift():
    base = _texture(96, 96)
    frames = []
    rng = np.random.default_rng(1)
    offs = np.cumsum(rng.uniform(-1.5, 1.5, (8, 2)), axis=0)
    from scipy.ndimage import shift as nd_shift
    for t in range(8):
        f = nd_shift(base, [offs[t, 0], offs[t, 1]], order=1,
                     mode="reflect")
        frames.append(np.stack([f] * 3, -1))
    frames = np.stack(frames).astype(np.float32)
    out = postalign_video(frames, mask_region=(20, 20))
    assert out.shape == (6, 96, 96, 3)
    # the stabilized frames should be much closer to each other than the
    # drifting input (compare interior to avoid border effects)
    sl = np.s_[:, 20:-20, 20:-20, :]
    drift = np.mean(np.abs(np.diff(frames[2:][sl], axis=0)))
    stab = np.mean(np.abs(np.diff(out[sl], axis=0)))
    assert stab < 0.5 * drift


def test_rgb_to_gray():
    x = jnp.asarray(np.array([[[100.0, 50.0, 200.0]]], np.float32))
    expected = 0.299 * 100 + 0.587 * 50 + 0.114 * 200
    np.testing.assert_allclose(float(rgb_to_gray(x)[0, 0]), expected,
                               rtol=1e-6)
