"""Landmark post-processing parity vs direct numpy transcriptions of the
reference logic (train_audio2landmark.py:101-140, 235-245, 594-617)."""
import numpy as np
import pytest
import jax.numpy as jnp


def _ref_close_mouth(fl, ratio=0.99):
    fl = fl.copy().reshape(-1, 68, 3)
    index1 = list(range(59, 54, -1))
    index2 = list(range(67, 64, -1))
    mean_out = 0.5 * fl[:, 49:54] + 0.5 * fl[:, index1]
    fl[:, 49:54] = mean_out * ratio + fl[:, 49:54] * (1 - ratio)
    fl[:, index1] = mean_out * ratio + fl[:, index1] * (1 - ratio)
    mean_in = 0.5 * (fl[:, 61:64] + fl[:, index2])
    fl[:, 61:64] = mean_in * ratio + fl[:, 61:64] * (1 - ratio)
    fl[:, index2] = mean_in * ratio + fl[:, index2] * (1 - ratio)
    return fl.reshape(-1, 204)


def _ref_calibrate(baseline, amp_lip_x=2.0, amp_lip_y=2.0, ratio=0.5):
    b = baseline.copy()
    K = int(b.shape[0] * ratio)
    for i in range(204):
        idx = np.argpartition(b[:, i], K)
        m = np.mean(b[idx[:K], i])
        b[:, i] = b[:, i] - m
    b[:, 48 * 3::3] *= amp_lip_x
    b[:, 48 * 3 + 1::3] *= amp_lip_y
    return b


def _ref_area(pts):
    s = 0.0
    for i in range(1, pts.shape[0] - 1):
        AB = pts[i] - pts[0]
        AC = pts[i + 1] - pts[0]
        s += 0.5 * np.cross(AB, AC)
    return s


def _ref_inverse_lip(fl):
    fl = fl.copy()
    for j in range(fl.shape[0]):
        fls = fl[j].reshape(68, 3)
        if _ref_area(fls[list(range(60, 68)), 0:2]) < 0:
            fl[j, 65 * 3:66 * 3] = 0.5 * (
                fl[j, 63 * 3:64 * 3] + fl[j, 65 * 3:66 * 3])
            fl[j, 63 * 3:64 * 3] = fl[j, 65 * 3:66 * 3]
            fl[j, 66 * 3:67 * 3] = 0.5 * (
                fl[j, 62 * 3:63 * 3] + fl[j, 66 * 3:67 * 3])
            fl[j, 62 * 3:63 * 3] = fl[j, 66 * 3:67 * 3]
            fl[j, 67 * 3:68 * 3] = 0.5 * (
                fl[j, 61 * 3:62 * 3] + fl[j, 67 * 3:68 * 3])
            fl[j, 61 * 3:62 * 3] = fl[j, 67 * 3:68 * 3]
            p = max(j - 1, 0)
            fl[j, 55 * 3 + 1:59 * 3 + 1:3] = (
                fl[j, 64 * 3 + 1:68 * 3 + 1:3]
                + fl[p, 55 * 3 + 1:59 * 3 + 1:3]
                - fl[p, 64 * 3 + 1:68 * 3 + 1:3])
            fl[j, 59 * 3 + 1:60 * 3 + 1:3] = (
                fl[j, 60 * 3 + 1:61 * 3 + 1:3]
                + fl[p, 59 * 3 + 1:60 * 3 + 1:3]
                - fl[p, 60 * 3 + 1:61 * 3 + 1:3])
            fl[j, 49 * 3 + 1:54 * 3 + 1:3] = (
                fl[j, 60 * 3 + 1:65 * 3 + 1:3]
                + fl[p, 49 * 3 + 1:54 * 3 + 1:3]
                - fl[p, 60 * 3 + 1:65 * 3 + 1:3])
    return fl


def test_close_mouth_blend(rng):
    from animateportrait_tpu.pipeline.landmark import close_mouth_blend

    fl = rng.standard_normal((11, 204)).astype(np.float32)
    ours = close_mouth_blend(jnp.asarray(fl.reshape(-1, 68, 3)))
    np.testing.assert_allclose(
        np.asarray(ours).reshape(-1, 204), _ref_close_mouth(fl), atol=1e-6)


def test_calibrate_content(rng):
    from animateportrait_tpu.pipeline.landmark import calibrate_content

    b = rng.standard_normal((40, 204)).astype(np.float32)
    ours = calibrate_content(jnp.asarray(b), 2.0, 2.0)
    np.testing.assert_allclose(np.asarray(ours), _ref_calibrate(b), atol=2e-6)


def test_solve_inverse_lip(rng):
    from animateportrait_tpu.pipeline.landmark import solve_inverse_lip

    # build frames where some mouths are inverted (negative signed area)
    fl = rng.standard_normal((30, 204)).astype(np.float32) * 0.1
    ref = _ref_inverse_lip(fl)
    # make sure the fixture actually exercises both branches
    assert not np.allclose(ref, fl)
    ours = solve_inverse_lip(jnp.asarray(fl))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_sliding_windows(rng):
    from animateportrait_tpu.pipeline.landmark import sliding_windows

    au = rng.standard_normal((100, 80)).astype(np.float32)
    w = sliding_windows(au)
    assert w.shape == (82, 18, 80)
    np.testing.assert_array_equal(w[0], au[0:18])
    np.testing.assert_array_equal(w[-1], au[81:99])


def test_savgol_matches_scipy(rng):
    from scipy.signal import savgol_filter as ref_savgol
    from animateportrait_tpu.ops.filters import savgol_filter

    x = rng.standard_normal((50, 7)).astype(np.float64)
    for win, poly in ((31, 3), (5, 3), (15, 2)):
        ours = savgol_filter(jnp.asarray(x), win, poly, axis=0)
        np.testing.assert_allclose(
            np.asarray(ours), ref_savgol(x, win, poly, axis=0), atol=1e-4)


def test_revise_nose_top(rng):
    from animateportrait_tpu.pipeline.landmark import revise_nose_top

    fl = rng.standard_normal((5, 204)).astype(np.float32)
    out = np.asarray(revise_nose_top(jnp.asarray(fl)))
    np.testing.assert_allclose(
        out[:, 81:84], fl[:, 84:87] * 2 - fl[:, 87:90], atol=1e-6)


@pytest.mark.slow
def test_landmark_predictor_smoke(rng):
    """LandmarkPredictor end-to-end with randomly initialized branches."""
    import jax
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkContent, Audio2landmarkPos)
    from animateportrait_tpu.pipeline.landmark import (
        LandmarkPredictor, sliding_windows)

    T = 40
    au = rng.standard_normal((T, 80)).astype(np.float32)
    win = sliding_windows(au)
    emb = rng.standard_normal((256,)).astype(np.float32)
    face_id = rng.standard_normal((1, 204)).astype(np.float32)

    k = jax.random.key(0)
    pos_v = Audio2landmarkPos().init(
        k, jnp.asarray(win), jnp.zeros((win.shape[0], 256)),
        jnp.asarray(face_id), jnp.zeros((win.shape[0], 128)))
    cont_v = Audio2landmarkContent().init(
        k, jnp.asarray(win), jnp.asarray(face_id))

    pred = LandmarkPredictor(pos_v, cont_v)
    fl = pred(win, emb, face_id)
    assert fl.shape == (win.shape[0], 204)
    assert np.isfinite(fl).all()


@pytest.mark.slow
def test_predictor_extra_options(rng):
    """centerize_face / no_y_rotation / content-only variants."""
    import jax
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkContent, Audio2landmarkPos)
    from animateportrait_tpu.pipeline.landmark import (
        LandmarkPredictor, sliding_windows)

    au = rng.standard_normal((40, 80)).astype(np.float32)
    win = sliding_windows(au)
    emb = rng.standard_normal((256,)).astype(np.float32)
    from animateportrait_tpu.utils import assets
    face_id = assets.std_face_landmarks().reshape(1, 204).astype(np.float32)

    k = jax.random.key(0)
    pos_v = Audio2landmarkPos().init(
        k, jnp.asarray(win), jnp.zeros((win.shape[0], 256)),
        jnp.asarray(face_id), jnp.zeros((win.shape[0], 128)))
    cont_v = Audio2landmarkContent().init(
        k, jnp.asarray(win), jnp.asarray(face_id))
    pred = LandmarkPredictor(pos_v, cont_v)

    fl = pred(win, emb, face_id, centerize_face=True, no_y_rotation=True)
    assert fl.shape == (win.shape[0], 204)
    assert np.isfinite(fl).all()
    # centroid matches the face-id centroid after centerize (pre-rotation
    # adjustment changes it again, so just check finiteness + shape here)

    flc = pred.predict_content_only(win, face_id)
    assert flc.shape == (win.shape[0], 204)
    assert np.isfinite(flc).all()


def test_inverse_lip_frame0_inverted(rng):
    """Frame 0 with inverted mouth: only the collapse applies, y-transfers
    are identity (the reference's in-place p=j self-reference)."""
    from animateportrait_tpu.pipeline.landmark import solve_inverse_lip

    fl = rng.standard_normal((4, 204)).astype(np.float32) * 0.1
    # force frame 0 mouth inversion: clockwise outer ring => negative area
    theta = np.linspace(0, 2 * np.pi, 8, endpoint=False)[::-1]
    f0 = fl[0].reshape(68, 3).copy()
    f0[60:68, 0] = np.cos(theta)
    f0[60:68, 1] = np.sin(theta)
    fl[0] = f0.reshape(204)
    ref = _ref_inverse_lip(fl)
    assert not np.allclose(ref[0], fl[0])  # frame 0 was actually fixed
    ours = solve_inverse_lip(jnp.asarray(fl))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_hann_smooth_matches_reference():
    """hann_smooth vs a direct port of utils.py smooth('hanning')."""
    from animateportrait_tpu.ops.filters import hann_smooth

    def ref_smooth(x, window_len=11):
        s = np.r_[x[window_len - 1:0:-1], x, x[-2:-window_len - 1:-1]]
        w = np.hanning(window_len)
        return np.convolve(w / w.sum(), s, mode="valid")

    rng_l = np.random.default_rng(7)
    for n, wl in ((40, 11), (25, 7)):
        x = rng_l.standard_normal(n).astype(np.float32)
        ours = np.asarray(hann_smooth(jnp.asarray(x), wl))
        np.testing.assert_allclose(ours, ref_smooth(x, wl), atol=1e-5)
