"""norm_input_face / close_input_face_mouth / add_naive_eye parity vs
direct ports of Module1/util/utils.py:329-393."""
import numpy as np

from animateportrait_tpu.ops.geometry import (
    add_naive_eye, close_input_face_mouth, norm_input_face)
from animateportrait_tpu.utils.assets import std_face_landmarks


def _ref_close_mouth(shape_3d, p1=0.7, p2=0.5):
    shape_3d = shape_3d.reshape((1, 68, 3)).copy()
    index2 = list(range(68 - 1, 65 - 1, -1))
    mean_in = 0.5 * (shape_3d[:, 61:64] + shape_3d[:, index2])
    shape_3d[:, 50:53] -= (shape_3d[:, 61:64] - mean_in) * p1
    shape_3d[:, list(range(59 - 1, 56 - 1, -1))] -= \
        (shape_3d[:, index2] - mean_in) * p1
    shape_3d[:, 49] -= (shape_3d[:, 61] - mean_in[:, 0]) * p2
    shape_3d[:, 53] -= (shape_3d[:, 63] - mean_in[:, -1]) * p2
    shape_3d[:, 59] -= (shape_3d[:, 67] - mean_in[:, 0]) * p2
    shape_3d[:, 55] -= (shape_3d[:, 65] - mean_in[:, -1]) * p2
    shape_3d[:, 61:64] -= (shape_3d[:, 61:64] - mean_in) * p1
    shape_3d[:, index2] -= (shape_3d[:, index2] - mean_in) * p1
    return shape_3d.reshape((68, 3))


def _ref_norm(shape_3d, face_std):
    shape_3d = shape_3d.copy()
    scale = 1.6 / (shape_3d[0, 0] - shape_3d[16, 0])
    shift = -0.5 * (shape_3d[0, 0:2] + shape_3d[16, 0:2])
    shape_3d[:, 0:2] = (shape_3d[:, 0:2] + shift) * scale
    shape_3d[:, -1] = face_std[:, -1] * 0.1
    shape_3d[:, 0:2] = -shape_3d[:, 0:2]
    return shape_3d, scale, shift


def _ref_add_naive_eye(fl, stamps):
    fl = fl.copy()
    for t in range(fl.shape[0]):
        r = 0.95
        for a, b in ((37, 41), (38, 40), (43, 47), (44, 46)):
            fl[t, a], fl[t, b] = (r * fl[t, a] + (1 - r) * fl[t, b],
                                  (1 - r) * fl[t, a] + r * fl[t, b])
    K1, K2 = 10, 15
    for t in stamps:
        for a, b in ((37, 41), (38, 40), (43, 47), (44, 46)):
            v = 0.25 * fl[t, a] + 0.75 * fl[t, b]
            fl[t, a] = v
            fl[t, b] = v

        def interp_fl(t0, t1, t2, r):
            for index in [37, 38, 40, 41, 43, 44, 46, 47]:
                fl[t0, index] = r * fl[t1, index] + (1 - r) * fl[t2, index]

        for t0 in range(t - K1 + 1, t):
            interp_fl(t0, t - K1, t, r=(t - t0) / 1.0 / K1)
        for t0 in range(t + 1, t + K2):
            interp_fl(t0, t, t + K2, r=(t + K2 - 1 - t0) / 1.0 / K2)
    return fl


def test_norm_input_face_parity():
    rng = np.random.default_rng(0)
    std = std_face_landmarks().reshape(68, 3)
    shape = rng.uniform(-1, 1, (68, 3))
    shape[0, 0] = -0.9
    shape[16, 0] = 0.9
    ours, s1, t1 = norm_input_face(shape, std)
    ref, s2, t2 = _ref_norm(shape, std)
    np.testing.assert_allclose(ours, ref, atol=1e-12)
    assert abs(s1 - s2) < 1e-12
    np.testing.assert_allclose(t1, t2, atol=1e-12)


def test_close_mouth_parity():
    rng = np.random.default_rng(1)
    shape = rng.uniform(-1, 1, (68, 3))
    np.testing.assert_allclose(close_input_face_mouth(shape),
                               _ref_close_mouth(shape), atol=1e-12)


def test_add_naive_eye_single_blink_parity():
    rng = np.random.default_rng(2)
    T = 60  # short enough that exactly one blink (t=30) fires
    fl = rng.uniform(-1, 1, (T, 68, 3))
    ours = add_naive_eye(fl, rng=np.random.default_rng(3))
    ref = _ref_add_naive_eye(fl, stamps=[30])
    np.testing.assert_allclose(ours, ref, atol=1e-12)
