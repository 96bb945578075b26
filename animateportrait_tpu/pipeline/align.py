"""Face alignment stage: MTCNN detection + the driver's crop, and a 68-pt
landmark source.

`align_face` reproduces `align_mtcnn` (main_end2end_module2.py:12-45):
largest detected face -> 1.2x square -> /0.7 expansion with the 11/20
vertical offset -> white-padded crop -> bicubic resize to 512.

For the 3D 68-point landmarks the reference calls the external
`face_alignment` FAN (main_end2end_module2.py:188). The default source is
our reimplementation of that net (`models.fan3d.FaceAlignment3D`), wired
up automatically by the CLI when a converted checkpoint is present.
`estimate_landmarks_from_5pt` is the weights-free DEGRADED fallback:
similarity-align the canonical 68x3 face to MTCNN's 5-point landmarks
(eyes, nose, mouth corners) — same geometry for every subject, loudly
warned about by the CLI.
"""
from __future__ import annotations

import numpy as np

from animateportrait_tpu.utils import assets

# canonical 5-point positions inside the canonical 68-pt face:
# eye centers, nose tip, mouth corners
_FIVE_FROM_68 = ((36, 39), (42, 45), (30, 30), (48, 48), (54, 54))


def align_face(img_bgr: np.ndarray, boxes: np.ndarray,
               out_size: int = 512) -> tuple[np.ndarray, np.ndarray]:
    """Crop+resize per the driver. Returns (aligned BGR uint8, the affine
    (scale, offset) mapping original-image coords -> aligned coords)."""
    import cv2

    height, width = img_bgr.shape[:2]
    maxs = 0
    best = None
    best_idx = -1
    for k, face in enumerate(boxes):
        x1, y1, x2, y2 = (float(v) for v in face[:4])
        w = x2 - x1 + 1
        h = y2 - y1 + 1
        size = int(min(w, h) * 1.2)
        # keep cx/cy float like the reference; int() truncation happens
        # only at the final corner computation (:24-31)
        cx = x1 + w // 2
        cy = y1 + h // 2
        if size > maxs:
            maxs = size
            size1 = int(round(size / 0.7))
            x11 = int(cx - size1 // 2)
            y11 = int(cy - (size1 * 11) // 20)
            best = (x11, y11, size1)
            best_idx = k
    if best is None:
        raise ValueError("no face detected")
    x11, y11, size1 = best
    x21, y21 = x11 + size1, y11 + size1
    crop = np.ones((size1, size1, 3), np.uint8) * 255
    crop[max(0, y11) - y11: min(y21, height) - y11,
         max(0, x11) - x11: min(width, x21) - x11] = img_bgr[
        max(0, y11): min(y21, height), max(0, x11): min(width, x21)]
    aligned = cv2.resize(crop, (out_size, out_size),
                         interpolation=cv2.INTER_CUBIC)
    scale = out_size / size1
    offset = np.array([x11, y11], np.float64)
    return aligned, np.array([scale, offset[0], offset[1]]), best_idx


def _similarity_fit(src: np.ndarray, dst: np.ndarray
                    ) -> tuple[float, np.ndarray, np.ndarray]:
    """Least-squares similarity transform (s, R, t) with dst ~ s R src + t
    (Umeyama)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var = (sc ** 2).sum() / len(src)
    s = np.trace(np.diag(S) @ D) / var
    t = mu_d - s * R @ mu_s
    return s, R, t


def estimate_landmarks_from_5pt(five_pts: np.ndarray,
                                image_size: int = 512) -> np.ndarray:
    """68x3 landmark estimate from MTCNN's 5 points (weights-free FAN
    substitute): similarity-fit the canonical face's corresponding 5 points
    to the detected ones and transform all 68.

    five_pts: (5, 2) [left_eye, right_eye, nose, mouth_l, mouth_r] in
    aligned-image pixels.
    """
    std = assets.std_face_landmarks().copy()  # (68, 3), canonical units
    std2d = std[:, :2].copy()
    std2d[:, 1] *= -1  # canonical y is up; image y is down
    src = np.stack([
        0.5 * (std2d[a] + std2d[b]) for a, b in _FIVE_FROM_68])
    s, R, t = _similarity_fit(src, np.asarray(five_pts, np.float64))
    out2d = (s * (R @ std2d.T)).T + t
    z = std[:, 2] * s * (image_size / 512.0)
    return np.concatenate([out2d, z[:, None]], axis=1)


def detect_and_align(img_bgr: np.ndarray, detector,
                     out_size: int = 512
                     ) -> tuple[np.ndarray, np.ndarray]:
    """MTCNN detect on RGB, align, and map the 5-pt landmarks into the
    aligned crop. Returns (aligned BGR, five_pts (5,2) aligned coords)."""
    rgb = img_bgr[:, :, ::-1].astype(np.float32)
    boxes, lms = detector(rgb)
    if len(boxes) == 0:
        raise ValueError("no face detected")
    aligned, (scale, ox, oy), k = align_face(img_bgr, boxes, out_size)
    lm = np.asarray(lms[k], np.float64)
    five = np.stack([lm[:5], lm[5:]], axis=1)  # (5, 2) (x, y)
    five[:, 0] = (five[:, 0] - ox) * scale
    five[:, 1] = (five[:, 1] - oy) * scale
    return aligned, five
