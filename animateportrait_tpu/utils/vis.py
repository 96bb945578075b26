"""Landmark visualization: colored curve drawing + sequence preview video.

Reimplements the driver's `vis_landmark` (main_end2end_module2.py:46-67)
and the Module1 landmark-preview writer (`Module1/util/vis.py`) on top of
the ffmpeg-free muxer in `utils.video`.
"""
from __future__ import annotations

import numpy as np

_CURVES = (
    (list(range(0, 16)), (255, 144, 25), False),    # jaw
    (list(range(17, 21)), (50, 205, 50), False),    # brows
    (list(range(22, 26)), (50, 205, 50), False),
    (list(range(27, 35)), (208, 224, 63), False),   # nose
    (list(range(36, 41)), (71, 99, 255), True),     # eyes
    (list(range(42, 47)), (71, 99, 255), True),
    (list(range(48, 59)), (238, 130, 238), True),   # mouth
    (list(range(60, 67)), (238, 130, 238), True),
)


def vis_landmark(height: int, width: int, shape: np.ndarray,
                 linewidth: int = 2) -> np.ndarray:
    """Colored 68-pt landmark sketch on white, BGR uint8 (driver :46-67)."""
    import cv2

    img = np.ones((height, width, 3), np.uint8) * 255
    shape = np.asarray(shape).astype("int32")
    lw = linewidth * (height // 256)
    radius = height // 256

    def draw_curve(idx, color, loop):
        for i in idx:
            cv2.line(img, (shape[i, 0], shape[i, 1]),
                     (shape[i + 1, 0], shape[i + 1, 1]), color, lw)
        if loop:
            cv2.line(img, (shape[idx[0], 0], shape[idx[0], 1]),
                     (shape[idx[-1] + 1, 0], shape[idx[-1] + 1, 1]),
                     color, lw)

    for idx, color, loop in _CURVES:
        draw_curve(idx, color, loop)
    for i in range(68):
        cv2.circle(img, (shape[i, 0], shape[i, 1]), radius, (0, 0, 255), -1)
    return img


def landmark_sequence_video(path: str, fls: np.ndarray,
                            wav: np.ndarray | None = None,
                            size: int = 512, fps: float = 62.5) -> str:
    """Render a landmark sequence (T, 68, 2+) to a preview video with
    optional audio (Module1/util/vis.py equivalent, ffmpeg-free)."""
    from animateportrait_tpu.utils.video import (
        write_video, write_video_with_audio)

    frames = np.stack([
        vis_landmark(size, size, f[:, :2])[:, :, ::-1]  # BGR -> RGB
        for f in np.asarray(fls)])
    if wav is not None:
        return write_video_with_audio(path, frames, wav, fps=fps)
    return write_video(path, frames, fps=fps)


_CURVES_98 = (
    (list(range(0, 32)), (255, 144, 25), False),   # jaw
    (list(range(33, 41)), (50, 205, 50), True),    # brows
    (list(range(42, 50)), (50, 205, 50), True),
    (list(range(51, 59)), (208, 224, 63), False),  # nose
    (list(range(60, 67)), (71, 99, 255), True),    # eyes
    (list(range(68, 75)), (71, 99, 255), True),
    (list(range(76, 87)), (238, 130, 238), True),  # mouth
    (list(range(88, 95)), (238, 130, 238), True),
)


def vis_landmark_on_img(img: np.ndarray, shape: np.ndarray,
                        linewidth: int = 2,
                        curves=_CURVES) -> np.ndarray:
    """Draw landmark curves ONTO an existing image (in place), matching
    `data_preparation.vis_landmark_on_img{,98}` (:197-263)."""
    import cv2

    shape = np.asarray(shape).astype("int32")
    for idx, color, loop in curves:
        for i in idx:
            cv2.line(img, (shape[i, 0], shape[i, 1]),
                     (shape[i + 1, 0], shape[i + 1, 1]), color, linewidth)
        if loop:
            cv2.line(img, (shape[idx[0], 0], shape[idx[0], 1]),
                     (shape[idx[-1] + 1, 0], shape[idx[-1] + 1, 1]),
                     color, linewidth)
    return img


def vis_landmark_on_img98(img, shape, linewidth=2):
    return vis_landmark_on_img(img, shape, linewidth, _CURVES_98)


_CURVES_74 = (
    (list(range(0, 16)), (255, 144, 25), False),   # jaw
    (list(range(17, 21)), (50, 205, 50), False),   # brows
    (list(range(22, 26)), (50, 205, 50), False),
    (list(range(27, 35)), (208, 224, 63), False),  # nose
    (list(range(36, 43)), (71, 99, 255), True),    # eyes
    (list(range(44, 51)), (71, 99, 255), True),
    (list(range(52, 63)), (238, 130, 238), True),  # mouth
    (list(range(64, 71)), (238, 130, 238), True),
)


def vis_landmark_on_img74(img, shape, linewidth=2):
    """74-pt variant (data_preparation.py:245-266)."""
    return vis_landmark_on_img(img, shape, linewidth, _CURVES_74)


def show_bboxes(img_bgr: np.ndarray, boxes: np.ndarray,
                landmarks: np.ndarray | None = None) -> np.ndarray:
    """Draw detection boxes (+ 5-pt landmarks) on a copy of the image
    (MTCNN/visualization_utils.py:show_bboxes)."""
    import cv2

    out = np.ascontiguousarray(img_bgr).copy()
    for b in np.asarray(boxes):
        x1, y1, x2, y2 = (int(round(v)) for v in b[:4])
        cv2.rectangle(out, (x1, y1), (x2, y2), (255, 255, 255), 2)
    if landmarks is not None:
        for lm in np.asarray(landmarks):
            for i in range(5):
                cv2.circle(out, (int(round(lm[i])), int(round(lm[i + 5]))),
                           2, (0, 0, 255), -1)
    return out
