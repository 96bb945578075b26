"""Dataset builder: video -> per-frame 3D landmarks (+ audio features).

Behavioral equivalent of `Module1/src/dataset/utils/Av2Flau_Convertor.py`:
preclean (fps check), per-frame facial landmarks, raw fl3d dump, audio
extraction, and ICP registration to the 9-point anchor T-shape. Frames are
decoded with cv2 (no ffmpeg binary in this environment — the audio track
must be supplied as a separate WAV when the container's audio is needed);
the landmark source is injectable (converted FAN, or the MTCNN 5-pt
canonical fallback).
"""
from __future__ import annotations

import os
from typing import Callable

import numpy as np

from animateportrait_tpu.utils import assets


def read_video_frames(path: str, max_frames: int = 250,
                      every: int = 1) -> tuple[np.ndarray, float]:
    """Decode up to max_frames BGR frames + fps via cv2."""
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    i = 0
    while len(frames) < max_frames:
        ok, f = cap.read()
        if not ok:
            break
        if i % every == 0:
            frames.append(f)
        i += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames), float(fps)


def register_to_anchor(fl3d: np.ndarray) -> np.ndarray:
    """ICP-register every frame's 9 anchor points to the canonical T-shape
    and apply the rigid transform to all 68 points
    (Av2Flau_Convertor.__single_landmark_3d_register__ semantics)."""
    import jax.numpy as jnp

    from animateportrait_tpu.ops.geometry import best_fit_transform

    anchor = assets.std_face_landmarks()[list(assets.T_SHAPE_IDX)]
    out = np.array(fl3d, np.float64).reshape(-1, 68, 3)
    for t in range(out.shape[0]):
        src = out[t, list(assets.T_SHAPE_IDX)]
        T, R, tr = best_fit_transform(jnp.asarray(src), jnp.asarray(anchor))
        R = np.asarray(R)
        tr = np.asarray(tr)
        out[t] = out[t] @ R.T + tr
    return out.reshape(-1, 204)


class Av2FlauConverter:
    """video (+ wav) -> (fl3d (T, 1+204), audio features).

    fl3d rows are [frame_index, 68x3 landmarks] like the reference's
    raw_fl3d txt dumps.
    """

    def __init__(self, landmark_fn: Callable[[np.ndarray], np.ndarray],
                 audio_pipeline=None):
        """landmark_fn: BGR frame -> (68, 3) landmarks (or raise/None to
        skip the frame)."""
        self.landmark_fn = landmark_fn
        self.audio_pipeline = audio_pipeline

    def convert(self, video_path: str, wav_path: str | None = None,
                out_dir: str | None = None, max_frames: int = 250,
                register: bool = False):
        frames, fps = read_video_frames(video_path, max_frames)
        rows = []
        for i, frame in enumerate(frames):
            try:
                lm = self.landmark_fn(frame)
            except Exception:
                lm = None
            if lm is None:
                continue
            rows.append(np.concatenate(
                [[i], np.asarray(lm, np.float64).reshape(-1)]))
        if len(rows) < 9:
            raise ValueError("landmark sequence too short "
                             f"({len(rows)} frames)")
        fl3d = np.stack(rows)
        if register:
            fl3d = np.concatenate(
                [fl3d[:, :1], register_to_anchor(fl3d[:, 1:])], axis=1)

        feats = None
        if wav_path is not None and self.audio_pipeline is not None:
            from animateportrait_tpu.pipeline.audio import load_wav

            feats = self.audio_pipeline(load_wav(wav_path))

        if out_dir is not None:
            os.makedirs(os.path.join(out_dir, "raw_fl3d"), exist_ok=True)
            base = os.path.splitext(os.path.basename(video_path))[0]
            np.savetxt(os.path.join(out_dir, "raw_fl3d",
                                    f"fan_{base}_3d.txt"), fl3d, fmt="%.2f")
        return fl3d, feats, fps
