"""Image-translation (MakeItTalk renderer) dataset.

In-memory equivalent of the eleven `image_translation_dataset.py` classes
(SURVEY.md §2.12): pairs a reference frame with a target frame and the
target's rendered landmark sketch. Items are
(image_in = cat(reference_frame, sketch(target_landmarks)), image_out =
target_frame), normalized to [0, 1] like the reference trainer feeds the
ResUnet.
"""
from __future__ import annotations

import numpy as np

from animateportrait_tpu.utils.vis import (
    _CURVES, _CURVES_98, vis_landmark_on_img)


def render_sketch(lm: np.ndarray, size: int, linewidth: int = 2
                  ) -> np.ndarray:
    """Black canvas + colored landmark curves, float [0, 1] (H, W, 3)."""
    img = np.zeros((size, size, 3), np.uint8)
    curves = _CURVES_98 if lm.shape[0] >= 98 else _CURVES
    vis_landmark_on_img(img, lm[:, :2], linewidth, curves)
    return img.astype(np.float32) / 255.0


class ImageTranslationDataset:
    """frames (T, H, W, 3) uint8 + landmarks (T, 68|98, 2) -> training
    pairs; the reference frame is sampled per item (raw98 semantics)."""

    def __init__(self, frames: np.ndarray, landmarks: np.ndarray):
        assert frames.shape[0] == landmarks.shape[0]
        self.frames = frames
        self.landmarks = landmarks

    def __len__(self):
        return self.frames.shape[0]

    def sample(self, index: int, rng: np.random.Generator) -> dict:
        t = index % len(self)
        ref = int(rng.integers(0, len(self)))
        size = self.frames.shape[1]
        tgt = self.frames[t].astype(np.float32) / 255.0
        src = self.frames[ref].astype(np.float32) / 255.0
        sketch = render_sketch(self.landmarks[t], size)
        return {
            "image_in": np.concatenate([src, sketch], axis=-1),
            "image_out": tgt,
        }

    def batch(self, indices, rng: np.random.Generator) -> dict:
        items = [self.sample(i, rng) for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}
