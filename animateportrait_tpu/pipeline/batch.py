"""Batched front end: multi-photo MTCNN + multi-audio landmark prediction.

BASELINE config 3 ("Batched front-end: MTCNN detection + Module1 landmark
prediction over multi-photo/multi-audio batches"). The reference processes
one photo/audio at a time; here same-shape photos run through ONE vmapped
cascade program, and audios are grouped by frame count so each group's
landmark segments run as one vmapped device computation (a 512-frame
segment is one attention sequence, so batching happens across audios, not
by concatenating them).
"""
from __future__ import annotations

import collections

import numpy as np

import jax
import jax.numpy as jnp


def detect_faces_batch(detector, imgs: np.ndarray,
                       min_face_size: float = 20.0,
                       thresholds=(0.6, 0.7, 0.8),
                       nms_thresholds=(0.7, 0.7, 0.7)):
    """MTCNN over a stack of same-size RGB images (B, H, W, 3).

    Returns a list of (boxes, landmarks) per image. One compiled program
    for the whole batch (vmapped cascade) instead of B dispatches.
    """
    from animateportrait_tpu.models.mtcnn import pyramid_scales

    imgs = np.asarray(imgs)
    b, h, w = imgs.shape[:3]
    scales = tuple(pyramid_scales(h, w, min_face_size))
    key = ("batch", h, w, scales, tuple(thresholds),
           tuple(nms_thresholds))
    if key not in detector._jit_cache:
        single = lambda im: detector._detect(  # noqa: E731
            im, scales, h, w, thresholds, nms_thresholds)
        detector._jit_cache[key] = jax.jit(jax.vmap(single))
    boxes, lms, keep = detector._jit_cache[key](
        jnp.asarray(imgs, jnp.float32))
    boxes, lms, keep = map(np.asarray, (boxes, lms, keep))
    return [(boxes[i][keep[i]], lms[i][keep[i]]) for i in range(b)]


class BatchedLandmarkPredictor:
    """Run the audio->landmark engine for many audios at once.

    Audios are grouped by window count; within a group every post-processing
    step (savgol, close-mouth, calibration, inverse-lip scan) is vmapped, so
    per-audio numerics are identical to the single-audio engine.
    """

    def __init__(self, predictor):
        self.p = predictor
        self._vmapped = {}

    def _group_fn(self):
        if "seg" not in self._vmapped:
            # weights enter as (unbatched) jit args, same as the
            # single-item predictor
            self._vmapped["seg"] = jax.jit(jax.vmap(
                self.p._segment, in_axes=(None, None, 0, 0, 0)))
        return self._vmapped["seg"]

    def __call__(self, windows_list, embs, face_ids) -> list[np.ndarray]:
        from animateportrait_tpu.ops.filters import savgol_filter
        from animateportrait_tpu.pipeline.landmark import (
            SEG_BS, revise_nose_top)

        results: dict[int, np.ndarray] = {}
        groups = collections.defaultdict(list)
        for i, w in enumerate(windows_list):
            groups[w.shape[0]].append(i)

        seg_fn = self._group_fn()
        for T, idxs in groups.items():
            if T < 10:
                for i in idxs:
                    results[i] = np.zeros((0, 204), np.float32)
                continue
            outs_per_audio = [[] for _ in idxs]
            for j in range(0, T, SEG_BS):
                seg_len = min(SEG_BS, T - j)
                if seg_len < 10:
                    continue
                aus = jnp.asarray(np.stack(
                    [windows_list[i][j: j + seg_len] for i in idxs]),
                    jnp.float32)
                embs_b = jnp.asarray(np.stack(
                    [np.tile(embs[i][None], (seg_len, 1)) for i in idxs]),
                    jnp.float32)
                fids = jnp.asarray(np.stack(
                    [np.asarray(face_ids[i]).reshape(1, 204)
                     for i in idxs]), jnp.float32)
                seg_out = seg_fn(self.p.pos_variables,
                                 self.p.content_variables,
                                 aus, embs_b, fids)
                for k in range(len(idxs)):
                    outs_per_audio[k].append(np.asarray(seg_out[k]))
            for k, i in enumerate(idxs):
                fl = jnp.asarray(np.concatenate(outs_per_audio[k], axis=0))
                fl = revise_nose_top(fl)
                fl = savgol_filter(fl, 5, 3, axis=0)
                results[i] = np.asarray(fl)
        return [results[i] for i in range(len(windows_list))]
