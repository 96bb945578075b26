"""End-to-end pipeline: one face photo + one speech WAV -> talking-portrait
video frames.

In-memory equivalent of `main_end2end_module2.py`: no filesystem pickles, no
os.system subprocesses — each stage passes arrays to the next, and the
per-frame GAN rendering is batched on device.

Stages (reference driver lines in parentheses):
  1. MTCNN detect + align crop to 512 (:12-45, :184)
  2. 68-pt landmarks (FAN hook or 5-pt canonical-face fallback), the
     manual lip/eye tweak (:195-198), norm_input_face (:202)
  3. audio features: -20 dBFS, mel/f0, speaker emb, AutoVC (:206-228)
  4. landmark prediction over 18-frame windows (:254-256)
  5. landmark un-normalization, add_naive_eye, split savgol (:259-271)
  6. Module2 renderer per frame (:342 -> Module2/test.py)
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from animateportrait_tpu.ops import geometry
from animateportrait_tpu.pipeline.align import (
    detect_and_align, estimate_landmarks_from_5pt)
from animateportrait_tpu.pipeline.audio import (
    AudioPipeline, load_wav, normalize_audio_features)
from animateportrait_tpu.pipeline.landmark import (
    LandmarkPredictor, sliding_windows)
from animateportrait_tpu.pipeline.render import Module2Renderer
from animateportrait_tpu.utils import assets


FPS = 62.5  # 16000 Hz / 256-sample hop (main_end2end_module2.py:306,342)


@dataclasses.dataclass
class PipelineOutputs:
    frames: np.ndarray          # (T, 256, 256, nc): [-1,1] f32 or uint8
    landmarks: np.ndarray       # (T, 68, 3) in aligned-512 space
    aligned_photo: np.ndarray   # (512, 512, 3) BGR uint8
    fps: float = FPS


class TalkingPortraitPipeline:
    """photo path/array + wav path/array -> frames."""

    def __init__(self, mtcnn_detector, landmark_predictor: LandmarkPredictor,
                 audio_pipeline: AudioPipeline, renderer: Module2Renderer,
                 landmark_fn: Callable[[np.ndarray], np.ndarray] | None = None):
        """landmark_fn: optional aligned-BGR-512 -> (68, 3) landmark hook
        (e.g. a converted FAN); defaults to the 5-pt canonical fallback."""
        self.detector = mtcnn_detector
        self.predictor = landmark_predictor
        self.audio = audio_pipeline
        self.renderer = renderer
        self.landmark_fn = landmark_fn

    def prepare_face(self, img_bgr: np.ndarray):
        aligned, five = detect_and_align(img_bgr, self.detector)
        if self.landmark_fn is not None:
            shape_3d = np.asarray(self.landmark_fn(aligned), np.float64)
        else:
            shape_3d = estimate_landmarks_from_5pt(five)
        # manual lip/eye adjustment (main_end2end_module2.py:195-198)
        shape_3d = shape_3d.copy()
        shape_3d[49:54, 1] += 1.0
        shape_3d[55:60, 1] -= 1.0
        shape_3d[[37, 38, 43, 44], 1] -= 2.0
        shape_3d[[40, 41, 46, 47], 1] += 2.0
        raw_shape = shape_3d.copy()  # aligned-512 pixel space, for `ori`
        std = assets.std_face_landmarks()
        norm_shape, scale, shift = geometry.norm_input_face(shape_3d, std)
        return aligned, raw_shape, norm_shape, scale, shift

    def __call__(self, img_bgr: np.ndarray, wav: np.ndarray | str,
                 gender: str = "F",
                 rng: np.random.Generator | None = None,
                 spk_emb_override: np.ndarray | None = None,
                 output_folder: str | None = None,
                 dump_dir: str | None = None,
                 audio_name: str = "audio") -> PipelineOutputs:
        """spk_emb_override: use this 256-d speaker embedding for the
        landmark branch instead of the one computed from `wav` — the
        `--reuse_train_emb_list` saved-embedding path
        (train_audio2landmark.py:263-275 `test_embs[key]`).

        output_folder: write the reference's step-5 artifact there —
        `pred_fls_<audio_name>_audio_embed.txt`, the normalized predicted
        landmarks in %.6f (train_audio2landmark.py:340-342).
        dump_dir: write the reference's `random_val_{fl,au,gaze}.pickle`
        stage dumps (main_end2end_module2.py:230-251) — the inputs the
        Module1 trainers consume."""
        import os
        import sys
        import time

        def log(msg):
            print(f"[pipeline +{time.time() - t0:6.1f}s] {msg}",
                  file=sys.stderr, flush=True)

        t0 = time.time()
        if isinstance(wav, str):
            wav = load_wav(wav)

        # Warm the renderer's jits on a dummy photo/landmark set in the
        # background: its compile/cache-load (tens of seconds in a fresh
        # process) overlaps the align + audio + landmark stages instead
        # of serializing in front of the first real frame batch.
        import threading

        def _warm():
            try:
                r = np.random.default_rng(0)
                dummy_photo = r.uniform(-1, 1, (256, 256, 3)).astype(
                    np.float32)
                d68 = r.uniform(80.0, 180.0, (68, 2)).astype(np.float32)
                tb = d68[None] + r.uniform(
                    -2, 2, (self.renderer.frame_batch, 68, 2)).astype(
                    np.float32)
                self.renderer(dummy_photo, d68, tb)
            except Exception as e:  # warmup best-effort; real call surfaces
                log(f"renderer warmup failed ({type(e).__name__}: {e}); "
                    "first render batch will compile inline")

        warm_thread = threading.Thread(target=_warm, daemon=True)
        warm_thread.start()

        aligned, raw_shape, norm_shape, scale, shift = self.prepare_face(
            img_bgr)
        log("face aligned")

        feats = self.audio(wav, gender)
        log(f"audio features: {feats.mel_autovc.shape[0]} frames")
        if dump_dir:
            # the driver's pickled stage dumps (landmark placeholder +
            # autovc audio + zero gaze), in the reference's exact format
            # so the Module1 trainer datasets can consume them
            import pickle

            os.makedirs(dump_dir, exist_ok=True)
            mel = np.asarray(feats.mel_autovc)
            Tm = mel.shape[0]
            info = (0, audio_name, np.asarray(feats.spk_emb))
            dumps = {
                "fl": [(np.zeros((Tm, 204), np.float32), info)],
                "au": [(mel, info)],
                "gaze": {"rot_trans": [np.zeros((Tm, 3, 4))],
                         "rot_quat": [np.zeros((Tm, 4))],
                         "anchor_t_shape": [np.zeros((Tm, 204))]},
            }
            for k, v in dumps.items():
                with open(os.path.join(
                        dump_dir, f"random_val_{k}.pickle"), "wb") as fp:
                    pickle.dump(v, fp)
            log(f"stage dumps written to {dump_dir}")
        au = normalize_audio_features(feats.mel_autovc)
        windows = sliding_windows(au)
        face_id = norm_shape.reshape(1, 204).astype(np.float32)
        spk = (np.asarray(spk_emb_override, np.float32).reshape(-1)
               if spk_emb_override is not None else feats.spk_emb)
        fl = self.predictor(windows, spk, face_id)  # (T, 204)
        log(f"landmarks predicted: {fl.shape[0]} frames")
        if output_folder:
            os.makedirs(output_folder, exist_ok=True)
            np.savetxt(os.path.join(
                output_folder,
                f"pred_fls_{audio_name}_audio_embed.txt"),
                np.asarray(fl).reshape(-1, 204), fmt="%.6f")

        # un-normalize back to aligned-512 pixel space (:265-266)
        fl = fl.reshape(-1, 68, 3).astype(np.float64)
        fl[:, :, 0:2] = -fl[:, :, 0:2]
        fl[:, :, 0:2] = fl[:, :, 0:2] / scale - shift
        fl = geometry.add_naive_eye(fl, rng or np.random.default_rng(0))
        flat = fl.reshape(-1, 204)
        T = flat.shape[0]
        # reference windows 15/5; clamp for very short clips
        w_face = min(15, (T - 1) // 2 * 2 + 1)
        w_lip = min(5, (T - 1) // 2 * 2 + 1)
        if w_face >= 5:
            # host scipy, not ops.filters: the (T, 204) array lives on
            # the host here, and two device round trips through the
            # tunnel cost more than the filter itself (reference uses
            # scipy at this exact spot, main_end2end_module2.py:268-271)
            from scipy.signal import savgol_filter as sp_savgol

            flat[:, : 48 * 3] = sp_savgol(
                flat[:, : 48 * 3], w_face, 3, axis=0)
            flat[:, 48 * 3:] = sp_savgol(
                flat[:, 48 * 3:], w_lip, 3, axis=0)
        fl = flat.reshape(-1, 68, 3)

        # render at 256: photo and landmarks scale by 256/512
        # (umlvdfw_test_dataset trans with load_size 256)
        import cv2

        photo256 = cv2.resize(aligned, (256, 256),
                              interpolation=cv2.INTER_CUBIC)
        photo_rgb = photo256[:, :, ::-1].astype(np.float32) / 127.5 - 1.0
        # source landmarks: the same detected shape, back in pixel space
        # (the driver's ori.txt, main_end2end_module2.py:310-331), scaled
        # by load_size/512 like the test dataset's trans_lm
        a68 = (raw_shape[:, :2] * (256.0 / 512.0)).astype(np.float32)
        tb68 = fl[:, :, :2] * (256.0 / 512.0)
        # Renderer programs ready (compiled/loaded). Bounded join: a wedged
        # warmup (device hang/OOM) must not deadlock the pipeline — fall
        # through and let the real render call compile/surface the error.
        warm_thread.join(timeout=600.0)
        if warm_thread.is_alive():
            log("renderer warmup still running after 600s; "
                "proceeding — the real render call will wait on the device")
        frames = self.renderer(
            photo_rgb, a68, tb68.astype(np.float32),
            progress=lambda i, n: log(f"rendered {i}/{n}"))
        log("render done")
        return PipelineOutputs(frames=frames, landmarks=fl,
                               aligned_photo=aligned)
