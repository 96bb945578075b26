"""Vendored numeric assets from the reference (landmark tables, norms).

These are data tables, not code: the canonical 68-pt face shape, the
audio-feature normalization constants, the Obama target speaker embedding
used by the AutoVC normalizer, and the 64-edge landmark-drawing lookup.
"""
from __future__ import annotations

import functools
import os

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


@functools.lru_cache(maxsize=None)
def std_face_landmarks() -> np.ndarray:
    """Canonical 68x3 face shape (STD_FACE_LANDMARKS.txt)."""
    return np.loadtxt(os.path.join(ASSET_DIR, "STD_FACE_LANDMARKS.txt"))


@functools.lru_cache(maxsize=None)
def autovc_mel_au_mean_std() -> tuple[np.ndarray, np.ndarray]:
    """(mean, std) for AutoVC-mel audio features
    (MEAN_STD_AUTOVC_RETRAIN_MEL_AU.txt, first/second half)."""
    ms = np.loadtxt(
        os.path.join(ASSET_DIR, "MEAN_STD_AUTOVC_RETRAIN_MEL_AU.txt"))
    return ms[: ms.shape[0] // 2], ms[ms.shape[0] // 2:]


@functools.lru_cache(maxsize=None)
def obama_speaker_emb() -> np.ndarray:
    """256-d target speaker embedding for voice normalization."""
    return np.loadtxt(os.path.join(ASSET_DIR, "obama_emb.txt"))


@functools.lru_cache(maxsize=None)
def anchor_t_shape_9() -> np.ndarray:
    """9-point anchor T-shape used for ICP registration."""
    return np.loadtxt(os.path.join(ASSET_DIR, "ANCHOR_T_SHAPE_9.txt"))


@functools.lru_cache(maxsize=None)
def face_lmark_lookup() -> np.ndarray:
    """(64, 2) landmark edge list (lips first 20) for line drawing."""
    return np.load(os.path.join(ASSET_DIR, "faceLmarkLookup.npy"))


T_SHAPE_IDX = (27, 28, 29, 30, 33, 36, 39, 42, 45)
