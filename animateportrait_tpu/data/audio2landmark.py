"""Audio2landmark training dataset: the reference's pickle-dump format.

Behavioral equivalent of
`Module1/src/dataset/audio2landmark/audio2landmark_dataset.py`: loads
`random_val_{au,fl}.pickle` dumps (lists of (array, info) tuples),
normalizes audio features by the vendored mean/std (:47-53), shuffles with
the reference's fixed seed, and collates 18-frame stride-1 windows
(:63-84). `estimate_neck` reproduces :108-110.
"""
from __future__ import annotations

import os
import pickle
import random

import numpy as np

from animateportrait_tpu.pipeline.audio import normalize_audio_features
from animateportrait_tpu.pipeline.landmark import sliding_windows


def estimate_neck(fl: np.ndarray) -> np.ndarray:
    """audio2landmark_dataset.py:108-110."""
    mid_ch = (fl[2, :] + fl[14, :]) * 0.5
    return (mid_ch * 2 - fl[33, :]).reshape(1, 3)


class Audio2landmarkDataset:
    """Loads the fl/au pickle dumps and emits windowed training items."""

    def __init__(self, dump_dir: str, dump_name: str = "random",
                 status: str = "val", num_window_frames: int = 18,
                 num_window_step: int = 1, normalize_au: bool = True):
        self.num_window_frames = num_window_frames
        self.num_window_step = num_window_step
        with open(os.path.join(
                dump_dir, f"{dump_name}_{status}_fl.pickle"), "rb") as fp:
            self.fl_data = pickle.load(fp)
        with open(os.path.join(
                dump_dir, f"{dump_name}_{status}_au.pickle"), "rb") as fp:
            self.au_data = pickle.load(fp)
        # reference shuffle with fixed seed (:40-45)
        valid_idx = list(range(len(self.au_data)))
        random.Random(0).shuffle(valid_idx)
        self.fl_data = [self.fl_data[i] for i in valid_idx]
        self.au_data = [self.au_data[i] for i in valid_idx]
        if normalize_au:
            self.au_data = [(normalize_audio_features(au), info)
                            for au, info in self.au_data]

    def __len__(self):
        return len(self.fl_data)

    def __getitem__(self, item):
        return self.fl_data[item], self.au_data[item]

    def collate_in_segments(self, batch):
        """(fls (N,W,204), aus (N,W,80), embs (N,256)) over stride-1
        windows of every clip in `batch` (:63-84)."""
        fls, aus, embs = [], [], []
        for (fl, _fl_info), (au, au_info) in batch:
            assert fl.shape[0] == au.shape[0]
            w, s = self.num_window_frames, self.num_window_step
            fls.append(sliding_windows(np.asarray(fl, np.float32), w, s))
            aus.append(sliding_windows(np.asarray(au, np.float32), w, s))
            emb = np.asarray(au_info[2], np.float32).reshape(-1)
            embs.append(np.tile(emb[None], (fls[-1].shape[0], 1)))
        return (np.concatenate(fls), np.concatenate(aus),
                np.concatenate(embs))
