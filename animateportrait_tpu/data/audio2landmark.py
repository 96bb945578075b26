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


# --- speaker-aware branch: gaze registration + dataset (:111-288) ---

T_SHAPE_IDX = (27, 28, 29, 30, 33, 36, 39, 42, 45)

_11SPK = ('48uYS3bHIA8', 'E0zgrhQ0QDw', 'E_kmpT-EfOg', 'J-NPsvtQ8lE',
          'Z7WRt--g-h4', '_ldiVrXgZKc', 'irx71tYyI-Q', 'sxCbrYjBsGA',
          'wAAMEC1OsRc', 'W6uRNCJmdtI', 'bXpavyiCu10')


def _quat_from_matrix(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion in scipy's (x, y, z, w) order."""
    from scipy.spatial.transform import Rotation
    return Rotation.from_matrix(m).as_quat()


def default_anchor_t_shape() -> np.ndarray:
    """ANCHOR_T_SHAPE_9 normalized the reference way (:116-122)."""
    from animateportrait_tpu.utils.assets import anchor_t_shape_9
    anchor = anchor_t_shape_9()
    s = np.abs(anchor[5, 0] - anchor[8, 0])
    anchor = anchor / s
    return anchor - np.mean(anchor[[4, 5, 8], :], axis=0)


def norm_output_fls_rot(fl_data: np.ndarray,
                        anchor_t_shape: np.ndarray | None = None
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """norm_output_fls_rot (audio2landmark_dataset.py:111-153).

    Registers every frame's 9 anchor landmarks onto the anchor T-shape by
    ICP; returns (rot_trans (T,3,4), rot_quats (T,4) xyzw, registered fls
    (T,68,3)). This is the producer of the `_gaze.pickle` dumps the
    speaker-aware dataset consumes.
    """
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.ops.geometry import icp

    if anchor_t_shape is None:
        anchor_t_shape = default_anchor_t_shape()
    else:
        anchor_t_shape = anchor_t_shape.reshape(68, 3)[list(T_SHAPE_IDX)]
    fl = fl_data.reshape(-1, 68, 3).astype(np.float64)
    anchor_j = jnp.asarray(anchor_t_shape)
    # one vmapped device call for the whole clip (per-frame host loops
    # cost a dispatch round trip each on the remote-TPU backend)
    t_hom = np.asarray(jax.jit(jax.vmap(
        lambda pts: icp(pts, anchor_j)[0]))(
        jnp.asarray(fl[:, list(T_SHAPE_IDX)])))
    rot = t_hom[:, :3, :3]
    trans = t_hom[:, :3, 3]
    fl = np.einsum("tij,tpj->tpi", rot, fl) + trans[:, None, :]
    rot_trans = t_hom[:, :3, :]
    rot_quats = _quat_from_matrix(rot)
    return rot_trans, rot_quats, fl


def close_face_lip(fl: np.ndarray) -> int:
    """Index of the most-closed-mouth frame (:155-165)."""
    fl = fl.reshape(-1, 68, 3)
    areas = [abs(float(np.asarray(
        _signed_area(f[60:68, 0:2])))) for f in fl]
    return int(np.argmin(areas))


def _signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)


class SpeakerAwareDataset:
    """Speaker_aware_branch_Dataset (:169-288): au/fl dumps + gaze pickle
    (rot_trans / rot_quat / anchor_t_shape), optional 11-speaker filter,
    fixed-seed shuffle, mean/std audio normalization."""

    def __init__(self, dump_dir: str, dump_name: str = "random",
                 status: str = "val", num_window_frames: int = 18,
                 num_window_step: int = 1, use_11spk_only: bool = False,
                 noautovc: str = ""):
        self.num_window_frames = num_window_frames
        self.num_window_step = num_window_step
        with open(os.path.join(
                dump_dir,
                f"{dump_name}_{status}_{noautovc}au.pickle"), "rb") as fp:
            self.au_data = pickle.load(fp)
        with open(os.path.join(
                dump_dir,
                f"{dump_name}_{status}_{noautovc}fl.pickle"), "rb") as fp:
            self.fl_data = pickle.load(fp)
        with open(os.path.join(
                dump_dir, f"{dump_name}_{status}_gaze.pickle"),
                "rb") as fp:
            gaze = pickle.load(fp)
        self.rot_trans = gaze["rot_trans"]
        self.rot_quats = gaze["rot_quat"]
        self.anchor_t_shape = gaze["anchor_t_shape"]

        valid_idx = []
        for i, fl in enumerate(self.fl_data):
            if use_11spk_only:
                if fl[1][1][:-4].split("_x_")[1] in _11SPK:
                    valid_idx.append(i)
            else:
                valid_idx.append(i)
        random.Random(0).shuffle(valid_idx)
        for name in ("fl_data", "au_data", "rot_trans", "rot_quats",
                     "anchor_t_shape"):
            src = getattr(self, name)
            setattr(self, name, [src[i] for i in valid_idx])
        self.au_data = [(normalize_audio_features(au), info)
                        for au, info in self.au_data]

    def __len__(self):
        return len(self.fl_data)

    def __getitem__(self, item):
        return (self.fl_data[item], self.au_data[item],
                self.rot_trans[item], self.rot_quats[item],
                self.anchor_t_shape[item])

    def collate_in_segments(self, batch):
        """(fls, aus, embs, regist_fls, rot_trans, rot_quats) over
        stride-1 windows; rot_trans has [I | 0] subtracted (:263-266)."""
        fls, aus, embs = [], [], []
        regist_fls, rot_trans, rot_quats = [], [], []
        w, s = self.num_window_frames, self.num_window_step
        minus_eye = np.concatenate(
            [np.eye(3), np.zeros((3, 1))], axis=1)[None]
        for fl, au, rot_tran, rot_quat, anchor in batch:
            fl_data, au_data, emb = fl[0], au[0], au[1][2]
            assert fl_data.shape[0] == au_data.shape[0]
            fls.append(sliding_windows(
                np.asarray(fl_data, np.float32), w, s))
            aus.append(sliding_windows(
                np.asarray(au_data, np.float32), w, s))
            n = fls[-1].shape[0]
            embs.append(np.tile(
                np.asarray(emb, np.float32).reshape(-1)[None], (n, 1)))
            regist_fls.append(sliding_windows(np.asarray(
                anchor, np.float32).reshape(-1, 204), w, s))
            rot_trans.append(sliding_windows(
                (np.asarray(rot_tran, np.float32) - minus_eye), w, s))
            rot_quats.append(sliding_windows(
                np.asarray(rot_quat, np.float32), w, s))
        return tuple(np.concatenate(x) for x in
                     (fls, aus, embs, regist_fls, rot_trans, rot_quats))
