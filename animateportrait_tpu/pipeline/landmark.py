"""Audio -> landmark inference engine with the full post-processing chain.

Behavioral equivalent of the reference engine
(`Module1/src/approaches/train_audio2landmark.py:101-351,594-617`), rebuilt
so every per-segment step — pos branch, Savitzky-Golay smoothing,
close-mouth blending, content branch, min-K calibration, inverse-lip fix —
is one jitted device computation (the reference ping-pongs CPU<->GPU per
step). The only Python loop is over 512-frame segments, a hard semantic
boundary because the pos transformer attends over the segment as one
sequence.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from animateportrait_tpu.models.audio2landmark import (
    Audio2landmarkContent, Audio2landmarkPos)
from animateportrait_tpu.ops.filters import savgol_filter
from animateportrait_tpu.ops.geometry import area_of_signed_polygon

SEG_BS = 512
NUM_WINDOW_FRAMES = 18

_OUT_UP = jnp.arange(49, 54)          # outer-lip upper arc
_OUT_LO = jnp.arange(59, 54, -1)      # outer-lip lower arc (reversed pairs)
_IN_UP = jnp.arange(61, 64)           # inner-lip upper arc
_IN_LO = jnp.arange(67, 64, -1)       # inner-lip lower arc


def sliding_windows(au: np.ndarray, window: int = NUM_WINDOW_FRAMES,
                    step: int = 1) -> np.ndarray:
    """(T, 80) -> (T-window, window, 80) stride-1 windows, matching the
    reference collate (`audio2landmark_dataset.py:63-84`, which drops the
    final window via ``range(0, T - window)``)."""
    T = au.shape[0]
    idx = np.arange(0, T - window, step)[:, None] + np.arange(window)[None, :]
    return au[idx]


def close_mouth_blend(fl: jax.Array, ratio: float = 0.99) -> jax.Array:
    """Blend upper/lower lip arcs toward their midline
    (train_audio2landmark.py:118-129). fl: (T, 68, 3)."""

    def blend(f, up, lo):
        mean = 0.5 * (f[:, up] + f[:, lo])
        f = f.at[:, up].set(mean * ratio + f[:, up] * (1 - ratio))
        f = f.at[:, lo].set(mean * ratio + f[:, lo] * (1 - ratio))
        return f

    fl = blend(fl, _OUT_UP, _OUT_LO)
    fl = blend(fl, _IN_UP, _IN_LO)
    return fl


def calibrate_content(baseline: jax.Array, amp_lip_x: float,
                      amp_lip_y: float, ratio: float = 0.5) -> jax.Array:
    """Per-coordinate min-K de-biasing + lip amplification
    (train_audio2landmark.py:235-245). baseline: (T, 204)."""
    T = baseline.shape[0]
    K = int(T * ratio)
    smallest = jnp.sort(baseline, axis=0)[:K]
    m = jnp.mean(smallest, axis=0, keepdims=True)
    out = baseline - m
    lip = jnp.arange(48, 68)
    out = out.at[:, lip * 3].multiply(amp_lip_x)
    out = out.at[:, lip * 3 + 1].multiply(amp_lip_y)
    return out


def _collapse_inner_lip(f: jax.Array) -> jax.Array:
    """Swap-collapse inner lip pairs 63<->65, 62<->66, 61<->67 (the first
    half of the reference's inversion fix). f: (68, 3)."""
    for up, lo in ((63, 65), (62, 66), (61, 67)):
        mean = 0.5 * (f[up] + f[lo])
        f = f.at[lo].set(mean)
        f = f.at[up].set(mean)
    return f


def _inverse_lip_fix_frame(cur: jax.Array, prev: jax.Array,
                           y_transfer: bool = True) -> jax.Array:
    """Apply the reference's mouth-inversion fix to one (204,) frame given
    the (already fixed) previous frame (train_audio2landmark.py:594-617)."""
    fls = cur.reshape(68, 3)
    area = area_of_signed_polygon(fls[60:68, 0:2])

    def fix(c):
        f = _collapse_inner_lip(c.reshape(68, 3))
        if not y_transfer:
            return f.reshape(204)
        p = prev.reshape(68, 3)
        # y-only transfers keyed to the previous frame
        f = f.at[jnp.arange(55, 59), 1].set(
            f[jnp.arange(64, 68), 1] + p[jnp.arange(55, 59), 1]
            - p[jnp.arange(64, 68), 1])
        f = f.at[59, 1].set(f[60, 1] + p[59, 1] - p[60, 1])
        f = f.at[jnp.arange(49, 54), 1].set(
            f[jnp.arange(60, 65), 1] + p[jnp.arange(49, 54), 1]
            - p[jnp.arange(60, 65), 1])
        return f.reshape(204)

    return jax.lax.cond(area < 0, fix, lambda c: c, cur)


def solve_inverse_lip(fl: jax.Array) -> jax.Array:
    """Sequential mouth-inversion fix over a (T, 204) segment via lax.scan.

    Frame 0 references itself (reference's ``p = max(j-1, 0)``): because
    numpy evaluates each in-place statement against the CURRENT row, the
    frame-0 y transfers cancel exactly — so frame 0 gets only the
    swap-collapse, and the scan then carries each *fixed* frame as the
    next frame's reference.
    """
    first = _inverse_lip_fix_frame(fl[0], fl[0], y_transfer=False)

    def step(prev, cur):
        fixed = _inverse_lip_fix_frame(cur, prev)
        return fixed, fixed

    _, rest = jax.lax.scan(step, first, fl[1:])
    return jnp.concatenate([first[None], rest], axis=0)


def revise_nose_top(fl: jax.Array) -> jax.Array:
    """Extrapolate nose-top point 27 from 28/29
    (train_audio2landmark.py:304). fl: (T, 204)."""
    return fl.at[:, 27 * 3: 28 * 3].set(
        fl[:, 28 * 3: 29 * 3] * 2 - fl[:, 29 * 3: 30 * 3])


class LandmarkPredictor:
    """Drives the pos (G) and content (C) branches over audio windows.

    Args mirror the reference driver defaults (`main_end2end_module2.py`
    argparse): amp_pos=0.5, amp_lip_x=amp_lip_y=2.0.
    """

    def __init__(self, pos_variables, content_variables,
                 amp_pos: float = 0.5, amp_lip_x: float = 2.0,
                 amp_lip_y: float = 2.0, emb_coef: float = 3.0):
        # device_put once: host-resident weights passed as jit args
        # re-upload through the (slow) TPU tunnel on every call
        dev = jax.devices()[0]
        put = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jax.device_put(x, dev), t)
        self.pos_variables = put(pos_variables)
        self.content_variables = put(content_variables)
        self.amp_pos = amp_pos
        self.amp_lip_x = amp_lip_x
        self.amp_lip_y = amp_lip_y
        self.emb_coef = emb_coef
        self._G = Audio2landmarkPos()
        self._C = Audio2landmarkContent()
        # weights are jit ARGUMENTS, not closure constants — inlined
        # weights bloat the program with hundreds of MB of literals and
        # defeat compile caching (a fresh multi-minute compile per process)
        self._segment_jit = jax.jit(
            self._segment, static_argnames=("smooth_win",))

    def _segment(self, pos_v, content_v, aus, embs, face_id,
                 smooth_win=31):
        """One <=512-frame segment: everything on device."""
        T = aus.shape[0]
        z = jnp.zeros((T, 128), jnp.float32)
        fl_dis, _, _ = self._G.apply(
            pos_v, aus, embs * self.emb_coef, face_id, z)
        smooth_len = min(T - 1, smooth_win) // 2 * 2 + 1
        fl_dis = savgol_filter(fl_dis, smooth_len, 3, axis=0)
        fl_dis = close_mouth_blend(fl_dis.reshape(-1, 68, 3)).reshape(-1, 204)
        fl_dis = fl_dis * self.amp_pos

        baseline, _ = self._C.apply(
            content_v, aus[:, 0:NUM_WINDOW_FRAMES, :], face_id)
        baseline = calibrate_content(
            baseline, self.amp_lip_x, self.amp_lip_y)
        fl = fl_dis + baseline + face_id[0:1]
        return solve_inverse_lip(fl)

    def __call__(self, au_windows: np.ndarray, emb: np.ndarray,
                 face_id: np.ndarray, centerize_face: bool = False,
                 no_y_rotation: bool = False) -> np.ndarray:
        """au_windows (T, 18, 80), emb (256,), face_id (1, 204) -> (T, 204).

        Segments of 512 windows; trailing segments shorter than 10 frames
        are dropped, as in the reference (:284-285). centerize_face /
        no_y_rotation mirror __train_pass__'s optional post passes
        (:313-331).
        """
        aus = jnp.asarray(au_windows, jnp.float32)
        face_id = jnp.asarray(face_id, jnp.float32).reshape(1, 204)
        T = aus.shape[0]
        emb_t = jnp.broadcast_to(
            jnp.asarray(emb, jnp.float32)[None, :], (T, emb.shape[-1]))

        outs = []
        for j in range(0, T, SEG_BS):
            seg = aus[j: j + SEG_BS]
            if seg.shape[0] < 10:
                continue
            outs.append(self._segment_jit(
                self.pos_variables, self.content_variables,
                seg, emb_t[j: j + SEG_BS], face_id))
        fl = jnp.concatenate(outs, axis=0)
        fl = revise_nose_top(fl)
        fl = savgol_filter(fl, 5, 3, axis=0)
        out = np.asarray(fl)
        if centerize_face:
            out = self._centerize(out, np.asarray(face_id))
        if no_y_rotation:
            out = self._remove_y_rotation(out)
        return out

    @staticmethod
    def _centerize(fl: np.ndarray, face_id: np.ndarray) -> np.ndarray:
        """Shift every frame's centroid to the face-id centroid (:313-318)."""
        std_m = face_id.reshape(1, 68, 3).mean(axis=1, keepdims=True)
        f = fl.reshape(-1, 68, 3)
        f = f - f.mean(axis=1, keepdims=True) + std_m
        return f.reshape(-1, 204)

    def _remove_y_rotation(self, fl: np.ndarray) -> np.ndarray:
        """ICP to the canonical T-shape, zero the x-axis Euler rotation
        (:320-331: keeps yaw/roll, removes pitch-axis term)."""
        from scipy.spatial.transform import Rotation as R

        from animateportrait_tpu.ops.geometry import icp
        from animateportrait_tpu.utils import assets

        std = assets.std_face_landmarks()
        idx = list(assets.T_SHAPE_IDX)
        std_t = std[idx]
        out = fl.reshape(-1, 68, 3).copy()
        for i in range(out.shape[0]):
            T_mat, _ = icp(jnp.asarray(out[i, idx]), jnp.asarray(std_t))
            T_mat = np.asarray(T_mat)
            rot = R.from_matrix(T_mat[:3, :3]).as_euler("xyz")
            rot = R.from_euler("xyz", [0.0, rot[1], rot[2]]).as_matrix()
            pts = out[i] - T_mat[:3, 3]
            out[i] = (np.hstack([rot, T_mat[:3, 3:4]])
                      @ np.hstack([pts, np.ones((68, 1))]).T).T
        return out.reshape(-1, 204)

    def predict_content_only(self, au_windows: np.ndarray,
                             face_id: np.ndarray) -> np.ndarray:
        """test_wo_pos: content branch only (train_audio2landmark.py:353+),
        calibrated and summed with the face id."""
        aus = jnp.asarray(au_windows, jnp.float32)
        face_id = jnp.asarray(face_id, jnp.float32).reshape(1, 204)
        baseline, _ = self._C.apply(
            self.content_variables, aus[:, 0:NUM_WINDOW_FRAMES, :], face_id)
        baseline = calibrate_content(baseline, self.amp_lip_x,
                                     self.amp_lip_y)
        fl = baseline + face_id
        fl = solve_inverse_lip(fl)
        fl = revise_nose_top(fl)
        fl = savgol_filter(fl, 5, 3, axis=0)
        return np.asarray(fl)
