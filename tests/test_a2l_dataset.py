"""Audio2landmark pickle-dump dataset round trip with synthetic dumps."""
import os
import pickle

import numpy as np


def test_a2l_dataset_collate(tmp_path, rng):
    from animateportrait_tpu.data.audio2landmark import (
        Audio2landmarkDataset, estimate_neck)

    T = 40
    fl = rng.standard_normal((T, 204)).astype(np.float32)
    au = rng.standard_normal((T, 80)).astype(np.float32)
    emb = rng.standard_normal(256).astype(np.float32)
    fl_data = [(fl, (0, "clip.wav"))]
    au_data = [(au, (0, "clip.wav", emb))]
    with open(tmp_path / "random_val_fl.pickle", "wb") as f:
        pickle.dump(fl_data, f)
    with open(tmp_path / "random_val_au.pickle", "wb") as f:
        pickle.dump(au_data, f)

    ds = Audio2landmarkDataset(str(tmp_path))
    assert len(ds) == 1
    fls, aus, embs = ds.collate_in_segments([ds[0]])
    n = len(range(0, T - 18, 1))
    assert fls.shape == (n, 18, 204)
    assert aus.shape == (n, 18, 80)
    assert embs.shape == (n, 256)
    np.testing.assert_array_equal(embs[0], emb)
    # audio was mean/std normalized; landmarks untouched
    np.testing.assert_array_equal(fls[0], fl[0:18])
    assert not np.allclose(aus[0], au[0:18])

    neck = estimate_neck(fl[0].reshape(68, 3))
    assert neck.shape == (1, 3)


def test_norm_output_fls_rot_registers_rotation():
    from animateportrait_tpu.data.audio2landmark import (
        T_SHAPE_IDX, norm_output_fls_rot)

    rng = np.random.default_rng(0)
    base = rng.standard_normal((68, 3))
    theta = 0.3
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1.0]])
    frames = np.stack([base, base @ rot.T + 0.2])
    anchor = base  # register onto the first frame's own shape
    rt, rq, reg = norm_output_fls_rot(frames, anchor_t_shape=anchor)
    assert rt.shape == (2, 3, 4) and rq.shape == (2, 4)
    # frame 0 is already aligned; frame 1 must be rotated back onto it
    np.testing.assert_allclose(reg[0], base, atol=1e-4)
    np.testing.assert_allclose(reg[1], base, atol=1e-3)
    # quaternions are unit length
    np.testing.assert_allclose(np.linalg.norm(rq, axis=1), 1.0, atol=1e-5)


def test_close_face_lip_picks_min_mouth_area():
    from animateportrait_tpu.data.audio2landmark import close_face_lip

    fl = np.zeros((3, 68, 3))
    for t, r in enumerate((2.0, 0.5, 1.0)):
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        fl[t, 60:68, 0] = np.cos(ang) * r
        fl[t, 60:68, 1] = np.sin(ang) * r
    assert close_face_lip(fl) == 1


def test_speaker_aware_dataset_and_collate(tmp_path):
    from animateportrait_tpu.data.audio2landmark import (
        SpeakerAwareDataset, norm_output_fls_rot)

    rng = np.random.default_rng(1)
    t = 30
    fls, aus, gaze = [], [], {"rot_trans": [], "rot_quat": [],
                              "anchor_t_shape": []}
    for c in range(2):
        fl = rng.standard_normal((t, 204)).astype(np.float32)
        au = rng.standard_normal((t, 80)).astype(np.float32)
        info = (0, f"clip{c}_x_48uYS3bHIA8.mp4",
                rng.standard_normal(256).astype(np.float32))
        fls.append((fl, (0, info[1])))
        aus.append((au, info))
        rt, rq, reg = norm_output_fls_rot(fl.reshape(t, 68, 3))
        gaze["rot_trans"].append(rt)
        gaze["rot_quat"].append(rq)
        gaze["anchor_t_shape"].append(reg)
    import pickle
    with open(tmp_path / "random_val_au.pickle", "wb") as fp:
        pickle.dump(aus, fp)
    with open(tmp_path / "random_val_fl.pickle", "wb") as fp:
        pickle.dump(fls, fp)
    with open(tmp_path / "random_val_gaze.pickle", "wb") as fp:
        pickle.dump(gaze, fp)

    ds = SpeakerAwareDataset(str(tmp_path), use_11spk_only=True)
    assert len(ds) == 2
    out = ds.collate_in_segments([ds[0], ds[1]])
    f, a, e, reg, rt, rq = out
    n = 2 * (t - 18)
    assert f.shape == (n, 18, 204) and a.shape == (n, 18, 80)
    assert e.shape == (n, 256) and reg.shape == (n, 18, 204)
    assert rt.shape == (n, 18, 3, 4) and rq.shape == (n, 18, 4)
    # rot_trans had [I | 0] subtracted: adding it back gives a rotation
    r0 = rt[0, 0] + np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    np.testing.assert_allclose(r0[:, :3] @ r0[:, :3].T, np.eye(3),
                               atol=1e-4)
