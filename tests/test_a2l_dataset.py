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
