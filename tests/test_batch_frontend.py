"""Batched front end: vmapped MTCNN parity and batched landmark engine
parity vs the single-audio path."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

WEIGHTS = "/root/reference/MTCNN/weights"


@pytest.mark.skipif(not os.path.exists(os.path.join(WEIGHTS, "pnet.npy")),
                    reason="reference weights not mounted")
@pytest.mark.slow
def test_detect_faces_batch_matches_single():
    import cv2
    from animateportrait_tpu.models.mtcnn import (
        MTCNNDetector, load_onet_params, load_pnet_params,
        load_rnet_params)
    from animateportrait_tpu.pipeline.batch import detect_faces_batch

    det = MTCNNDetector(
        load_pnet_params(os.path.join(WEIGHTS, "pnet.npy")),
        load_rnet_params(os.path.join(WEIGHTS, "rnet.npy")),
        load_onet_params(os.path.join(WEIGHTS, "onet.npy")))
    img = cv2.imread("/root/reference/examples/hermione2.jpeg")
    img = cv2.resize(img, (img.shape[1] // 2, img.shape[0] // 2))
    rgb = img[:, :, ::-1].astype(np.float32)
    batch = np.stack([rgb, rgb[:, ::-1]])  # photo + its mirror

    single_boxes, single_lms = det(rgb)
    results = detect_faces_batch(det, batch)
    assert len(results) == 2
    np.testing.assert_allclose(results[0][0], single_boxes, atol=1e-3)
    np.testing.assert_allclose(results[0][1], single_lms, atol=1e-3)
    assert len(results[1][0]) >= 1  # mirrored face also detected


@pytest.mark.slow
def test_batched_landmark_predictor_matches_single(rng):
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkContent, Audio2landmarkPos)
    from animateportrait_tpu.pipeline.batch import BatchedLandmarkPredictor
    from animateportrait_tpu.pipeline.landmark import (
        LandmarkPredictor, sliding_windows)

    k = jax.random.key(0)
    win1 = sliding_windows(
        rng.standard_normal((40, 80)).astype(np.float32))
    win2 = sliding_windows(
        rng.standard_normal((40, 80)).astype(np.float32))
    win3 = sliding_windows(
        rng.standard_normal((55, 80)).astype(np.float32))  # other length
    emb = [rng.standard_normal(256).astype(np.float32) for _ in range(3)]
    fid = [rng.standard_normal((1, 204)).astype(np.float32)
           for _ in range(3)]

    pos_v = Audio2landmarkPos().init(
        k, jnp.asarray(win1), jnp.zeros((win1.shape[0], 256)),
        jnp.asarray(fid[0]), jnp.zeros((win1.shape[0], 128)))
    cont_v = Audio2landmarkContent().init(
        k, jnp.asarray(win1), jnp.asarray(fid[0]))
    single = LandmarkPredictor(pos_v, cont_v)
    batched = BatchedLandmarkPredictor(single)

    outs = batched([win1, win2, win3], emb, fid)
    for i, (w, e, f) in enumerate(zip((win1, win2, win3), emb, fid)):
        ref = single(w, e, f)
        np.testing.assert_allclose(outs[i], ref, atol=2e-4,
                                   err_msg=f"audio {i}")
