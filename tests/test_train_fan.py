"""FAN training harness: boundary/weight-map targets, one jitted step,
NME eval (reference: AdaptiveWingLoss/core/{dataloader,evaler}.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animateportrait_tpu.train.fan import (
    FANTrainConfig, boundary_heatmap, build_fan_train_step, evaluate_fan,
    init_fan_state, make_fan_targets, weight_map)


def _face_landmarks(n=68, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(40, 216, (n, 2)).astype(np.float32)


def test_boundary_heatmap_lines():
    lm = _face_landmarks()
    b = boundary_heatmap(lm)
    assert b.shape == (64, 64)
    assert 0.0 <= b.min() and b.max() <= 1.0 + 1e-6
    assert (b > 0.5).sum() > 20  # curves actually drawn


def test_weight_map_dilation():
    hm = np.zeros((16, 16, 2), np.float32)
    hm[8, 8, 0] = 1.0
    w = weight_map(hm)
    assert w[8, 8, 0] == 1 and w[7, 7, 0] == 1  # 3x3 dilation
    assert w[4, 4, 0] == 0 and w[..., 1].sum() == 0


@pytest.mark.slow
def test_make_targets_and_train_step_descends():
    lm = _face_landmarks(68)
    gt, w = make_fan_targets(lm)
    assert gt.shape == (64, 64, 69) and w.shape == gt.shape

    cfg = FANTrainConfig(num_modules=1, num_landmarks=68, lr=1e-3)
    state, tx = init_fan_state(cfg, jax.random.key(0), size=64)
    step = build_fan_train_step(cfg, tx)
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)),
        jnp.float32)
    # 64-input FAN -> 16x16 heatmaps; make_fan_targets expects IMAGE
    # pixel coords (it divides by the stride 4 itself), so scale the
    # 256-space landmarks to the 64-px image first
    gt16, w16 = make_fan_targets(lm / 4.0, hm_size=16)
    gtb = jnp.tile(jnp.asarray(gt16)[None], (2, 1, 1, 1))
    wb = jnp.tile(jnp.asarray(w16)[None], (2, 1, 1, 1))
    state, l0 = step(state, imgs, gtb, wb)
    for _ in range(3):
        state, l1 = step(state, imgs, gtb, wb)
    assert float(l1) < float(l0)

    nme = evaluate_fan(state.variables, np.asarray(imgs),
                       np.tile(lm[None], (2, 1, 1)), cfg)
    assert np.isfinite(nme) and nme > 0
