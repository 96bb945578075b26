"""Pose-transfer framework (intrinsic_flow_models/pose_transfer_model.py)
train/test step: loss composition, optimizer routing (G vs PW), and the
VGG gram/shifted-gram math vs direct torch computation."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from animateportrait_tpu.train.pose_transfer import (
    PoseTransferConfig, _gram, _shifted_gram, build_pt_test_step,
    build_pt_train_step, gan_loss, init_pt_state)


def _tiny_cfg(**kw):
    base = dict(G_nf=4, G_max_nf=8, G_n_scale=3, G_n_warp_scale=2,
                joint_nc=6, size=32, D_nf=4, D_n_layers=2)
    base.update(kw)
    return PoseTransferConfig(**base)


def _batch(rng, n=2, size=32, j=6):
    return {
        "img_1": jnp.asarray(
            rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)),
        "img_2": jnp.asarray(
            rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)),
        "kp_1": jnp.asarray(
            rng.uniform(4, size - 4, (n, j, 2)).astype(np.float32)),
        "kp_2": jnp.asarray(
            rng.uniform(4, size - 4, (n, j, 2)).astype(np.float32)),
    }


def _leaf_delta(a, b):
    return max(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)) or [0.0])


@pytest.mark.slow
def test_pt_train_step_dual_unet():
    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)
    state = init_pt_state(cfg, jax.random.key(0))
    step = jax.jit(build_pt_train_step(cfg))
    g0 = state.g["params"]
    state, m = step(state, _batch(rng, size=cfg.size, j=cfg.joint_nc))
    state, m = step(state, _batch(rng, size=cfg.size, j=cfg.joint_nc))
    for k in ("loss_l1", "loss_content", "loss_G", "loss_D", "PSNR"):
        assert np.isfinite(float(m[k])), k
    assert int(state.step) == 2
    assert _leaf_delta(state.g["params"], g0) > 0  # G trained


@pytest.mark.slow
def test_pt_train_step_pix_warp_trains_pw_only():
    cfg = _tiny_cfg(G_pix_warp=True, loss_weight_gan=0.0)
    rng = np.random.default_rng(1)
    state = init_pt_state(cfg, jax.random.key(1))
    step = jax.jit(build_pt_train_step(cfg))
    g0, pw0 = state.g["params"], state.pw["params"]
    state, m = step(state, _batch(rng, size=cfg.size, j=cfg.joint_nc))
    assert np.isfinite(float(m["loss_l1"]))
    assert "loss_D" not in m and state.d is None  # gan off (:84)
    assert _leaf_delta(state.g["params"], g0) == 0  # G frozen (:112-114)
    assert _leaf_delta(state.pw["params"], pw0) > 0  # PW trained


@pytest.mark.slow
def test_pt_train_step_unet_with_style():
    cfg = _tiny_cfg(which_model_G="unet", loss_weight_style=1.0,
                    shifted_style_loss=True, G_activation="leaky_relu")
    rng = np.random.default_rng(2)
    state = init_pt_state(cfg, jax.random.key(2))
    step = jax.jit(build_pt_train_step(cfg))
    state, m = step(state, _batch(rng, size=cfg.size, j=cfg.joint_nc))
    assert np.isfinite(float(m["loss_style"]))

    test_step = jax.jit(build_pt_test_step(cfg))
    out, meas = test_step(state, _batch(rng, size=cfg.size,
                                        j=cfg.joint_nc))
    assert out["img_out"].shape == (2, cfg.size, cfg.size, 3)
    assert np.isfinite(float(meas["PSNR"]))
    assert np.isfinite(float(meas["SSIM"]))


def test_gram_matrices_match_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    t = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
    b, c, h, w = t.shape
    tg = torch.matmul(t.reshape(b, c, h * w),
                      t.reshape(b, c, h * w).transpose(1, 2)) / (c * h * w)
    np.testing.assert_allclose(np.asarray(_gram(jnp.asarray(x))),
                               tg.numpy(), atol=1e-6)
    # shifted gram (modules.py:357-363)
    sx, sy = 2, 0
    f1 = t[:, :, sy:, sx:].reshape(b, c, -1)
    f2 = t[:, :, :h - sy, :w - sx].reshape(b, c, -1)
    tsg = torch.matmul(f1, f2.transpose(1, 2)) / (c * h * w)
    np.testing.assert_allclose(
        np.asarray(_shifted_gram(jnp.asarray(x), sx, sy)),
        tsg.numpy(), atol=1e-6)


def test_gan_loss_semantics():
    p = jnp.asarray([[0.3], [0.8]])
    np.testing.assert_allclose(
        float(gan_loss(p, True, "lsgan")),
        float(np.mean((np.asarray(p) - 1.0) ** 2)), atol=1e-6)
    bce = -np.mean(np.log(1.0 - np.clip(np.asarray(p), 1e-7, 1 - 1e-7)))
    np.testing.assert_allclose(float(gan_loss(p, False, "dcgan")), bce,
                               atol=1e-6)
