"""Flow-regressor trainer: loss parity vs torch transcriptions + train step."""
import numpy as np
import torch

import pytest
import jax
import jax.numpy as jnp


def test_multi_scale_flow_loss_parity(rng):
    from animateportrait_tpu.train.flow_regression import (
        epe, multi_scale_flow_loss)

    N, H = 1, 32
    target = rng.standard_normal((N, H, H, 2)).astype(np.float32)
    mask = (rng.random((N, H, H, 1)) > 0.3).astype(np.float32)
    pyr = [rng.standard_normal(
        (N, H // (2 * 2 ** s), H // (2 * 2 ** s), 2)).astype(np.float32)
        for s in range(3)]

    loss, e = multi_scale_flow_loss(
        [jnp.asarray(p) for p in pyr], jnp.asarray(target),
        jnp.asarray(mask))

    # torch oracle (modules.py:400-429)
    tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2))) * 0.05
    tm = torch.from_numpy(np.transpose(mask, (0, 3, 1, 2)))
    tl, te = 0.0, 0.0
    for i, p in enumerate(pyr):
        k = 2 * 2 ** i
        t_ = torch.nn.AvgPool2d(k, k)(tt)
        m_ = torch.nn.MaxPool2d(k, k)(tm)
        ip = torch.from_numpy(np.transpose(p, (0, 3, 1, 2)))
        err = (t_ - ip).abs() * m_
        cnt = m_.reshape(1, -1).sum(1, keepdim=True)
        tl = tl + 0.32 / 2 ** i * (err.reshape(1, -1) / (cnt + 1e-8) / 2).sum()
        e_ = (t_ - ip).norm(dim=1, p=2, keepdim=True) * m_
        te = te + 0.32 / 2 ** i * (e_.reshape(1, -1) / (cnt + 1e-8)).sum()
    np.testing.assert_allclose(float(loss), float(tl), rtol=1e-4)
    np.testing.assert_allclose(float(e), float(te), rtol=1e-4)


@pytest.mark.slow
def test_flow_train_step(rng):
    from animateportrait_tpu.train.flow_regression import (
        FlowRegConfig, build_flow_train_step, init_flow_state)

    cfg = FlowRegConfig(num_scale=3)
    state = init_flow_state(cfg, jax.random.key(0), input_nc=136, size=224)
    step = jax.jit(build_flow_train_step(cfg))
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    kp = np.stack([112 + 50 * np.cos(theta), 112 + 50 * np.sin(theta)],
                  -1).astype(np.float32)[None]
    flow_gt = rng.standard_normal((1, 224, 224, 2)).astype(np.float32)
    vis_gt = rng.integers(0, 3, (1, 224, 224)).astype(np.int32)
    s1, m = step(state, jnp.asarray(kp), jnp.asarray(kp + 2.0),
                 jnp.asarray(flow_gt), jnp.asarray(vis_gt))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    p0 = jax.tree_util.tree_leaves(state.variables["params"])[0]
    p1 = jax.tree_util.tree_leaves(s1.variables["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_ss_flow_loss_semantics():
    """modules.SS_FlowLoss (:431-460): only pixels whose flow lands in a
    WRONG foreground region of the source are penalized."""
    from animateportrait_tpu.train.flow_regression import ss_flow_loss

    h = w = 8
    # seg channel 0 = background; fg channel 1 occupies left half of img1,
    # right half of img2
    seg_1 = np.zeros((1, h, w, 2), np.float32)
    seg_1[:, :, : w // 2, 1] = 1
    seg_1[..., 0] = 1 - seg_1[..., 1]
    seg_2 = np.zeros((1, h, w, 2), np.float32)
    seg_2[:, :, w // 2:, 1] = 1
    seg_2[..., 0] = 1 - seg_2[..., 1]
    vis_2 = np.zeros((1, h, w), np.int32)  # all visible

    # zero flow: warp(seg_1 fg) stays left; seg_2 fg is right =>
    # mask = 1 on the right half; err = (0 - tgt)*0.05 there
    tgt = np.full((1, h, w, 2), 2.0, np.float32)
    inp = np.zeros_like(tgt)
    loss = float(ss_flow_loss(jnp.asarray(inp), jnp.asarray(tgt),
                              jnp.asarray(seg_1), jnp.asarray(seg_2),
                              jnp.asarray(vis_2)))
    # right half masked: |(-2)*0.05| on 2 channels over half the pixels
    np.testing.assert_allclose(loss, 0.1 * 0.5, atol=1e-6)

    # flow that maps the right half onto the source's left-half fg =>
    # seg_1 warped covers seg_2's fg => mask 0 => no loss
    inp2 = np.zeros_like(tgt)
    inp2[..., 0] = -w // 2
    loss2 = float(ss_flow_loss(jnp.asarray(inp2), jnp.asarray(tgt),
                               jnp.asarray(seg_1), jnp.asarray(seg_2),
                               jnp.asarray(vis_2)))
    assert loss2 < loss * 0.2

    # invisible pixels (vis_2 != 0) are excluded entirely
    loss3 = float(ss_flow_loss(jnp.asarray(inp), jnp.asarray(tgt),
                               jnp.asarray(seg_1), jnp.asarray(seg_2),
                               jnp.asarray(np.ones_like(vis_2))))
    assert loss3 == 0.0


@pytest.mark.slow
def test_flow_train_step_with_ss(rng):
    from animateportrait_tpu.train.flow_regression import (
        FlowRegConfig, build_flow_train_step, init_flow_state)

    cfg = FlowRegConfig(use_ss_flow_loss=True, loss_weight_flow_ss=2.0)
    state = init_flow_state(cfg, jax.random.key(0))
    step = jax.jit(build_flow_train_step(cfg))
    n = 1
    kp = rng.uniform(20, 200, (n, 68, 2)).astype(np.float32)
    flow_gt = rng.standard_normal((n, 224, 224, 2)).astype(np.float32)
    vis_gt = rng.integers(0, 3, (n, 224, 224)).astype(np.int32)
    seg = np.zeros((n, 224, 224, 2), np.float32)
    seg[..., 1] = (rng.uniform(size=(n, 224, 224)) > 0.5)
    seg[..., 0] = 1 - seg[..., 1]
    state, m = step(state, jnp.asarray(kp), jnp.asarray(kp + 3),
                    jnp.asarray(flow_gt), jnp.asarray(vis_gt),
                    jnp.asarray(seg), jnp.asarray(seg))
    assert np.isfinite(float(m["flow_ss"]))
    assert np.isfinite(float(m["loss"]))
