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
