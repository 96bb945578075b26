"""Unit contracts for the shared nn layers rewritten for the MXU:
phase-split transposed conv and the separable two-matmul resize."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animateportrait_tpu.nn import (ConvTranspose2dTorch, _phase_taps,
                                    interpolate_bilinear)

pytestmark = pytest.mark.fast


def test_phase_taps_gate():
    """The split applies exactly when (k + op - 2p) == s."""
    assert _phase_taps(3, 2, 1, 1) is not None   # generator/FlowUnet ups
    assert _phase_taps(4, 2, 1, 0) is not None   # Unet-variant ups
    assert _phase_taps(2, 2, 0, 0) is not None   # non-overlapping deconv
    assert _phase_taps(3, 2, 1, 0) is None       # output != s*H
    assert _phase_taps(3, 1, 1, 0) is None       # stride 1


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0),
                                      (2, 2, 0, 0)])
def test_phase_split_matches_torch(k, s, p, op):
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    rng = np.random.default_rng(0)
    ci, co, H = 5, 9, 12
    x = rng.standard_normal((2, H, H, ci)).astype(np.float32)
    t = tnn.ConvTranspose2d(ci, co, k, s, p, op)
    ref = t(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(
        0, 2, 3, 1).numpy()
    w = t.weight.detach().numpy().transpose(2, 3, 1, 0)  # IOHW -> HWOI
    b = t.bias.detach().numpy()
    m = ConvTranspose2dTorch(features=co, kernel=k, stride=s, padding=p,
                             output_padding=op)
    v = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = np.asarray(m.apply(v, jnp.asarray(x)))
    assert y.shape == ref.shape
    # measured drift vs torch on this host: <=1.8e-7 across all three
    # parametrizations — 2e-5 is two orders of headroom
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_phase_split_matches_dilated_path(monkeypatch):
    """Both implementations of the same layer agree (same params)."""
    m = ConvTranspose2dTorch(features=6)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 10, 10, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    monkeypatch.setenv("AP_CONVT", "phase")
    yp = np.asarray(m.apply(v, x))
    monkeypatch.setenv("AP_CONVT", "dilated")
    yd = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(yp, yd, atol=1e-5)


def test_phase_split_bf16_grad():
    """AD through the phase path works in bf16 (the conv_transpose rule
    rejects bf16 input with f32 cotangent — the phase path must not)."""
    m = ConvTranspose2dTorch(features=4)
    v = m.init(jax.random.key(0), jnp.zeros((1, 6, 6, 8)))
    vb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 6, 6, 8)), jnp.bfloat16)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x).astype(jnp.float32) ** 2)
                 )(vb)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.isfinite(leaf.astype(jnp.float32)).all())


@pytest.mark.parametrize("ac", [False, True])
@pytest.mark.parametrize("hw", [(64, 64, 128, 128), (17, 23, 50, 31),
                                (256, 256, 64, 64), (8, 8, 33, 65)])
def test_separable_resize_matches_torch(ac, hw):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    H, W, Ho, Wo = hw
    x = np.random.default_rng(0).standard_normal(
        (2, H, W, 3)).astype(np.float32)
    y = np.asarray(interpolate_bilinear(jnp.asarray(x), (Ho, Wo),
                                        align_corners=ac))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(Ho, Wo), mode="bilinear",
                        align_corners=ac).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


@pytest.mark.parametrize("shape_k", [((2, 10, 12, 5, 4), 3),
                                     ((1, 8, 8, 3, 2), 7),
                                     ((2, 7, 9, 4, 4), 5),
                                     ((1, 4, 5, 2, 3), 3)])
def test_conv2d_reflect_same_exact(shape_k):
    """conv2d_reflect_same == ReflectionPad2d(k//2) + VALID conv, to
    float-reassociation tolerance, values and gradients."""
    from animateportrait_tpu.nn import conv2d_reflect_same, reflect_pad_2d

    (N, H, W, C, F), k = shape_k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, C, F)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)), jnp.float32)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            reflect_pad_2d(x, k // 2), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    np.testing.assert_allclose(np.asarray(conv2d_reflect_same(x, w, b)),
                               np.asarray(ref(x, w)), atol=1e-4)
    g1 = jax.grad(lambda x, w: jnp.sum(jnp.sin(
        conv2d_reflect_same(x, w, b))), argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(jnp.sin(ref(x, w))),
                  argnums=(0, 1))(x, w)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4)


def test_conv2d_reflect_module_matches_pad_path(monkeypatch):
    """Conv2dReflect and OutConv7 compute the same values with
    AP_REFLECT_CONV=fix (border corrections) and =pad (materialized
    reflect pad), with identical parameter trees."""
    from animateportrait_tpu.models.gan import OutConv7
    from animateportrait_tpu.nn import Conv2dReflect

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)), jnp.float32)
    m = Conv2dReflect(4, 3)
    v = m.init(jax.random.key(0), x)
    assert set(v["params"]) == {"kernel", "bias"}
    monkeypatch.setenv("AP_REFLECT_CONV", "fix")
    y_fix = m.apply(v, x)
    monkeypatch.setenv("AP_REFLECT_CONV", "pad")
    y_pad = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fix), np.asarray(y_pad),
                               atol=1e-4)

    mo = OutConv7(1)  # 16 % block(8) == 0 -> packed path both ways
    vo = mo.init(jax.random.key(1), x)
    monkeypatch.setenv("AP_REFLECT_CONV", "fix")
    o_fix = mo.apply(vo, x)
    monkeypatch.setenv("AP_REFLECT_CONV", "pad")
    o_pad = mo.apply(vo, x)
    assert o_fix.shape == (2, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(o_fix), np.asarray(o_pad),
                               atol=1e-4)
