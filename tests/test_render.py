"""Renderer tests: draw2 rasterization vs a direct cv2 transcription, and an
end-to-end Module2Renderer smoke test with random weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_draw_landmarks_dots_and_lines(rng):
    import cv2
    from animateportrait_tpu.pipeline.render import draw_landmarks
    from animateportrait_tpu.utils.assets import face_lmark_lookup

    lands = rng.uniform(20, 230, (68, 2)).astype(np.float32)
    ours0 = draw_landmarks(256, 256, lands, op=0)
    ours1 = draw_landmarks(256, 256, lands, op=1)

    li = np.round(lands).astype(int)
    ref = np.zeros((256, 256), np.uint8)
    for (x, y) in li:
        cv2.circle(ref, (x, y), 3, 255, -1)
    ref0 = (ref[..., None].astype(np.float32) / 255.0) * 2 - 1
    np.testing.assert_array_equal(ours0, ref0)
    for a, b in face_lmark_lookup():
        cv2.line(ref, tuple(li[a]), tuple(li[b]), 255, 2)
    ref1 = (ref[..., None].astype(np.float32) / 255.0) * 2 - 1
    np.testing.assert_array_equal(ours1, ref1)


def test_draw_landmarks_polygons(rng):
    from animateportrait_tpu.pipeline.render import draw_landmarks

    lands = rng.uniform(20, 230, (68, 2)).astype(np.float32)
    out = draw_landmarks(256, 256, lands, op=2)
    assert out.shape == (256, 256, 3)
    assert out.min() >= -1 and out.max() <= 1


def test_test_window():
    from animateportrait_tpu.pipeline.render import test_window

    np.testing.assert_array_equal(test_window(256), [38, 217, 51, 230])


@pytest.mark.slow
def test_module2_renderer_smoke(rng):
    from animateportrait_tpu.models.flowunet import FlowUnet
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, TridentGeneratorFullIFW)
    from animateportrait_tpu.models.modnet import MODNet
    from animateportrait_tpu.pipeline.render import (
        Module2Renderer, RendererVariables)

    k = jax.random.key(0)
    cs = 256
    gen = TridentGeneratorFullIFW(output_nc=1, ngf=8, div=3, disp=3).init(
        k, jnp.zeros((1, cs, cs, 3)), jnp.zeros((1, cs, cs, 1)),
        jnp.zeros((1, cs, cs, 1)), jnp.zeros((1, cs, cs, 2)),
        jnp.zeros((1, cs, cs, 2)), jnp.zeros((1, cs, cs, 1)))
    flow = FlowUnet(nf=4, max_nf=64).init(k, jnp.zeros((1, 224, 224, 136)))
    modnet = MODNet().init(k, jnp.zeros((1, cs, cs, 3)))
    static = ResnetStyle2Generator(ngf=8).init(
        k, jnp.zeros((1, 512, 512, 3)), jnp.zeros((1, 128, 128, 3)))

    r = Module2Renderer(
        RendererVariables(generator=gen, flowunet=flow, modnet=modnet,
                          static_drawing=static),
        style="drawing", ngf=8, frame_batch=2,
        flowunet=FlowUnet(nf=4, max_nf=64),
        static_g=ResnetStyle2Generator(ngf=8))

    photo = rng.uniform(-1, 1, (cs, cs, 3)).astype(np.float32)
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    a68 = np.stack([128 + 60 * np.cos(theta),
                    128 + 60 * np.sin(theta)], -1).astype(np.float32)
    tb = np.stack([a68 + 1.0, a68 + 2.0, a68 + 3.0])
    frames = r(photo, a68, tb)
    assert frames.shape == (3, cs, cs, 1)
    assert np.isfinite(frames).all()

    # AP_FETCH=overlap (per-batch async host copies + host concat) is a
    # transfer-schedule change only — outputs are identical
    r._fetch_mode = "overlap"
    np.testing.assert_array_equal(np.asarray(r(photo, a68, tb)), frames)


@pytest.mark.slow
def test_data_parallel_renderer_matches_single_device(rng):
    """data_parallel=True shards the frame batch over the (8-virtual-
    device) mesh; outputs must match the single-device renderer."""
    from animateportrait_tpu.models.flowunet import FlowUnet
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, TridentGeneratorFullIFW)
    from animateportrait_tpu.models.modnet import MODNet
    from animateportrait_tpu.pipeline.render import (
        Module2Renderer, RendererVariables)

    k = jax.random.key(0)
    cs = 64
    gen = TridentGeneratorFullIFW(output_nc=1, ngf=8, div=3, disp=3).init(
        k, jnp.zeros((1, cs, cs, 3)), jnp.zeros((1, cs, cs, 1)),
        jnp.zeros((1, cs, cs, 1)), jnp.zeros((1, cs, cs, 2)),
        jnp.zeros((1, cs, cs, 2)), jnp.zeros((1, cs, cs, 1)))
    flow = FlowUnet(nf=4, max_nf=64).init(k, jnp.zeros((1, 224, 224, 136)))
    modnet = MODNet().init(k, jnp.zeros((1, cs, cs, 3)))
    static = ResnetStyle2Generator(ngf=8).init(
        k, jnp.zeros((1, 512, 512, 3)), jnp.zeros((1, 128, 128, 3)))
    v = RendererVariables(generator=gen, flowunet=flow, modnet=modnet,
                          static_drawing=static)
    kw = dict(style="drawing", ngf=8,
              flowunet=FlowUnet(nf=4, max_nf=64),
              static_g=ResnetStyle2Generator(ngf=8), crop_size=cs)

    photo = rng.uniform(-1, 1, (cs, cs, 3)).astype(np.float32)
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    a68 = np.stack([32 + 15 * np.cos(theta),
                    32 + 15 * np.sin(theta)], -1).astype(np.float32)
    tb = np.stack([a68 + 0.2 * i for i in range(10)]).astype(np.float32)

    r1 = Module2Renderer(v, frame_batch=8, **kw)
    rdp = Module2Renderer(v, frame_batch=8, data_parallel=True, **kw)
    assert rdp.frame_batch % len(jax.devices()) == 0
    f1 = r1(photo, a68, tb)
    f2 = rdp(photo, a68, tb)
    assert f1.shape == f2.shape == (10, cs, cs, 1)
    np.testing.assert_allclose(f1, f2, atol=2e-5)


@pytest.mark.slow
def test_bf16_generator_matches_fp32_psnr():
    """bf16 rendering quality characterization: full-bf16 (weights +
    activations) holds ~30 dB PSNR vs fp32 on an untrained generator —
    good enough for previews, which is why bf16 stays OPT-IN
    (trained weights saturate tanh and fare better, but the fp32 path
    is the default that the PSNR>=40dB acceptance bar is judged on)."""
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.models.gan import TridentGeneratorFullIFW
    from animateportrait_tpu.utils.metrics import psnr_ref

    model = TridentGeneratorFullIFW(output_nc=1, ngf=8, n_blocks=3,
                                    div=3, disp=3)
    rng = np.random.default_rng(0)
    H = 64
    args = tuple(
        jnp.asarray(rng.uniform(-1, 1, s), jnp.float32)
        for s in ((1, H, H, 3), (1, H, H, 1), (1, H, H, 1),
                  (1, H, H, 2), (1, H, H, 2)))
    args = args + (jnp.ones((1, H, H, 1), jnp.float32),)
    variables = model.init(jax.random.key(0), *args)
    out32 = model.apply(variables, *args)
    v16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
        else x, variables)
    a16 = tuple(a.astype(jnp.bfloat16) for a in args)
    out16 = model.apply(v16, *a16).astype(jnp.float32)
    assert float(psnr_ref(out16, out32)) >= 28.0
