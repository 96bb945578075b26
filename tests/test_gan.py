"""Parity tests for the Module2 GAN zoo vs torch replicas of the reference
architectures (`Module2/models/networks.py`) with shared weights."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp


def _nchw(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def _nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_conv_transpose_parity(rng):
    import jax
    from animateportrait_tpu.nn import ConvTranspose2dTorch
    from animateportrait_tpu.io import torch_convert as tc

    torch.manual_seed(0)
    tconv = tnn.ConvTranspose2d(6, 4, 3, stride=2, padding=1,
                                output_padding=1)
    x = rng.standard_normal((2, 9, 11, 6)).astype(np.float32)
    params = {"params": {
        "kernel": tc.conv_transpose2d_kernel(
            tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy()}}
    ours = ConvTranspose2dTorch(4).apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tconv(_nchw(x))
    assert ours.shape == (2, 18, 22, 4)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=1e-5)


def test_interpolate_bilinear_parity(rng):
    from animateportrait_tpu.nn import interpolate_bilinear

    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    for ac in (True, False):
        for size in ((16, 16), (4, 4), (5, 7)):
            ours = interpolate_bilinear(jnp.asarray(x), size,
                                        align_corners=ac)
            ref = F.interpolate(_nchw(x), size=size, mode="bilinear",
                                align_corners=ac)
            np.testing.assert_allclose(
                np.asarray(ours), _nhwc(ref), atol=1e-5,
                err_msg=f"ac={ac} size={size}")


class _TorchResnetBlock(tnn.Module):
    def __init__(self, dim, kernel=3):
        super().__init__()
        pad = (kernel - 1) // 2
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(pad),
            tnn.Conv2d(dim, dim, kernel),
            tnn.InstanceNorm2d(dim), tnn.ReLU(True),
            tnn.ReflectionPad2d(pad),
            tnn.Conv2d(dim, dim, kernel),
            tnn.InstanceNorm2d(dim))

    def forward(self, x):
        return x + self.conv_block(x)


class _TorchResnetBlock2(tnn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(din, dout, 3),
            tnn.InstanceNorm2d(dout), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(dout, dout, 3),
            tnn.InstanceNorm2d(dout))
        self.shortcut = tnn.Sequential(
            tnn.Conv2d(din, dout, 3, padding=1), tnn.InstanceNorm2d(dout))

    def forward(self, x):
        return self.shortcut(x) + self.conv_block(x)


def test_resnet_style2_parity(rng):
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, load_style2_params)

    ngf, nb = 8, 2

    class TS(tnn.Module):
        def __init__(self):
            super().__init__()
            m0 = [tnn.ReflectionPad2d(3), tnn.Conv2d(3, ngf, 7),
                  tnn.InstanceNorm2d(ngf), tnn.ReLU(True)]
            for i in range(2):
                mult = 2 ** i
                m0 += [tnn.Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 1),
                       tnn.InstanceNorm2d(ngf * mult * 2), tnn.ReLU(True)]
            m = [tnn.Conv2d(ngf * 4 + 3, ngf * 4, 3, 1, 1),
                 tnn.InstanceNorm2d(ngf * 4), tnn.ReLU(True)]
            m += [_TorchResnetBlock(ngf * 4) for _ in range(nb)]
            for i in range(2):
                mult = 2 ** (2 - i)
                m += [tnn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3,
                                          2, 1, output_padding=1),
                      tnn.InstanceNorm2d(ngf * mult // 2), tnn.ReLU(True)]
            m += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 1, 7), tnn.Tanh()]
            self.model0 = tnn.Sequential(*m0)
            self.model = tnn.Sequential(*m)

        def forward(self, x, style):
            f = self.model0(x)
            return self.model(torch.cat([f, style], 1))

    torch.manual_seed(3)
    ts = TS().eval()
    sd = {k: v.detach().numpy() for k, v in ts.state_dict().items()}
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    style = np.tile(np.array([0, 1, 0], np.float32).reshape(1, 1, 1, 3),
                    (1, 8, 8, 1))

    params = load_style2_params(sd, n_blocks=nb)
    ours = ResnetStyle2Generator(ngf=ngf, n_blocks=nb).apply(
        params, jnp.asarray(x), jnp.asarray(style))
    with torch.no_grad():
        ref = ts(_nchw(x), _nchw(style))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=2e-5)


def _torch_warp_acc_flow(x, flow, mask=None):
    n, _, h, w = x.shape
    xx = torch.arange(w).view(1, -1).repeat(h, 1)
    yy = torch.arange(h).view(-1, 1).repeat(1, w)
    grid = torch.stack([xx, yy]).unsqueeze(0).repeat(n, 1, 1, 1).float()
    grid = grid + flow
    grid[:, 0] = 2.0 * grid[:, 0] / max(w - 1, 1) - 1.0
    grid[:, 1] = 2.0 * grid[:, 1] / max(h - 1, 1) - 1.0
    out = F.grid_sample(x, grid.permute(0, 2, 3, 1), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    if mask is not None:
        out = out.masked_fill(mask.expand_as(out) <= 0.5, -1.0)
    return out


def test_trident_full_ifw_parity(rng):
    from animateportrait_tpu.models.gan import (
        TridentGeneratorFullIFW, load_trident_full_ifw_params)

    ngf, nb, size = 8, 3, 32

    class TT(tnn.Module):
        def __init__(self):
            super().__init__()

            def stem(out):
                return tnn.Sequential(
                    tnn.ReflectionPad2d(3), tnn.Conv2d(3, out, 7),
                    tnn.InstanceNorm2d(out), tnn.ReLU(True))

            def down(i, o):
                return tnn.Sequential(
                    tnn.Conv2d(i, o, 3, 2, 1), tnn.InstanceNorm2d(o),
                    tnn.ReLU(True))

            self.model_tri00 = stem(ngf // 2)
            self.model_tri01 = down(ngf, ngf * 2)
            self.model_tri02 = down(ngf * 2, ngf * 4)
            self.model_tri10 = stem(ngf)
            self.model_tri11 = down(ngf, ngf)
            self.model_tri12 = down(ngf * 2, ngf * 4)
            self.model_tri20 = stem(ngf)
            self.model_tri21 = down(ngf, ngf * 2)
            self.model_tri22 = down(ngf * 2, ngf * 2)
            self.model_tri_merge = tnn.Conv2d(ngf * 12, ngf * 4, 3,
                                              padding=1)
            blocks = []
            for i in range(nb):
                if (i + 1) % 3 == 0:
                    blocks.append(_TorchResnetBlock2(ngf * 4 + 32, ngf * 4))
                else:
                    blocks.append(_TorchResnetBlock(ngf * 4))
            self.model2 = tnn.Sequential(*blocks)
            self.model3 = tnn.Sequential(
                tnn.ConvTranspose2d(ngf * 4, ngf * 2, 3, 2, 1,
                                    output_padding=1),
                tnn.InstanceNorm2d(ngf * 2), tnn.ReLU(True),
                tnn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1,
                                    output_padding=1),
                tnn.InstanceNorm2d(ngf), tnn.ReLU(True),
                tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 3, 7), tnn.Tanh())
            self.model_landmark_trans = tnn.Sequential(
                tnn.Conv2d(1, 8, 3, 1, 1), tnn.InstanceNorm2d(8),
                tnn.ReLU(True),
                tnn.Conv2d(8, 16, 3, 2, 1), tnn.InstanceNorm2d(16),
                tnn.ReLU(True),
                tnn.Conv2d(16, 16, 3, 2, 1), tnn.InstanceNorm2d(16))

        def dfw(self, x, motion, flow, ifmask, level):
            if level > 0:
                s = size // (2 ** level)
                motion = motion.permute(0, 3, 1, 2)
                motion = F.interpolate(motion, size=(s, s), mode="bilinear",
                                       align_corners=True)
                motion = motion.permute(0, 2, 3, 1)
                flow = F.interpolate(flow / (2 ** level), size=(s, s),
                                     mode="bilinear", align_corners=True)
                ifmask = F.interpolate(ifmask, size=(s, s), mode="bilinear",
                                       align_corners=True)
            x1 = F.grid_sample(x, motion)
            x2 = _torch_warp_acc_flow(x, flow, mask=ifmask)
            return torch.cat([x1, x2], 1)

        def forward(self, inp, land1, land2, motion, flow, ifmask):
            x1 = self.model_tri00(inp)
            x1 = self.dfw(x1, motion, flow, ifmask, 0)
            x1 = self.model_tri02(self.model_tri01(x1))
            x2 = self.model_tri11(self.model_tri10(inp))
            x2 = self.dfw(x2, motion, flow, ifmask, 1)
            x2 = self.model_tri12(x2)
            x3 = self.model_tri21(self.model_tri20(inp))
            x3 = self.model_tri22(x3)
            x3 = self.dfw(x3, motion, flow, ifmask, 2)
            x = self.model_tri_merge(torch.cat([x1, x2, x3], 1))
            l1 = self.model_landmark_trans(land1)
            l2 = self.model_landmark_trans(land2)
            for i in range(nb):
                if (i + 1) % 3 == 0:
                    x = self.model2[i](torch.cat([x, l1, l2], 1))
                else:
                    x = self.model2[i](x)
            return self.model3(x)

    torch.manual_seed(4)
    tt = TT().eval()
    sd = {k: v.detach().numpy() for k, v in tt.state_dict().items()}

    x = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    land1 = rng.standard_normal((1, size, size, 1)).astype(np.float32)
    land2 = rng.standard_normal((1, size, size, 1)).astype(np.float32)
    motion = rng.uniform(-1, 1, (1, size, size, 2)).astype(np.float32)
    flow = (rng.standard_normal((1, size, size, 2)) * 2).astype(np.float32)
    ifmask = (rng.uniform(0, 1, (1, size, size, 1)) > 0.3).astype(np.float32)

    params = load_trident_full_ifw_params(sd, n_blocks=nb)
    ours = TridentGeneratorFullIFW(ngf=ngf, n_blocks=nb).apply(
        params, *(jnp.asarray(a) for a in
                  (x, land1, land2, motion, flow, ifmask)))
    with torch.no_grad():
        ref = tt(_nchw(x), _nchw(land1), _nchw(land2),
                 torch.from_numpy(motion), _nchw(flow), _nchw(ifmask))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=5e-5)


def test_nlayer_discriminator_parity(rng):
    from animateportrait_tpu.models.gan import (
        NLayerDiscriminator, load_nlayer_d_params)

    ndf, nl = 8, 3

    class TD(tnn.Module):
        def __init__(self):
            super().__init__()
            seq = [tnn.Conv2d(3, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
            mult = 1
            for n in range(1, nl):
                prev, mult = mult, min(2 ** n, 8)
                seq += [tnn.Conv2d(ndf * prev, ndf * mult, 4, 2, 1),
                        tnn.InstanceNorm2d(ndf * mult),
                        tnn.LeakyReLU(0.2, True)]
            prev, mult = mult, min(2 ** nl, 8)
            seq += [tnn.Conv2d(ndf * prev, ndf * mult, 4, 1, 1),
                    tnn.InstanceNorm2d(ndf * mult),
                    tnn.LeakyReLU(0.2, True)]
            seq += [tnn.Conv2d(ndf * mult, 1, 4, 1, 1)]
            self.model = tnn.Sequential(*seq)

        def forward(self, x):
            return self.model(x)

    torch.manual_seed(5)
    td = TD().eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    params = load_nlayer_d_params(sd, n_layers=nl)
    ours = NLayerDiscriminator(ndf=ndf, n_layers=nl).apply(
        params, jnp.asarray(x))
    with torch.no_grad():
        ref = td(_nchw(x))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=2e-5)


def test_gan_loss_modes():
    from animateportrait_tpu.models.gan import gan_loss

    pred = jnp.asarray(np.linspace(-2, 2, 12).reshape(3, 4).astype(
        np.float32))
    tp = torch.from_numpy(np.asarray(pred))
    # lsgan
    np.testing.assert_allclose(
        float(gan_loss(pred, True, "lsgan")),
        float(tnn.MSELoss()(tp, torch.ones_like(tp))), atol=1e-6)
    # vanilla
    np.testing.assert_allclose(
        float(gan_loss(pred, False, "vanilla")),
        float(tnn.BCEWithLogitsLoss()(tp, torch.zeros_like(tp))), atol=1e-6)
    # wgangp
    np.testing.assert_allclose(
        float(gan_loss(pred, True, "wgangp")), -float(tp.mean()), atol=1e-6)


def test_trident_encode_decode_matches_call():
    """encode_static (batch-1 photo cache) + decode must equal __call__
    — the renderer relies on this split to hoist the frame-invariant
    stems out of the per-frame program. Equality is to float noise, not
    bitwise: XLA's CPU conv emitter may pick different reassociations
    for the same conv at batch 1 vs batch N (observed ~5e-7 on the
    stems once Conv2dReflect replaced the materialized pad), so bitwise
    identity across batch sizes is not an XLA contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animateportrait_tpu.models.gan import TridentGeneratorFullIFW

    rng = np.random.default_rng(0)
    H = 32
    mk = lambda *s: jnp.asarray(rng.uniform(-1, 1, s), jnp.float32)
    photo, l1 = mk(1, H, H, 3), mk(1, H, H, 1)
    l2, motion, flow = mk(3, H, H, 1), mk(3, H, H, 2), mk(3, H, H, 2)
    ifmask = jnp.ones((3, H, H, 1), jnp.float32)
    g = TridentGeneratorFullIFW(output_nc=1, ngf=8, n_blocks=3, div=3,
                                disp=3)
    full = (jnp.broadcast_to(photo, (3, H, H, 3)),
            jnp.broadcast_to(l1, (3, H, H, 1)), l2, motion, flow, ifmask)
    v = g.init(jax.random.key(0), *full)
    want = g.apply(v, *full)
    cache = g.apply(v, photo, l1,
                    method=TridentGeneratorFullIFW.encode_static)
    got = g.apply(v, cache, l2, motion, flow, ifmask,
                  method=TridentGeneratorFullIFW.decode)
    # encode_static/decode is the SAME graph split in two — measured
    # drift on this host is 0.0, previously <=5e-7 — so hold the cache
    # contract near-bitwise; renderer photo-cache consumers assume it.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_s2d_stem_matches_plain_conv(monkeypatch):
    """AP_S2D_STEM=1 (stride-2 stems as space-to-depth packed convs —
    measured net-negative at C=64 on v5e, kept as a documented opt-in)
    is parameter-compatible and numerically equal to the plain conv."""
    import jax

    from animateportrait_tpu.models.gan import ConvINReLU

    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 20, 20, 10)), jnp.float32)
    m = ConvINReLU(14, stride=2)
    monkeypatch.delenv("AP_S2D_STEM", raising=False)
    v = m.init(jax.random.key(0), x)
    want = m.apply(v, x)
    monkeypatch.setenv("AP_S2D_STEM", "1")
    v2 = m.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    got = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
