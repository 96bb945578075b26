"""Extended GAN zoo: smoke/parity tests for the remaining define_G/define_D
entries."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_unet_generator_parity(rng):
    """unet_128-shaped generator vs a torch replica (InstanceNorm)."""
    from animateportrait_tpu.models.gan_extra import UnetGenerator
    from animateportrait_tpu.io import torch_convert as tc

    ngf, nd = 8, 7

    class USB(tnn.Module):
        def __init__(self, outer, inner, input_nc=None, sub=None,
                     outermost=False, innermost=False):
            super().__init__()
            self.outermost = outermost
            input_nc = input_nc or outer
            down = [tnn.Conv2d(input_nc, inner, 4, 2, 1, bias=True)]
            if outermost:
                up = [tnn.ReLU(True),
                      tnn.ConvTranspose2d(inner * 2, outer, 4, 2, 1),
                      tnn.Tanh()]
                model = down + [sub] + up
            elif innermost:
                down = [tnn.LeakyReLU(0.2, True)] + down
                up = [tnn.ReLU(True),
                      tnn.ConvTranspose2d(inner, outer, 4, 2, 1, bias=True),
                      tnn.InstanceNorm2d(outer)]
                model = down + up
            else:
                down = [tnn.LeakyReLU(0.2, True)] + down + [
                    tnn.InstanceNorm2d(inner)]
                up = [tnn.ReLU(True),
                      tnn.ConvTranspose2d(inner * 2, outer, 4, 2, 1,
                                          bias=True),
                      tnn.InstanceNorm2d(outer)]
                model = down + [sub] + up
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            if self.outermost:
                return self.model(x)
            return torch.cat([x, self.model(x)], 1)

    blk = USB(ngf * 8, ngf * 8, innermost=True)
    for _ in range(nd - 5):
        blk = USB(ngf * 8, ngf * 8, sub=blk)
    blk = USB(ngf * 4, ngf * 8, sub=blk)
    blk = USB(ngf * 2, ngf * 4, sub=blk)
    blk = USB(ngf, ngf * 2, sub=blk)
    tg = USB(3, ngf, input_nc=3, sub=blk, outermost=True).eval()

    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    g = UnetGenerator(output_nc=3, num_downs=nd, ngf=ngf)
    variables = g.init(jax.random.key(0), jnp.asarray(x))

    # torch executes downs outermost-in, then ups innermost-out — exactly
    # the Sequential conv order in tg.modules()
    tconvs = [m for m in tg.modules()
              if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d))]

    # flax binds all blocks as siblings in the generator's compact scope
    chain = (["outer", "up1", "up2", "up4"]
             + [f"mid{i}" for i in range(nd - 6, -1, -1)] + ["inner"])
    paths = [[c] for c in chain]
    assign = [p + ["down"] for p in paths] + [
        p + ["up"] for p in reversed(paths)]
    assert len(assign) == len(tconvs)

    import flax

    p = flax.core.unfreeze(variables["params"])
    for path, conv in zip(assign, tconvs):
        node = p
        for seg in path[:-1]:
            node = node[seg]
        node = node[path[-1]]
        w = conv.weight.detach().numpy()
        if isinstance(conv, tnn.ConvTranspose2d):
            node["kernel"] = jnp.asarray(tc.conv_transpose2d_kernel(w))
        else:
            node["kernel"] = jnp.asarray(tc.conv2d_kernel(w))
        if conv.bias is not None:
            node["bias"] = jnp.asarray(conv.bias.detach().numpy())
    ours = g.apply({"params": p}, jnp.asarray(x))
    with torch.no_grad():
        ref = tg(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=3e-5)


def test_conditional_resnet_modes(rng):
    from animateportrait_tpu.models.gan_extra import (
        ConditionalResnetGenerator)

    cs = 64
    x = jnp.asarray(rng.uniform(-1, 1, (1, cs, cs, 3)), jnp.float32)
    l1 = jnp.zeros((1, cs, cs, 1))
    l2 = jnp.zeros((1, cs, cs, 1))
    motion = jnp.asarray(rng.uniform(-1, 1, (1, cs, cs, 2)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, cs, cs, 2)), jnp.float32)
    mask = jnp.ones((1, cs, cs, 1))
    for mode, args in (("none", (x, l1, l2)),
                       ("fw", (x, l1, l2, motion)),
                       ("fw2", (x, l1, l2, motion)),
                       ("ifw", (x, l1, l2, motion, flow, mask))):
        g = ConditionalResnetGenerator(output_nc=1, ngf=8, n_blocks=3,
                                       mode=mode)
        v = g.init(jax.random.key(0), *args)
        out = g.apply(v, *args)
        assert out.shape == (1, cs, cs, 1), mode
        assert np.isfinite(np.asarray(out)).all(), mode


@pytest.mark.slow
def test_registry_and_small_nets(rng):
    from animateportrait_tpu.models.gan_extra import (
        HED, ULP, Combiner, NLayerDiscriminatorCls, Regressor, define_d,
        define_g)

    # registry resolves all shipped names
    assert define_g("resnet_9blocks_rcatland32_full_ifw", output_nc=1)
    assert define_g("unet_256")
    assert define_d("basic")
    with pytest.raises(ValueError):
        define_g("no_such_netg")

    k = jax.random.key(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    hed = HED()
    v = hed.init(k, x)
    e = hed.apply(v, x)
    assert e.shape == (2, 64, 64, 1) and float(e.min()) >= 0

    ulp = ULP(17)
    lm = jnp.asarray(rng.standard_normal((2, 68, 2)), jnp.float32)
    v = ulp.init(k, lm)
    assert ulp.apply(v, lm).shape == (2, 17, 2)

    reg = Regressor(ngf=8, arch=5)
    p11 = jnp.asarray(rng.standard_normal((2, 11, 11, 3)), jnp.float32)
    v = reg.init(k, p11)
    assert reg.apply(v, p11).shape == (2, 1)

    comb = Combiner(output_nc=3, ngf=8)
    v = comb.init(k, x)
    assert comb.apply(v, x).shape == (2, 64, 64, 3)

    dcls = NLayerDiscriminatorCls(ndf=8, n_layers=3)
    # the 16x16 class-head conv sizes this net for 512-px inputs
    big = jnp.asarray(rng.uniform(-1, 1, (1, 512, 512, 3)), jnp.float32)
    v = dcls.init(k, big)
    patch, cls = dcls.apply(v, big)
    assert patch.shape[0] == 1 and cls.shape == (1, 3)


def test_trident_variant_family(rng):
    import jax
    from animateportrait_tpu.models.gan_extra import define_g

    cs = 64
    x = jnp.asarray(rng.uniform(-1, 1, (1, cs, cs, 3)), jnp.float32)
    l1 = jnp.zeros((1, cs, cs, 1))
    l3 = jnp.zeros((1, cs, cs, 3))
    motion = jnp.asarray(rng.uniform(-1, 1, (1, cs, cs, 2)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, cs, cs, 2)), jnp.float32)
    mask = jnp.ones((1, cs, cs, 1))
    k = jax.random.key(0)

    cases = [
        ("resnet_9blocks_rcatland32_full_ifw_colorcoded",
         (x, l3, l3, motion, flow, mask)),
        ("resnet_9blocks_rcatland32_full_ifw2",
         (x, l1, l1, motion, None, None, motion)),
        ("resnet_9blocks_rcatland32_full_ifw_single",
         (x, l1, l1, motion)),
        ("resnet_9blocks_rcatland32_full_ifw_single2",
         (x, l1, l1, motion, flow, mask)),
    ]
    for name, args in cases:
        g = define_g(name, output_nc=1, ngf=8, n_blocks=3)
        v = g.init(k, *args)
        out = g.apply(v, *args)
        assert out.shape == (1, cs, cs, 1), name
        assert np.isfinite(np.asarray(out)).all(), name

    # dual head and warped-conditioning variants
    g = define_g("resnet_9blocks_rcatland4", output_nc=1, ngf=8, n_blocks=3)
    v = g.init(k, x, l1, l1)
    o1, o2 = g.apply(v, x, l1, l1)
    assert o1.shape == o2.shape == (1, cs, cs, 1)

    g = define_g("resnet_9blocks_rcatland2", output_nc=1, ngf=8, n_blocks=3)
    v = g.init(k, x, x)
    out = g.apply(v, x, x)
    assert out.shape == (1, cs, cs, 1)

    # legacy rcatland names resolve
    assert define_g("resnet_9blocks_rcatland", output_nc=1)
    assert define_g("resnet_9blocks_rcatland3", output_nc=1)


@pytest.mark.slow
def test_unet_parse_generator_parity(rng):
    """UnetParseGenerator vs a torch replica of networks.py:311-405
    (BatchNorm, output_padding=1 + crop, softmax head)."""
    from animateportrait_tpu.models.gan_extra import define_p
    from animateportrait_tpu.io import torch_convert as tc

    ngf, nd, classes = 4, 6, 3

    class UPSB(tnn.Module):
        def __init__(self, outer, inner, input_nc=None, sub=None,
                     outermost=False, innermost=False):
            super().__init__()
            self.outermost = outermost
            input_nc = input_nc or outer
            downconv = tnn.Conv2d(input_nc, inner, 4, 2, 1, bias=False)
            if outermost:
                up = [tnn.ReLU(True),
                      tnn.ConvTranspose2d(inner * 2, outer, 4, 2, 1,
                                          output_padding=1),
                      tnn.Tanh()]
                model = [downconv] + [sub] + up
            elif innermost:
                up = [tnn.ReLU(True),
                      tnn.ConvTranspose2d(inner, outer, 4, 2, 1,
                                          bias=False, output_padding=1),
                      tnn.BatchNorm2d(outer)]
                model = [tnn.LeakyReLU(0.2, True), downconv] + up
            else:
                up = [tnn.ReLU(True),
                      tnn.ConvTranspose2d(inner * 2, outer, 4, 2, 1,
                                          bias=False, output_padding=1),
                      tnn.BatchNorm2d(outer)]
                model = [tnn.LeakyReLU(0.2, True), downconv,
                         tnn.BatchNorm2d(inner)] + [sub] + up
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            out = self.model(x)
            ha, wa = x.size(2), x.size(3)
            t = (out.size(2) - ha) // 2
            le = (out.size(3) - wa) // 2
            out = out[:, :, t:t + ha, le:le + wa]
            if self.outermost:
                return out
            return torch.cat([x, out], 1)

    blk = UPSB(ngf * 8, ngf * 8, innermost=True)
    mids = nd - 5
    for _ in range(mids):
        blk = UPSB(ngf * 8, ngf * 8, sub=blk)
    blk = UPSB(ngf * 4, ngf * 8, sub=blk)
    blk = UPSB(ngf * 2, ngf * 4, sub=blk)
    blk = UPSB(ngf, ngf * 2, sub=blk)
    tg = UPSB(classes, ngf, input_nc=3, sub=blk, outermost=True).eval()
    with torch.no_grad():
        for m in tg.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    g = define_p(classes, "unet_128", ngf=ngf)
    variables = g.init(jax.random.key(0), jnp.asarray(x))

    chain = (["outer", "up1", "up2", "up4"]
             + [f"mid{i}" for i in range(mids - 1, -1, -1)] + ["inner"])
    conv_assign = [[c, "down"] for c in chain] + [
        [c, "up"] for c in reversed(chain)]
    bn_assign = [[c, "down_bn"] for c in chain[1:-1]] + [
        [c, "up_bn"] for c in reversed(chain[1:])]
    tconvs = [m for m in tg.modules()
              if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d))]
    tbns = [m for m in tg.modules() if isinstance(m, tnn.BatchNorm2d)]
    assert len(conv_assign) == len(tconvs)
    assert len(bn_assign) == len(tbns)

    import flax
    p = flax.core.unfreeze(variables["params"])
    s = flax.core.unfreeze(variables["batch_stats"])
    for path, conv in zip(conv_assign, tconvs):
        node = p[path[0]][path[1]]
        w = conv.weight.detach().numpy()
        node["kernel"] = jnp.asarray(
            tc.conv_transpose2d_kernel(w)
            if isinstance(conv, tnn.ConvTranspose2d) else
            tc.conv2d_kernel(w))
        if conv.bias is not None:
            node["bias"] = jnp.asarray(conv.bias.detach().numpy())
    for path, bn in zip(bn_assign, tbns):
        p[path[0]][path[1]] = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy())}
        s[path[0]][path[1]] = {
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy())}
    ours = g.apply({"params": p, "batch_stats": s}, jnp.asarray(x))
    with torch.no_grad():
        ref = torch.softmax(tg(torch.from_numpy(x).permute(0, 3, 1, 2)),
                            dim=1)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=3e-5)
