"""FlowUnetV2 / DualUnetGenerator parity vs torch replicas of
`intrinsic_flow_models/networks.py:26-75,233-431,647-744`."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from animateportrait_tpu.models.flowunet_extra import (
    DualUnetGenerator, FlowUnetV2, load_dual_unet_params,
    load_flowunet_v2_params, pixel_shuffle)


def _conv(cin, cout, k=3, s=1, p=0, bias=False):
    return tnn.Sequential(tnn.Conv2d(cin, cout, k, s, p, bias=bias),
                          tnn.BatchNorm2d(cout))


def _chanmap(cin, cout):
    return _conv(cin, cout, k=1)


class _TResBlock(tnn.Module):
    def __init__(self, dim, dim_a=0):
        super().__init__()
        if dim_a > 0:
            self.conv_a = _chanmap(dim_a, dim)
            self.conv = _conv(dim * 2, dim, 3, 1, 1)
        else:
            self.conv = _conv(dim, dim, 3, 1, 1)

    def forward(self, x, a=None):
        if a is None:
            residual = x
        else:
            a = self.conv_a(F.relu(a))
            residual = torch.cat((x, a), dim=1)
        return x + self.conv(F.relu(residual))


def _down(cin, cout):
    return tnn.Sequential(tnn.ReLU(False),
                          tnn.Conv2d(cin, cout, 3, 2, 1, bias=False),
                          tnn.BatchNorm2d(cout))


def _up(cin, cout):
    return tnn.Sequential(tnn.ReLU(False),
                          tnn.Conv2d(cin, cout * 4, 3, 1, 1, bias=False),
                          tnn.PixelShuffle(2), tnn.BatchNorm2d(cout))


def _pred(cin, cout):
    return tnn.Sequential(tnn.ReLU(False),
                          tnn.Conv2d(cin, cout, 3, 1, 1, bias=True))


class _TFlowUnetV2(tnn.Module):
    def __init__(self, input_nc, nf, max_nf, num_scales, n_res):
        super().__init__()
        self.num_scales, self.n_res = num_scales, n_res
        pre = [_chanmap(input_nc, nf)]
        c_in, c_out = min(nf, max_nf), min(nf * 2, max_nf)
        pre += [_TResBlock(c_in), tnn.ReLU(False),
                tnn.Conv2d(c_in, c_out, 3, 2, 1, bias=False),
                tnn.BatchNorm2d(c_out)]
        self.pre_conv = tnn.Sequential(*pre)
        for l in range(num_scales):
            ci = min(nf * (l + 2), max_nf)
            co = min(nf * (l + 3), max_nf)
            for i in range(n_res):
                setattr(self, f"enc_{l}_res_{i}", _TResBlock(ci))
                setattr(self, f"dec_{l}_res_{i}", _TResBlock(ci, ci))
            setattr(self, f"enc_{l}_downsample", _down(ci, co))
            setattr(self, f"dec_{l}_upsample", _up(co, ci))
            setattr(self, f"pred_flow_{l}", _pred(ci, 2))
        self.pred_vis = _pred(min(nf * 2, max_nf), 3)

    def forward(self, x):
        hiddens, flow_pyr = [], []
        for m in self.pre_conv:
            x = m(x) if not isinstance(m, _TResBlock) else m(x)
        for l in range(self.num_scales):
            for i in range(self.n_res):
                x = getattr(self, f"enc_{l}_res_{i}")(x)
                hiddens.append(x)
            x = getattr(self, f"enc_{l}_downsample")(x)
        for l in range(self.num_scales - 1, -1, -1):
            x = getattr(self, f"dec_{l}_upsample")(x)
            for i in range(self.n_res - 1, -1, -1):
                x = getattr(self, f"dec_{l}_res_{i}")(x, hiddens.pop())
            flow_pyr = [getattr(self, f"pred_flow_{l}")(x)] + flow_pyr
        flow = F.interpolate(flow_pyr[0], scale_factor=2, mode="bilinear",
                             align_corners=False)
        vis = F.interpolate(self.pred_vis(x), scale_factor=2,
                            mode="bilinear", align_corners=False)
        return flow, vis, flow_pyr, x


def _randomize_bn(mod, rng):
    for m in mod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.normal(size=m.running_mean.shape) * 0.1,
                dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, size=m.running_var.shape),
                dtype=torch.float32))


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 12)).astype(np.float32)
    ours = pixel_shuffle(jnp.asarray(x), 2)
    theirs = F.pixel_shuffle(
        torch.tensor(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_flowunet_v2_parity():
    nf, max_nf, scales, n_res = 4, 16, 3, 2
    torch.manual_seed(0)
    tmodel = _TFlowUnetV2(6, nf, max_nf, scales, n_res).eval()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.default_rng(1))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = load_flowunet_v2_params(sd, nf=nf, max_nf=max_nf,
                                        num_scales=scales,
                                        n_residual_blocks=n_res)
    model = FlowUnetV2(nf=nf, max_nf=max_nf, num_scales=scales,
                       n_residual_blocks=n_res)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, 32, 6)).astype(np.float32)
    with torch.no_grad():
        tf, tv, tpyr, tfeat = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    jf, jv, jpyr, jfeat = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jfeat),
                               tfeat.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(jf),
                               tf.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jv),
                               tv.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    assert len(jpyr) == scales


class _TDualUnet(tnn.Module):
    def __init__(self, pose_nc, app_nc, out_nc, nf, max_nf, scales,
                 warp_scales, n_res, vis_mode):
        super().__init__()
        self.scales, self.warp_scales = scales, warp_scales
        self.n_res, self.vis_mode = n_res, vis_mode
        self.encp_pre_conv = _chanmap(pose_nc, nf)
        self.enca_pre_conv = _chanmap(app_nc, nf)
        for l in range(scales):
            ci = min(nf * (l + 1), max_nf)
            co = min(nf * (l + 2), max_nf)
            for i in range(n_res):
                setattr(self, f"encp_{l}_res_{i}", _TResBlock(ci))
                setattr(self, f"enca_{l}_res_{i}", _TResBlock(ci))
                if l < warp_scales and vis_mode == "residual":
                    setattr(self, f"enca_{l}_vis_{i}", _TResBlock(ci, ci * 2))
                setattr(self, f"dec_{l}_res_{i}", _TResBlock(ci, ci * 2))
            down = _down(ci, co)
            setattr(self, f"encp_{l}_downsample", down)
            setattr(self, f"enca_{l}_downsample", down)  # ref quirk: shared
            setattr(self, f"dec_{l}_upsample", _up(co, ci))
            if l == scales - 1:
                self.dec_fuse = _chanmap(co * 2, co)
        self.dec_output = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(nf, out_nc, 7, bias=True))

    def forward(self, x_p, x_a, flow=None, vis=None):
        use_fw = flow is not None
        if use_fw:
            vis = vis.round()
        hp, ha = [], []
        x_p = self.encp_pre_conv(x_p)
        for l in range(self.scales):
            for i in range(self.n_res):
                x_p = getattr(self, f"encp_{l}_res_{i}")(x_p)
                hp.append(x_p)
            x_p = getattr(self, f"encp_{l}_downsample")(x_p)
        x_a = self.enca_pre_conv(x_a)
        for l in range(self.scales):
            for i in range(self.n_res):
                x_a = getattr(self, f"enca_{l}_res_{i}")(x_a)
                if use_fw and l < self.warp_scales:
                    if i == 0:
                        flow_l = (F.avg_pool2d(flow, 2 ** l) / 2 ** l
                                  if l > 0 else flow)
                        vis_l = (-F.max_pool2d(-vis, 2 ** l)
                                 if l > 0 else vis)
                    x_w = _torch_warp_acc_flow(x_a, flow_l)
                    if self.vis_mode == "residual":
                        x_we = torch.cat(
                            [x_w * (vis_l == 0).float(),
                             x_w * (vis_l == 1).float()], dim=1)
                        x_w = getattr(self, f"enca_{l}_vis_{i}")(x_w, x_we)
                    ha.append(x_w)
                else:
                    ha.append(x_a)
            x_a = getattr(self, f"enca_{l}_downsample")(x_a)
        x = self.dec_fuse(torch.cat((x_p, x_a), dim=1))
        for l in range(self.scales - 1, -1, -1):
            x = getattr(self, f"dec_{l}_upsample")(x)
            for i in range(self.n_res - 1, -1, -1):
                x = getattr(self, f"dec_{l}_res_{i}")(
                    x, torch.cat((hp.pop(), ha.pop()), dim=1))
        return self.dec_output(x)


def _torch_warp_acc_flow(x, flow):
    """modules.py:596-625 (align_corners-True normalize, default sample)."""
    bsz, c, h, w = x.size()
    xx = torch.arange(0, w).view(1, -1).repeat(h, 1).float()
    yy = torch.arange(0, h).view(-1, 1).repeat(1, w).float()
    grid = torch.stack(
        [xx.unsqueeze(0).repeat(bsz, 1, 1),
         yy.unsqueeze(0).repeat(bsz, 1, 1)], dim=1)
    grid = grid + flow
    gx = 2.0 * grid[:, 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * grid[:, 1] / max(h - 1, 1) - 1.0
    grid = torch.stack((gx, gy), dim=3)
    return F.grid_sample(x, grid)


@pytest.mark.slow
def test_dual_unet_parity_with_warp():
    nf, max_nf, scales, warp_scales, n_res = 4, 8, 3, 2, 1
    torch.manual_seed(0)
    tmodel = _TDualUnet(5, 3, 3, nf, max_nf, scales, warp_scales, n_res,
                        "residual").eval()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.default_rng(1))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = load_dual_unet_params(
        sd, num_scales=scales, num_warp_scales=warp_scales,
        n_residual_blocks=n_res, vis_mode="residual")
    model = DualUnetGenerator(pose_nc=5, appearance_nc=3, output_nc=3,
                              nf=nf, max_nf=max_nf, num_scales=scales,
                              num_warp_scales=warp_scales,
                              n_residual_blocks=n_res, vis_mode="residual")

    rng = np.random.default_rng(2)
    x_p = rng.standard_normal((1, 16, 16, 5)).astype(np.float32)
    x_a = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    flow = (rng.standard_normal((1, 16, 16, 2)) * 2).astype(np.float32)
    vis = rng.integers(0, 3, (1, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x_p).permute(0, 3, 1, 2),
                      torch.tensor(x_a).permute(0, 3, 1, 2),
                      torch.tensor(flow).permute(0, 3, 1, 2),
                      torch.tensor(vis).permute(0, 3, 1, 2))
    jout = model.apply(variables, jnp.asarray(x_p), jnp.asarray(x_a),
                       jnp.asarray(flow), jnp.asarray(vis))
    np.testing.assert_allclose(np.asarray(jout),
                               tout.permute(0, 2, 3, 1).numpy(), atol=3e-4)


@pytest.mark.slow
def test_dual_unet_no_flow_and_aux():
    model = DualUnetGenerator(pose_nc=4, appearance_nc=3, output_nc=3,
                              aux_output_nc=(2,), nf=4, max_nf=8,
                              num_scales=2, n_residual_blocks=1)
    import jax
    x_p = jnp.zeros((1, 8, 8, 4))
    x_a = jnp.zeros((1, 8, 8, 3))
    variables = model.init(jax.random.key(0), x_p, x_a)
    out, aux = model.apply(variables, x_p, x_a)
    assert out.shape == (1, 8, 8, 3) and aux[0].shape == (1, 8, 8, 2)


class _TIFUnet(tnn.Module):
    """intrinsic_flow_models/networks.py:76-231 UnetGenerator (+ multi
    output heads when out_ncs is a list)."""

    def __init__(self, input_nc, out_ncs, nf, max_nf, scales, n_res):
        super().__init__()
        self.scales, self.n_res = scales, n_res
        self.multi = isinstance(out_ncs, (list, tuple))
        self.pre_conv = _chanmap(input_nc, nf)
        for l in range(scales):
            ci = min(nf * (l + 1), max_nf)
            co = min(nf * (l + 2), max_nf)
            for i in range(n_res):
                setattr(self, f"enc_{l}_res_{i}", _TResBlock(ci))
                setattr(self, f"dec_{l}_res_{i}", _TResBlock(ci, ci))
            setattr(self, f"enc_{l}_downsample", _down(ci, co))
            setattr(self, f"dec_{l}_upsample", _up(co, ci))
        if self.multi:
            for i, c in enumerate(out_ncs):
                setattr(self, f"dec_output_{i}", tnn.Sequential(
                    _chanmap(nf, nf), tnn.ReLU(False),
                    tnn.ReflectionPad2d(3), tnn.Conv2d(nf, c, 7, bias=True)))
        else:
            self.dec_output = tnn.Sequential(
                tnn.ReflectionPad2d(3), tnn.Conv2d(nf, out_ncs, 7, bias=True))

    def forward(self, x):
        hiddens = []
        x = self.pre_conv(x)
        for l in range(self.scales):
            for i in range(self.n_res):
                x = getattr(self, f"enc_{l}_res_{i}")(x)
                hiddens.append(x)
            x = getattr(self, f"enc_{l}_downsample")(x)
        for l in range(self.scales - 1, -1, -1):
            x = getattr(self, f"dec_{l}_upsample")(x)
            for i in range(self.n_res - 1, -1, -1):
                x = getattr(self, f"dec_{l}_res_{i}")(x, hiddens.pop())
        if self.multi:
            return [getattr(self, f"dec_output_{i}")(x)
                    for i in range(len([m for m in dir(self)
                                        if m.startswith("dec_output_")]))]
        return self.dec_output(x)


def test_if_unet_parity():
    from animateportrait_tpu.models.flowunet_extra import (
        IFUnetGenerator, load_if_unet_params)

    nf, max_nf, scales, n_res = 4, 8, 3, 2
    torch.manual_seed(3)
    tmodel = _TIFUnet(5, 3, nf, max_nf, scales, n_res).eval()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.default_rng(4))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = load_if_unet_params(sd, num_scales=scales,
                                    n_residual_blocks=n_res)
    model = IFUnetGenerator(output_nc=3, nf=nf, max_nf=max_nf,
                            num_scales=scales, n_residual_blocks=n_res)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 16, 16, 5)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    jout = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout),
                               tout.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_if_unet_multi_output_parity():
    from animateportrait_tpu.models.flowunet_extra import (
        IFUnetGeneratorMultiOutput, load_if_unet_params)

    nf, max_nf, scales, n_res = 4, 8, 2, 1
    torch.manual_seed(6)
    tmodel = _TIFUnet(9, [1, 2], nf, max_nf, scales, n_res).eval()
    with torch.no_grad():
        _randomize_bn(tmodel, np.random.default_rng(7))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = load_if_unet_params(sd, num_scales=scales,
                                    n_residual_blocks=n_res,
                                    multi_output_nc=(1, 2))
    model = IFUnetGeneratorMultiOutput(output_nc=(1, 2), nf=nf,
                                       max_nf=max_nf, num_scales=scales,
                                       n_residual_blocks=n_res)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 8, 8, 9)).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    jouts = model.apply(variables, jnp.asarray(x))
    assert len(jouts) == 2
    for j, t in zip(jouts, touts):
        np.testing.assert_allclose(np.asarray(j),
                                   t.permute(0, 2, 3, 1).numpy(),
                                   atol=2e-4)
