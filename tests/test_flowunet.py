"""FlowUnet parity vs a torch replica of the reference recursive Unet
(`intrinsic_flow_models/networks.py:509-644`) with shared weights."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp


def _torch_flowunet(input_nc=6, nf=4, num_scale=3, max_nf=64):
    class Block(tnn.Module):
        def __init__(self, outer_nc, inner_nc, submodule=None,
                     outermost=False, innermost=False):
            super().__init__()
            self.outermost, self.innermost = outermost, innermost
            downconv = tnn.Conv2d(outer_nc, inner_nc, 4, 2, 1, bias=False)
            downrelu = tnn.LeakyReLU(0.2, True)
            downnorm = tnn.BatchNorm2d(inner_nc)
            uprelu = tnn.ReLU(True)
            upnorm = tnn.BatchNorm2d(outer_nc)
            if outermost:
                upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
                down, up = [downconv, downnorm], [uprelu, upconv, upnorm]
            elif innermost:
                upconv = tnn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1,
                                             bias=False)
                down, up = [downrelu, downconv], [uprelu, upconv, upnorm]
            else:
                upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                             bias=False)
                down = [downrelu, downconv, downnorm]
                up = [uprelu, upconv, upnorm]
            self.down, self.up = tnn.Sequential(*down), tnn.Sequential(*up)
            self.submodule = submodule
            self.predict_flow = tnn.Sequential(
                tnn.LeakyReLU(0.1), tnn.Conv2d(outer_nc, 2, 3, 1, 1))

        def forward(self, x):
            if self.outermost:
                x_ = self.down(x)
                x_, xp, fp = self.submodule(x_)
                x_ = self.up(x_)
                out = x_
            elif self.innermost:
                xp, fp = [], []
                x_ = self.up(self.down(x))
                out = torch.cat((x, x_), 1)
            else:
                x_ = self.down(x)
                x_, xp, fp = self.submodule(x_)
                x_ = self.up(x_)
                out = torch.cat((x, x_), 1)
            flow = self.predict_flow(x_)
            return out, [x_] + xp, [flow] + fp

    class FU(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_downsample = tnn.Sequential(
                tnn.Conv2d(input_nc, nf, 7, padding=3, bias=False),
                tnn.BatchNorm2d(nf), tnn.LeakyReLU(0.1),
                tnn.Conv2d(nf, nf * 2, 3, 2, 1, bias=False),
                tnn.BatchNorm2d(nf * 2), tnn.LeakyReLU(0.1))
            nc = nf * 2
            blk = None
            for l in range(num_scale)[::-1]:
                blk = Block(min(max_nf, nc * 2 ** l),
                            min(max_nf, nc * 2 ** (l + 1)), submodule=blk,
                            outermost=(l == 0), innermost=(l == num_scale - 1))
            self.unet_block = blk
            self.predict_vis = tnn.Sequential(
                tnn.LeakyReLU(0.1), tnn.Conv2d(min(max_nf, nc), 3, 3, 1, 1))

        def forward(self, x):
            x = self.conv_downsample(x)
            feat, xp, fp = self.unet_block(x)
            vis = self.predict_vis(feat)
            flow = F.interpolate(fp[0], scale_factor=2, mode="bilinear",
                                 align_corners=False)
            vis = F.interpolate(vis, scale_factor=2, mode="bilinear",
                                align_corners=False)
            return flow, vis, fp, feat

    return FU()


def test_flowunet_parity(rng):
    from animateportrait_tpu.models.flowunet import (
        FlowUnet, load_flowunet_params)

    torch.manual_seed(6)
    tf_net = _torch_flowunet()
    # randomize BN stats
    for m in tf_net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    tf_net.eval()
    sd = {k: v.detach().numpy() for k, v in tf_net.state_dict().items()}

    x = rng.standard_normal((1, 32, 32, 6)).astype(np.float32)
    variables = load_flowunet_params(sd, num_scale=3)
    flow, vis, fp, feat = FlowUnet(nf=4, num_scale=3, max_nf=64).apply(
        variables, jnp.asarray(x))
    with torch.no_grad():
        tflow, tvis, tfp, tfeat = tf_net(
            torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(flow), tflow.permute(0, 2, 3, 1).numpy(), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(vis), tvis.permute(0, 2, 3, 1).numpy(), atol=3e-5)
    assert len(fp) == len(tfp)
    for a, b in zip(fp, tfp):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=3e-5)


def test_kp_to_map_binary(rng):
    from animateportrait_tpu.models.flowunet import kp_to_map_binary

    kps = np.array([[5.0, 7.0], [-1.0, -1.0], [0.0, 0.0]], np.float32)
    m = np.asarray(kp_to_map_binary((16, 16), jnp.asarray(kps)))
    assert m.shape == (16, 16, 3)
    # reference oracle
    xg, yg = np.meshgrid(range(16), range(16), indexing="xy")
    ref0 = ((xg - 5) ** 2 + (yg - 7) ** 2 <= 16).astype(np.float32)
    np.testing.assert_array_equal(m[:, :, 0], ref0)
    assert m[:, :, 1].sum() == 0  # invalid keypoint
    assert m[0, 0, 2] == 1
