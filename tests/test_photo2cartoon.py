"""Photo2Cartoon UGATIT generator parity vs a torch replica of the reference
(`Module2/models/photo2cartoon.py:166-525`) with shared weights."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp


def _torch_p2c(ngf=8):
    class ConvBlock(tnn.Module):
        def __init__(self, din, dout):
            super().__init__()
            self.dim_out = dout
            self.ConvBlock1 = tnn.Sequential(
                tnn.InstanceNorm2d(din), tnn.ReLU(True),
                tnn.ReflectionPad2d(1),
                tnn.Conv2d(din, dout // 2, 3, bias=False))
            self.ConvBlock2 = tnn.Sequential(
                tnn.InstanceNorm2d(dout // 2), tnn.ReLU(True),
                tnn.ReflectionPad2d(1),
                tnn.Conv2d(dout // 2, dout // 4, 3, bias=False))
            self.ConvBlock3 = tnn.Sequential(
                tnn.InstanceNorm2d(dout // 4), tnn.ReLU(True),
                tnn.ReflectionPad2d(1),
                tnn.Conv2d(dout // 4, dout // 4, 3, bias=False))
            self.ConvBlock4 = tnn.Sequential(
                tnn.InstanceNorm2d(din), tnn.ReLU(True),
                tnn.Conv2d(din, dout, 1, bias=False))

        def forward(self, x):
            r = x
            x1 = self.ConvBlock1(x)
            x2 = self.ConvBlock2(x1)
            x3 = self.ConvBlock3(x2)
            out = torch.cat((x1, x2, x3), 1)
            if r.size(1) != self.dim_out:
                r = self.ConvBlock4(r)
            return r + out

    class HGB(tnn.Module):
        def __init__(self, din, dout):
            super().__init__()
            for i in range(1, 5):
                setattr(self, f"ConvBlock{i}_1", ConvBlock(
                    din if i == 1 else dout, dout))
                setattr(self, f"ConvBlock{i}_2", ConvBlock(
                    din if i == 1 else dout, dout))
            for i in range(5, 10):
                setattr(self, f"ConvBlock{i}", ConvBlock(dout, dout))

        def forward(self, x):
            skips, down = [], x
            for i in range(1, 5):
                skips.append(getattr(self, f"ConvBlock{i}_1")(down))
                down = getattr(self, f"ConvBlock{i}_2")(F.avg_pool2d(down, 2))
            up = self.ConvBlock5(down)
            for i, blk in enumerate(range(6, 10)):
                up = F.upsample(getattr(self, f"ConvBlock{blk}")(up),
                                scale_factor=2)
                up = skips[3 - i] + up
            return up

    class HG(tnn.Module):
        def __init__(self, din, dout, use_res=True):
            super().__init__()
            self.use_res = use_res
            self.HG = tnn.Sequential(
                HGB(din, dout), ConvBlock(dout, dout),
                tnn.Conv2d(dout, dout, 1, bias=False),
                tnn.InstanceNorm2d(dout), tnn.ReLU(True))
            self.Conv1 = tnn.Conv2d(dout, 3, 1)
            if use_res:
                self.Conv2 = tnn.Conv2d(dout, dout, 1)
                self.Conv3 = tnn.Conv2d(3, dout, 1)

        def forward(self, x):
            ll = self.HG(x)
            t = self.Conv1(ll)
            if self.use_res:
                return x + self.Conv2(ll) + self.Conv3(t)
            return t

    class RB(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3, bias=False),
                tnn.InstanceNorm2d(dim), tnn.ReLU(True),
                tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3, bias=False),
                tnn.InstanceNorm2d(dim))

        def forward(self, x):
            return x + self.conv_block(x)

    class adaLIN(tnn.Module):
        def __init__(self, nf, eps=1e-5):
            super().__init__()
            self.eps = eps
            self.rho = tnn.Parameter(torch.full((1, nf, 1, 1), 0.9))

        def forward(self, x, gamma, beta):
            im = x.mean([2, 3], keepdim=True)
            iv = x.var([2, 3], keepdim=True)
            oi = (x - im) / torch.sqrt(iv + self.eps)
            lm = x.mean([1, 2, 3], keepdim=True)
            lv = x.var([1, 2, 3], keepdim=True)
            ol = (x - lm) / torch.sqrt(lv + self.eps)
            out = self.rho * oi + (1 - self.rho) * ol
            return out * gamma.unsqueeze(2).unsqueeze(3) + beta.unsqueeze(
                2).unsqueeze(3)

    class SoftAdaLIN(tnn.Module):
        def __init__(self, nf):
            super().__init__()
            self.norm = adaLIN(nf)
            self.w_gamma = tnn.Parameter(torch.zeros(1, nf))
            self.w_beta = tnn.Parameter(torch.zeros(1, nf))
            self.c_gamma = tnn.Sequential(tnn.Linear(nf, nf), tnn.ReLU(True),
                                          tnn.Linear(nf, nf))
            self.c_beta = tnn.Sequential(tnn.Linear(nf, nf), tnn.ReLU(True),
                                         tnn.Linear(nf, nf))
            self.s_gamma = tnn.Linear(nf, nf)
            self.s_beta = tnn.Linear(nf, nf)

        def forward(self, x, c, s):
            cg, cb = self.c_gamma(c), self.c_beta(c)
            sg, sb = self.s_gamma(s), self.s_beta(s)
            g = (1 - self.w_gamma) * sg + self.w_gamma * cg
            b = (1 - self.w_beta) * sb + self.w_beta * cb
            return self.norm(x, g, b)

    class SABlock(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.pad1 = tnn.ReflectionPad2d(1)
            self.conv1 = tnn.Conv2d(dim, dim, 3, bias=False)
            self.norm1 = SoftAdaLIN(dim)
            self.pad2 = tnn.ReflectionPad2d(1)
            self.conv2 = tnn.Conv2d(dim, dim, 3, bias=False)
            self.norm2 = SoftAdaLIN(dim)

        def forward(self, x, c, s):
            out = self.norm1(self.conv1(self.pad1(x)), c, s)
            out = torch.relu(out)
            out = self.norm2(self.conv2(self.pad2(out)), c, s)
            return out + x

    class LIN(tnn.Module):
        def __init__(self, nf, eps=1e-5):
            super().__init__()
            self.eps = eps
            self.rho = tnn.Parameter(torch.zeros(1, nf, 1, 1))
            self.gamma = tnn.Parameter(torch.ones(1, nf, 1, 1))
            self.beta = tnn.Parameter(torch.zeros(1, nf, 1, 1))

        def forward(self, x):
            im = x.mean([2, 3], keepdim=True)
            iv = x.var([2, 3], keepdim=True)
            oi = (x - im) / torch.sqrt(iv + self.eps)
            lm = x.mean([1, 2, 3], keepdim=True)
            lv = x.var([1, 2, 3], keepdim=True)
            ol = (x - lm) / torch.sqrt(lv + self.eps)
            return (self.rho * oi + (1 - self.rho) * ol
                    ) * self.gamma + self.beta

    class Gen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ConvBlock1 = tnn.Sequential(
                tnn.ReflectionPad2d(3), tnn.Conv2d(3, ngf, 7, bias=False),
                tnn.InstanceNorm2d(ngf), tnn.ReLU(True))
            self.HourGlass1 = HG(ngf, ngf)
            self.HourGlass2 = HG(ngf, ngf)
            self.DownBlock1 = tnn.Sequential(
                tnn.ReflectionPad2d(1),
                tnn.Conv2d(ngf, ngf * 2, 3, 2, 0, bias=False),
                tnn.InstanceNorm2d(ngf * 2), tnn.ReLU(True))
            self.DownBlock2 = tnn.Sequential(
                tnn.ReflectionPad2d(1),
                tnn.Conv2d(ngf * 2, ngf * 4, 3, 2, 0, bias=False),
                tnn.InstanceNorm2d(ngf * 4), tnn.ReLU(True))
            for i in range(1, 5):
                setattr(self, f"EncodeBlock{i}", RB(ngf * 4))
            self.gap_fc = tnn.Linear(ngf * 4, 1)
            self.gmp_fc = tnn.Linear(ngf * 4, 1)
            self.conv1x1 = tnn.Conv2d(ngf * 8, ngf * 4, 1)
            self.FC = tnn.Sequential(
                tnn.Linear(ngf * 4, ngf * 4), tnn.ReLU(True),
                tnn.Linear(ngf * 4, ngf * 4), tnn.ReLU(True))
            for i in range(1, 5):
                setattr(self, f"DecodeBlock{i}", SABlock(ngf * 4))
            self.UpBlock1 = tnn.Sequential(
                tnn.Upsample(scale_factor=2), tnn.ReflectionPad2d(1),
                tnn.Conv2d(ngf * 4, ngf * 2, 3, bias=False), LIN(ngf * 2),
                tnn.ReLU(True))
            self.UpBlock2 = tnn.Sequential(
                tnn.Upsample(scale_factor=2), tnn.ReflectionPad2d(1),
                tnn.Conv2d(ngf * 2, ngf, 3, bias=False), LIN(ngf),
                tnn.ReLU(True))
            self.HourGlass3 = HG(ngf, ngf)
            self.HourGlass4 = HG(ngf, ngf, False)
            self.ConvBlock2 = tnn.Sequential(
                tnn.ReflectionPad2d(3), tnn.Conv2d(3, 3, 7, bias=False),
                tnn.Tanh())

        def forward(self, x):
            x = self.ConvBlock1(x)
            x = self.HourGlass1(x)
            x = self.HourGlass2(x)
            x = self.DownBlock1(x)
            x = self.DownBlock2(x)
            contents = []
            for i in range(1, 5):
                x = getattr(self, f"EncodeBlock{i}")(x)
                contents.append(
                    F.adaptive_avg_pool2d(x, 1).view(x.shape[0], -1))
            gap = F.adaptive_avg_pool2d(x, 1)
            gap_logit = self.gap_fc(gap.view(x.shape[0], -1))
            gap = x * self.gap_fc.weight.unsqueeze(2).unsqueeze(3)
            gmp = F.adaptive_max_pool2d(x, 1)
            gmp_logit = self.gmp_fc(gmp.view(x.shape[0], -1))
            gmp = x * self.gmp_fc.weight.unsqueeze(2).unsqueeze(3)
            cam_logit = torch.cat([gap_logit, gmp_logit], 1)
            x = torch.relu(self.conv1x1(torch.cat([gap, gmp], 1)))
            heatmap = torch.sum(x, dim=1, keepdim=True)
            s = F.adaptive_avg_pool2d(x, 1)
            style = self.FC(s.view(s.shape[0], -1))
            for i in range(1, 5):
                x = getattr(self, f"DecodeBlock{i}")(
                    x, contents[4 - i], style)
            x = self.UpBlock1(x)
            x = self.UpBlock2(x)
            x = self.HourGlass3(x)
            x = self.HourGlass4(x)
            return self.ConvBlock2(x), cam_logit, heatmap

    return Gen()


@pytest.mark.slow
def test_photo2cartoon_parity(rng):
    from animateportrait_tpu.models.photo2cartoon import (
        Photo2CartoonGenerator, load_photo2cartoon_params)

    torch.manual_seed(10)
    tg = _torch_p2c().eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}

    img = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    variables = load_photo2cartoon_params(sd)
    out, cam, heat = Photo2CartoonGenerator(ngf=8).apply(
        variables, jnp.asarray(img))
    with torch.no_grad():
        tout, tcam, theat = tg(torch.from_numpy(img).permute(0, 3, 1, 2))
    # the long InstanceNorm chains make this net intrinsically noisy in
    # fp32: torch fp32-vs-fp64 on itself already differs by 2.2e-4
    np.testing.assert_allclose(
        np.asarray(out), tout.permute(0, 2, 3, 1).numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(cam), tcam.numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(heat), theat.permute(0, 2, 3, 1).numpy(), atol=1e-3)
