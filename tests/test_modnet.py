"""MODNet parity vs a torch replica of the reference architecture
(`Module2/models/modnet.py` + mobilenetv2 backbone) with shared weights."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp


def _torch_modnet():
    def conv_bn(inp, oup, stride):
        return tnn.Sequential(
            tnn.Conv2d(inp, oup, 3, stride, 1, bias=False),
            tnn.BatchNorm2d(oup), tnn.ReLU6(inplace=True))

    def conv_1x1_bn(inp, oup):
        return tnn.Sequential(
            tnn.Conv2d(inp, oup, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(oup), tnn.ReLU6(inplace=True))

    class InvRes(tnn.Module):
        def __init__(self, inp, oup, stride, expansion):
            super().__init__()
            hidden = round(inp * expansion)
            self.use_res = stride == 1 and inp == oup
            if expansion == 1:
                self.conv = tnn.Sequential(
                    tnn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                               bias=False),
                    tnn.BatchNorm2d(hidden), tnn.ReLU6(inplace=True),
                    tnn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                    tnn.BatchNorm2d(oup))
            else:
                self.conv = tnn.Sequential(
                    tnn.Conv2d(inp, hidden, 1, 1, 0, bias=False),
                    tnn.BatchNorm2d(hidden), tnn.ReLU6(inplace=True),
                    tnn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                               bias=False),
                    tnn.BatchNorm2d(hidden), tnn.ReLU6(inplace=True),
                    tnn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                    tnn.BatchNorm2d(oup))

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class MBV2(tnn.Module):
        def __init__(self):
            super().__init__()
            setting = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                       (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                       (6, 320, 1, 1)]
            feats = [conv_bn(3, 32, 2)]
            inp = 32
            for t, c, n, s in setting:
                for i in range(n):
                    feats.append(InvRes(inp, c, s if i == 0 else 1, t))
                    inp = c
            feats.append(conv_1x1_bn(inp, 1280))
            self.features = tnn.Sequential(*feats)

    class Backbone(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = MBV2()

        def forward(self, x):
            outs, ends = [], {1, 3, 6, 13, 18}
            for i, f in enumerate(self.model.features):
                x = f(x)
                if i in ends:
                    outs.append(x)
            return outs

    class IBNorm(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.bnorm_channels = c // 2
            self.bnorm = tnn.BatchNorm2d(c // 2, affine=True)
            self.inorm = tnn.InstanceNorm2d(c - c // 2, affine=False)

        def forward(self, x):
            bn = self.bnorm(x[:, : self.bnorm_channels].contiguous())
            inn = self.inorm(x[:, self.bnorm_channels:].contiguous())
            return torch.cat((bn, inn), 1)

    class CIBR(tnn.Module):
        def __init__(self, i, o, k, stride=1, padding=0, with_ibn=True,
                     with_relu=True):
            super().__init__()
            layers = [tnn.Conv2d(i, o, k, stride=stride, padding=padding)]
            if with_ibn:
                layers.append(IBNorm(o))
            if with_relu:
                layers.append(tnn.ReLU(inplace=True))
            self.layers = tnn.Sequential(*layers)

        def forward(self, x):
            return self.layers(x)

    class SEB(tnn.Module):
        def __init__(self, c, r=4):
            super().__init__()
            self.fc = tnn.Sequential(
                tnn.Linear(c, c // r, bias=False), tnn.ReLU(inplace=True),
                tnn.Linear(c // r, c, bias=False), tnn.Sigmoid())

        def forward(self, x):
            b, c, _, _ = x.size()
            w = F.adaptive_avg_pool2d(x, 1).view(b, c)
            return x * self.fc(w).view(b, c, 1, 1)

    ec, hc = [16, 24, 32, 96, 1280], 32

    class LR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.se_block = SEB(ec[4])
            self.conv_lr16x = CIBR(ec[4], ec[3], 5, padding=2)
            self.conv_lr8x = CIBR(ec[3], ec[2], 5, padding=2)
            self.conv_lr = CIBR(ec[2], 1, 3, stride=2, padding=1,
                                with_ibn=False, with_relu=False)

        def forward(self, img):
            enc = self.backbone(img)
            enc2x, enc4x, enc32x = enc[0], enc[1], enc[4]
            e = self.se_block(enc32x)
            lr16x = self.conv_lr16x(F.interpolate(
                e, scale_factor=2, mode="bilinear", align_corners=False))
            lr8x = self.conv_lr8x(F.interpolate(
                lr16x, scale_factor=2, mode="bilinear", align_corners=False))
            return lr8x, enc2x, enc4x

    class HR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.tohr_enc2x = CIBR(ec[0], hc, 1)
            self.conv_enc2x = CIBR(hc + 3, hc, 3, stride=2, padding=1)
            self.tohr_enc4x = CIBR(ec[1], hc, 1)
            self.conv_enc4x = CIBR(2 * hc, 2 * hc, 3, padding=1)
            self.conv_hr4x = tnn.Sequential(
                CIBR(3 * hc + 3, 2 * hc, 3, padding=1),
                CIBR(2 * hc, 2 * hc, 3, padding=1),
                CIBR(2 * hc, hc, 3, padding=1))
            self.conv_hr2x = tnn.Sequential(
                CIBR(2 * hc, 2 * hc, 3, padding=1),
                CIBR(2 * hc, hc, 3, padding=1),
                CIBR(hc, hc, 3, padding=1),
                CIBR(hc, hc, 3, padding=1))

        def forward(self, img, enc2x, enc4x, lr8x):
            img2x = F.interpolate(img, scale_factor=1 / 2, mode="bilinear",
                                  align_corners=False)
            img4x = F.interpolate(img, scale_factor=1 / 4, mode="bilinear",
                                  align_corners=False)
            enc2x = self.tohr_enc2x(enc2x)
            hr4x = self.conv_enc2x(torch.cat((img2x, enc2x), 1))
            enc4x = self.tohr_enc4x(enc4x)
            hr4x = self.conv_enc4x(torch.cat((hr4x, enc4x), 1))
            lr4x = F.interpolate(lr8x, scale_factor=2, mode="bilinear",
                                 align_corners=False)
            hr4x = self.conv_hr4x(torch.cat((hr4x, lr4x, img4x), 1))
            hr2x = F.interpolate(hr4x, scale_factor=2, mode="bilinear",
                                 align_corners=False)
            return self.conv_hr2x(torch.cat((hr2x, enc2x), 1))

    class FB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_lr4x = CIBR(ec[2], hc, 5, padding=2)
            self.conv_f2x = CIBR(2 * hc, hc, 3, padding=1)
            self.conv_f = tnn.Sequential(
                CIBR(hc + 3, hc // 2, 3, padding=1),
                CIBR(hc // 2, 1, 1, with_ibn=False, with_relu=False))

        def forward(self, img, lr8x, hr2x):
            lr4x = self.conv_lr4x(F.interpolate(
                lr8x, scale_factor=2, mode="bilinear", align_corners=False))
            lr2x = F.interpolate(lr4x, scale_factor=2, mode="bilinear",
                                 align_corners=False)
            f2x = self.conv_f2x(torch.cat((lr2x, hr2x), 1))
            f = F.interpolate(f2x, scale_factor=2, mode="bilinear",
                              align_corners=False)
            return torch.sigmoid(self.conv_f(torch.cat((f, img), 1)))

    class MN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lr_branch, self.hr_branch, self.f_branch = LR(), HR(), FB()

        def forward(self, img):
            lr8x, enc2x, enc4x = self.lr_branch(img)
            hr2x = self.hr_branch(img, enc2x, enc4x, lr8x)
            return self.f_branch(img, lr8x, hr2x)

    return MN()


@pytest.mark.slow
def test_modnet_parity(rng):
    from animateportrait_tpu.models.modnet import MODNet, load_modnet_params

    torch.manual_seed(7)
    tm = _torch_modnet()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = load_modnet_params(sd)
    _, _, matte = MODNet().apply(variables, jnp.asarray(img))
    with torch.no_grad():
        tmatte = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
    # Tolerance is measured cross-platform drift, not a logic bound: on an
    # avx512 1-core host with a COLD compile cache (ruling out stale AOT
    # entries) the max |diff| across seeds {7,8,9} is 8.0e-5 / 1.37e-4 /
    # 8.3e-5 (rel <= 1.6e-4) — f32 accumulation-order differences between
    # XLA:CPU codegen and torch's conv kernels, compounded through the
    # ~55-conv MobileNetV2+branches stack. atol=4e-4 is ~3x the worst
    # measured drift while still far below any wiring-bug signal (matte in
    # [0,1]; a real bug shows O(0.1) diffs). The XLA "machine feature
    # +prefer-no-gather is not supported on the host" AOT-cache warning is
    # a red herring: it fires even for cache entries compiled on this same
    # host minutes earlier, because prefer-no-gather is an XLA tuning flag
    # that never appears in the host-feature probe.
    np.testing.assert_allclose(
        np.asarray(matte), tmatte.permute(0, 2, 3, 1).numpy(), atol=4e-4)
