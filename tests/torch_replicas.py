"""Parameterized torch replicas of reference generators, shared by parity
tests (transcribed from Module2/models/networks.py behavior; weights are
always random and converted through animateportrait_tpu.io.torch_convert)."""
import torch
import torch.nn as tnn
import torch.nn.functional as F

from test_gan import (_TorchResnetBlock, _TorchResnetBlock2,
                      _torch_warp_acc_flow)


def make_small_style2_torch(ngf=8, nb=2, output_nc=1):
    """ResnetStyle2Generator replica (networks.py:573-637)."""

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
            m += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, output_nc, 7),
                  tnn.Tanh()]
            self.model0 = tnn.Sequential(*m0)
            self.model = tnn.Sequential(*m)

        def forward(self, x, style):
            f = self.model0(x)
            return self.model(torch.cat([f, style], 1))

    return TS()


def make_small_trident_torch(ngf=8, nb=3, size=256, div=3, disp=1,
                             output_nc=3):
    """ResnetConditionTriGenerator32_full_ifw replica
    (networks.py:1190-1340) with parameterized blocks/conditioning."""

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
                if (i + disp) % div == 0:
                    blocks.append(_TorchResnetBlock2(ngf * 4 + 32,
                                                     ngf * 4))
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
                tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, output_nc, 7),
                tnn.Tanh())
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
                motion = F.interpolate(motion, size=(s, s),
                                       mode="bilinear",
                                       align_corners=True)
                motion = motion.permute(0, 2, 3, 1)
                flow = F.interpolate(flow / (2 ** level), size=(s, s),
                                     mode="bilinear", align_corners=True)
                ifmask = F.interpolate(ifmask, size=(s, s),
                                       mode="bilinear",
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
                if (i + disp) % div == 0:
                    x = self.model2[i](torch.cat([x, l1, l2], 1))
                else:
                    x = self.model2[i](x)
            return self.model3(x)

    return TT()
