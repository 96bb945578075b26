"""Parity tests for MobileFaceNet and Sphere20a vs torch replicas of the
reference architectures (mobilefacenet.py, facenet.py) with shared weights."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp


def _torch_mobilefacenet(embedding_size=136):
    class Flatten(tnn.Module):
        def forward(self, x):
            return x.view(x.size(0), -1)

    class ConvBlock(tnn.Module):
        def __init__(self, i, o, kernel=(1, 1), stride=(1, 1),
                     padding=(0, 0), groups=1):
            super().__init__()
            self.conv = tnn.Conv2d(i, o, kernel, groups=groups,
                                   stride=stride, padding=padding,
                                   bias=False)
            self.bn = tnn.BatchNorm2d(o)
            self.prelu = tnn.PReLU(o)

        def forward(self, x):
            return self.prelu(self.bn(self.conv(x)))

    class LinearBlock(tnn.Module):
        def __init__(self, i, o, kernel=(1, 1), stride=(1, 1),
                     padding=(0, 0), groups=1):
            super().__init__()
            self.conv = tnn.Conv2d(i, o, kernel, groups=groups,
                                   stride=stride, padding=padding,
                                   bias=False)
            self.bn = tnn.BatchNorm2d(o)

        def forward(self, x):
            return self.bn(self.conv(x))

    class DepthWise(tnn.Module):
        def __init__(self, i, o, residual=False, kernel=(3, 3),
                     stride=(2, 2), padding=(1, 1), groups=1):
            super().__init__()
            self.conv = ConvBlock(i, groups)
            self.conv_dw = ConvBlock(groups, groups, groups=groups,
                                     kernel=kernel, padding=padding,
                                     stride=stride)
            self.project = LinearBlock(groups, o)
            self.residual = residual

        def forward(self, x):
            y = self.project(self.conv_dw(self.conv(x)))
            return x + y if self.residual else y

    class Residual(tnn.Module):
        def __init__(self, c, num_block, groups):
            super().__init__()
            self.model = tnn.Sequential(*[
                DepthWise(c, c, residual=True, stride=(1, 1), groups=groups)
                for _ in range(num_block)])

        def forward(self, x):
            return self.model(x)

    class GDC(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_6_dw = LinearBlock(512, 512, groups=512,
                                         kernel=(7, 7))
            self.conv_6_flatten = Flatten()
            self.linear = tnn.Linear(512, embedding_size, bias=False)
            self.bn = tnn.BatchNorm1d(embedding_size)

        def forward(self, x):
            return self.bn(self.linear(
                self.conv_6_flatten(self.conv_6_dw(x))))

    class MFN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = ConvBlock(3, 64, (3, 3), (2, 2), (1, 1))
            self.conv2_dw = ConvBlock(64, 64, (3, 3), (1, 1), (1, 1),
                                      groups=64)
            self.conv_23 = DepthWise(64, 64, groups=128)
            self.conv_3 = Residual(64, 4, 128)
            self.conv_34 = DepthWise(64, 128, groups=256)
            self.conv_4 = Residual(128, 6, 256)
            self.conv_45 = DepthWise(128, 128, groups=512)
            self.conv_5 = Residual(128, 2, 256)
            self.conv_6_sep = ConvBlock(128, 512)
            self.output_layer = GDC()

        def forward(self, x):
            x = self.conv1(x)
            x = self.conv2_dw(x)
            x = self.conv_23(x)
            x = self.conv_3(x)
            x = self.conv_34(x)
            x = self.conv_4(x)
            x = self.conv_45(x)
            x = self.conv_5(x)
            feats = self.conv_6_sep(x)
            return self.output_layer(feats), feats

    return MFN()


def test_mobilefacenet_parity(rng):
    from animateportrait_tpu.models.perception import (
        MobileFaceNet, load_mobilefacenet_params)

    torch.manual_seed(8)
    tm = _torch_mobilefacenet()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    img = rng.uniform(0, 1, (2, 112, 112, 3)).astype(np.float32)
    variables = load_mobilefacenet_params(sd)
    lm, feats = MobileFaceNet().apply(variables, jnp.asarray(img))
    with torch.no_grad():
        tlm, tfeats = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(lm), tlm.numpy(), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(feats), tfeats.permute(0, 2, 3, 1).numpy(), atol=5e-5)


def _torch_sphere20a():
    class S(tnn.Module):
        def __init__(self):
            super().__init__()
            defs = [("1_1", 3, 64, 2), ("1_2", 64, 64, 1),
                    ("1_3", 64, 64, 1),
                    ("2_1", 64, 128, 2), ("2_2", 128, 128, 1),
                    ("2_3", 128, 128, 1), ("2_4", 128, 128, 1),
                    ("2_5", 128, 128, 1),
                    ("3_1", 128, 256, 2)] + [
                    (f"3_{i}", 256, 256, 1) for i in range(2, 10)] + [
                    ("4_1", 256, 512, 2), ("4_2", 512, 512, 1),
                    ("4_3", 512, 512, 1)]
            for n, i, o, s in defs:
                setattr(self, f"conv{n}", tnn.Conv2d(i, o, 3, s, 1))
                setattr(self, f"relu{n}", tnn.PReLU(o))
            self.fc5 = tnn.Linear(512 * 7 * 6, 512)

        def forward(self, x):
            def c(n, y):
                return getattr(self, f"relu{n}")(getattr(self, f"conv{n}")(y))

            f = []
            x = c("1_1", x)
            x = x + c("1_3", c("1_2", x))
            f.append(x)
            x = c("2_1", x)
            x = x + c("2_3", c("2_2", x))
            x = x + c("2_5", c("2_4", x))
            f.append(x)
            x = c("3_1", x)
            for a, b in (("3_3", "3_2"), ("3_5", "3_4"), ("3_7", "3_6"),
                         ("3_9", "3_8")):
                x = x + c(a, c(b, x))
            f.append(x)
            x = c("4_1", x)
            x = x + c("4_3", c("4_2", x))
            f.append(x)
            x = self.fc5(x.reshape(x.size(0), -1))
            f.append(x)
            return f

    return S()


def test_sphere20a_parity_and_face_loss(rng):
    import functools
    from animateportrait_tpu.models.perception import (
        Sphere20a, load_sphere20a_params, face_loss)

    torch.manual_seed(9)
    ts = _torch_sphere20a().eval()
    sd = {k: v.detach().numpy() for k, v in ts.state_dict().items()}

    img1 = rng.uniform(-1, 1, (2, 112, 96, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (2, 112, 96, 3)).astype(np.float32)
    variables = load_sphere20a_params(sd)
    model = Sphere20a()
    feats = model.apply(variables, jnp.asarray(img1))
    with torch.no_grad():
        tfeats = ts(torch.from_numpy(img1).permute(0, 3, 1, 2))
    assert len(feats) == 5
    for i, (a, b) in enumerate(zip(feats, tfeats)):
        b = b.numpy() if b.dim() == 2 else b.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4,
                                   err_msg=f"level {i}")

    # FaceLoss: unweighted sum of L1s
    ours = face_loss(
        functools.partial(model.apply), variables,
        jnp.asarray(img1), jnp.asarray(img2))
    with torch.no_grad():
        t1 = ts(torch.from_numpy(img1).permute(0, 3, 1, 2))
        t2 = ts(torch.from_numpy(img2).permute(0, 3, 1, 2))
        ref = sum(tnn.L1Loss()(a, b) for a, b in zip(t1, t2))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-4)


def test_crop_head_bbox(rng):
    from animateportrait_tpu.models.perception import crop_head_bbox

    imgs = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    bbox = np.array([[10, 50, 8, 60]], np.float32)  # lt_x, rt_x, lt_y, rt_y
    out = crop_head_bbox(jnp.asarray(imgs), jnp.asarray(bbox))
    assert out.shape == (1, 112, 96, 3)
    crop = torch.from_numpy(
        imgs[:, 8:60, 10:50]).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        crop, size=(112, 96), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


@pytest.mark.slow
def test_senet50_parity(rng):
    """SENet-50 feature extractor vs a torch replica (one block per layer
    to keep it fast; same bottleneck/SE structure)."""
    from animateportrait_tpu.models.perception import (
        SENet50, load_senet50_params)

    class TB(tnn.Module):
        def __init__(self, inp, planes, stride=1, down=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 1, stride, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.conv4 = tnn.Conv2d(planes * 4, planes * 4 // 16, 1)
            self.conv5 = tnn.Conv2d(planes * 4 // 16, planes * 4, 1)
            self.downsample = None
            if down:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4))

        def forward(self, x):
            import torch.nn.functional as F

            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            se = F.avg_pool2d(out, out.size(2))
            se = torch.sigmoid(self.conv5(F.relu(self.conv4(se))))
            res = x if self.downsample is None else self.downsample(x)
            return F.relu(se * out + res)

    class TS(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
            self.layer1 = tnn.Sequential(TB(64, 64, 1, True))
            self.layer2 = tnn.Sequential(TB(256, 128, 2, True))
            self.layer3 = tnn.Sequential(TB(512, 256, 2, True))
            self.layer4 = tnn.Sequential(TB(1024, 512, 2, True))

        def forward(self, x):
            import torch.nn.functional as F

            x = F.relu(self.bn1(self.conv1(x)))
            x0 = self.maxpool(x)
            x1 = self.layer1(x0)
            x2 = self.layer2(x1)
            x3 = self.layer3(x2)
            x4 = self.layer4(x3)
            return [x0, x1, x2, x3, x4]

    import jax

    torch.manual_seed(12)
    ts = TS()
    for m in ts.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    ts.eval()
    sd = {k: v.detach().numpy() for k, v in ts.state_dict().items()}

    img = rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32)
    variables = load_senet50_params(sd)
    model = SENet50(layers=(1, 1, 1, 1))
    feats = model.apply(variables, jnp.asarray(img))
    with torch.no_grad():
        tfeats = ts(torch.from_numpy(img).permute(0, 3, 1, 2))
    assert len(feats) == 5
    for i, (a, b) in enumerate(zip(feats, tfeats)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=1e-4,
            err_msg=f"level {i}")
