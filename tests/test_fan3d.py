"""face_alignment-equivalent FAN3D: shared-weights parity vs torch replicas
of the public face_alignment architecture (FAN + ResNetDepth), plus the
crop/transform/gaussian API semantics.

The torch replicas below transcribe the *public* face_alignment package's
models.py/utils.py behavior (Bulat & Tzimiropoulos FAN) — the external
dependency the reference driver imports at main_end2end_module2.py:188."""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch replica: face_alignment models.py
# ---------------------------------------------------------------------------

def conv3x3(inp, out, strd=1, padding=1, bias=False):
    return tnn.Conv2d(inp, out, kernel_size=3, stride=strd,
                      padding=padding, bias=bias)


class TConvBlock(tnn.Module):
    def __init__(self, in_planes, out_planes):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(in_planes)
        self.conv1 = conv3x3(in_planes, out_planes // 2)
        self.bn2 = tnn.BatchNorm2d(out_planes // 2)
        self.conv2 = conv3x3(out_planes // 2, out_planes // 4)
        self.bn3 = tnn.BatchNorm2d(out_planes // 4)
        self.conv3 = conv3x3(out_planes // 4, out_planes // 4)
        if in_planes != out_planes:
            self.downsample = tnn.Sequential(
                tnn.BatchNorm2d(in_planes), tnn.ReLU(True),
                tnn.Conv2d(in_planes, out_planes, 1, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        residual = x
        out1 = self.conv1(F.relu(self.bn1(x), True))
        out2 = self.conv2(F.relu(self.bn2(out1), True))
        out3 = self.conv3(F.relu(self.bn3(out2), True))
        out3 = torch.cat((out1, out2, out3), 1)
        if self.downsample is not None:
            residual = self.downsample(residual)
        return out3 + residual


class THourGlass(tnn.Module):
    def __init__(self, depth=4, features=256):
        super().__init__()
        self.depth = depth
        for level in range(depth, 0, -1):
            self.add_module(f"b1_{level}", TConvBlock(features, features))
            self.add_module(f"b2_{level}", TConvBlock(features, features))
            if level == 1:
                self.add_module(f"b2_plus_{level}",
                                TConvBlock(features, features))
            self.add_module(f"b3_{level}", TConvBlock(features, features))

    def _forward(self, level, inp):
        up1 = self._modules[f"b1_{level}"](inp)
        low1 = F.avg_pool2d(inp, 2, stride=2)
        low1 = self._modules[f"b2_{level}"](low1)
        if level > 1:
            low2 = self._forward(level - 1, low1)
        else:
            low2 = self._modules[f"b2_plus_{level}"](low1)
        low3 = self._modules[f"b3_{level}"](low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._forward(self.depth, x)


class TFAN(tnn.Module):
    def __init__(self, num_modules=1, num_landmarks=68):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = tnn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = TConvBlock(64, 128)
        self.conv3 = TConvBlock(128, 128)
        self.conv4 = TConvBlock(128, 256)
        for m in range(num_modules):
            self.add_module(f"m{m}", THourGlass())
            self.add_module(f"top_m_{m}", TConvBlock(256, 256))
            self.add_module(f"conv_last{m}", tnn.Conv2d(256, 256, 1, 1, 0))
            self.add_module(f"bn_end{m}", tnn.BatchNorm2d(256))
            self.add_module(f"l{m}", tnn.Conv2d(256, num_landmarks,
                                                1, 1, 0))
            if m < num_modules - 1:
                self.add_module(f"bl{m}", tnn.Conv2d(256, 256, 1, 1, 0))
                self.add_module(f"al{m}", tnn.Conv2d(num_landmarks, 256,
                                                     1, 1, 0))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = F.avg_pool2d(self.conv2(x), 2, stride=2)
        x = self.conv3(x)
        x = self.conv4(x)
        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = self._modules[f"m{i}"](previous)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = F.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)), True)
            tmp_out = self._modules[f"l{i}"](ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = self._modules[f"bl{i}"](ll)
                tmp_out_ = self._modules[f"al{i}"](tmp_out)
                previous = previous + ll + tmp_out_
        return outputs


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        residual = x
        out = F.relu(self.bn1(self.conv1(x)), True)
        out = F.relu(self.bn2(self.conv2(out)), True)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return F.relu(out + residual, True)


class TResNetDepth(tnn.Module):
    def __init__(self, layers=(3, 8, 36, 3), num_classes=68):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3 + 68, 64, kernel_size=7, stride=2,
                                padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = tnn.AvgPool2d(7)
        self.fc = tnn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.avgpool(x)
        return self.fc(x.view(x.size(0), -1))


def _randomize_bn_stats(mod, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in mod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features,
                                           generator=g) + 0.5)


# ---------------------------------------------------------------------------
# torch/numpy replica: face_alignment utils.py API
# ---------------------------------------------------------------------------

def _ref_gaussian(size):
    cx = 0.5 * size + 0.5
    g = np.empty((size, size), np.float32)
    for i in range(size):
        for j in range(size):
            g[i][j] = math.exp(
                -(((j + 1 - cx) / (0.25 * size)) ** 2 / 2.0
                  + ((i + 1 - cx) / (0.25 * size)) ** 2 / 2.0))
    return g


def _ref_draw_gaussian(image, point, sigma):
    ul = [math.floor(point[0] - 3 * sigma),
          math.floor(point[1] - 3 * sigma)]
    br = [math.floor(point[0] + 3 * sigma),
          math.floor(point[1] + 3 * sigma)]
    if (ul[0] > image.shape[1] or ul[1] > image.shape[0]
            or br[0] < 1 or br[1] < 1):
        return image
    size = 6 * sigma + 1
    g = _ref_gaussian(size)
    g_x = [int(max(1, -ul[0])),
           int(min(br[0], image.shape[1])) - int(max(1, ul[0]))
           + int(max(1, -ul[0]))]
    g_y = [int(max(1, -ul[1])),
           int(min(br[1], image.shape[0])) - int(max(1, ul[1]))
           + int(max(1, -ul[1]))]
    img_x = [int(max(1, ul[0])), int(min(br[0], image.shape[1]))]
    img_y = [int(max(1, ul[1])), int(min(br[1], image.shape[0]))]
    image[img_y[0] - 1: img_y[1], img_x[0] - 1: img_x[1]] = \
        image[img_y[0] - 1: img_y[1], img_x[0] - 1: img_x[1]] \
        + g[g_y[0] - 1: g_y[1], g_x[0] - 1: g_x[1]]
    image[image > 1] = 1
    return image


def _ref_transform(point, center, scale, resolution, invert=False):
    _pt = torch.ones(3)
    _pt[0], _pt[1] = float(point[0]), float(point[1])
    h = 200.0 * scale
    t = torch.eye(3)
    t[0, 0] = resolution / h
    t[1, 1] = resolution / h
    t[0, 2] = resolution * (-center[0] / h + 0.5)
    t[1, 2] = resolution * (-center[1] / h + 0.5)
    if invert:
        t = torch.inverse(t)
    return (t @ _pt)[0:2].long()


def _ref_crop(image, center, scale, resolution=256.0):
    import cv2

    ul = _ref_transform([1, 1], center, scale, resolution, True)
    br = _ref_transform([resolution, resolution], center, scale,
                        resolution, True)
    new_dim = np.array([br[1] - ul[1], br[0] - ul[0], image.shape[2]],
                       dtype=np.int32)
    new_img = np.zeros(new_dim, dtype=np.uint8)
    ht, wd = image.shape[0], image.shape[1]
    new_x = np.array([max(1, -ul[0] + 1), min(br[0], wd) - ul[0]],
                     dtype=np.int32)
    new_y = np.array([max(1, -ul[1] + 1), min(br[1], ht) - ul[1]],
                     dtype=np.int32)
    old_x = np.array([max(1, ul[0] + 1), min(br[0], wd)], dtype=np.int32)
    old_y = np.array([max(1, ul[1] + 1), min(br[1], ht)], dtype=np.int32)
    new_img[new_y[0] - 1: new_y[1], new_x[0] - 1: new_x[1]] = \
        image[old_y[0] - 1: old_y[1], old_x[0] - 1: old_x[1], :]
    return cv2.resize(new_img, dsize=(int(resolution), int(resolution)),
                      interpolation=cv2.INTER_LINEAR)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fan3d_forward_parity(rng):
    """Shared random weights: torch FAN replica == flax FAN3D."""
    from animateportrait_tpu.models.fan3d import FAN3D, load_fan3d_params

    torch.manual_seed(0)
    tfan = TFAN(num_modules=2).eval()
    _randomize_bn_stats(tfan)
    sd = {k: v.numpy() for k, v in tfan.state_dict().items()}
    variables = load_fan3d_params(sd, num_modules=2)

    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tfan(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = FAN3D(num_modules=2).apply(variables, jnp.asarray(x))
    assert len(ours) == len(ref) == 2
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o), np.transpose(r.numpy(), (0, 2, 3, 1)),
            atol=2e-4)


@pytest.mark.slow
def test_resnet_depth_parity(rng):
    """Shared random weights: torch ResNetDepth replica == flax, incl.
    the AvgPool2d(7)-on-8x8 floor-mode quirk."""
    from animateportrait_tpu.models.fan3d import (ResNetDepth,
                                                  load_depth_params)

    layers = (1, 1, 1, 1)
    torch.manual_seed(1)
    tdep = TResNetDepth(layers=layers).eval()
    _randomize_bn_stats(tdep, seed=1)
    sd = {k: v.numpy() for k, v in tdep.state_dict().items()}
    variables = load_depth_params(sd, layers=layers)

    x = rng.uniform(0, 1, (1, 256, 256, 71)).astype(np.float32)
    with torch.no_grad():
        ref = tdep(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = ResNetDepth(layers=layers).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_decode_heatmaps_matches_reference_loop(rng):
    from animateportrait_tpu.models.fan3d import decode_heatmaps
    from test_fan import _ref_get_preds

    hm = rng.standard_normal((2, 64, 64, 68)).astype(np.float32)
    ours = np.asarray(decode_heatmaps(jnp.asarray(hm)))
    ref = _ref_get_preds(
        torch.from_numpy(np.transpose(hm, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_draw_gaussian_fa_parity():
    from animateportrait_tpu.models.fan3d import draw_gaussian_fa

    pts = np.array([[128.0, 100.0], [3.2, 250.1], [0.5, 0.5],
                    [255.9, 2.0], [-10.0, -10.0], [300.0, 300.0]],
                   np.float32)
    ours = np.asarray(draw_gaussian_fa((256, 256), jnp.asarray(pts),
                                       sigma=2))
    for k, p in enumerate(pts):
        ref = _ref_draw_gaussian(np.zeros((256, 256), np.float32),
                                 p, 2)
        np.testing.assert_allclose(ours[k], ref, atol=1e-6,
                                   err_msg=f"point {p}")


def test_transform_and_center_scale_parity():
    from animateportrait_tpu.models.fan3d import (bbox_to_center_scale,
                                                  fa_transform)

    box = (103.7, 88.2, 411.9, 430.0)
    center, scale = bbox_to_center_scale(box)
    d = box
    ref_center = torch.tensor([d[2] - (d[2] - d[0]) / 2.0,
                               d[3] - (d[3] - d[1]) / 2.0])
    ref_center[1] = ref_center[1] - (d[3] - d[1]) * 0.12
    ref_scale = (d[2] - d[0] + d[3] - d[1]) / 195.0
    np.testing.assert_allclose(center, ref_center.numpy(), rtol=1e-6)
    assert abs(scale - ref_scale) < 1e-9

    for pt in ([1, 1], [256, 256], [33.25, 61.75]):
        ours = fa_transform(pt, center, scale, 256, invert=True)
        ref = _ref_transform(pt, ref_center, ref_scale, 256,
                             invert=True).numpy()
        np.testing.assert_array_equal(ours, ref)
        ours_f = fa_transform(pt, center, scale, 64, invert=False)
        ref_f = _ref_transform(pt, ref_center, ref_scale, 64,
                               invert=False).numpy()
        np.testing.assert_array_equal(ours_f, ref_f)


def test_fa_crop_parity(rng):
    from animateportrait_tpu.models.fan3d import (bbox_to_center_scale,
                                                  fa_crop)

    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    # a box whose crop window crosses the image border
    for box in ((100, 80, 400, 420), (-20, 300, 280, 560)):
        center, scale = bbox_to_center_scale(box)
        ours = fa_crop(img, center, scale)
        ref = _ref_crop(img, torch.tensor(center, dtype=torch.float),
                        scale)
        np.testing.assert_array_equal(ours, ref)


def test_find_fan_checkpoints(tmp_path):
    from animateportrait_tpu.models.fan3d import find_fan_checkpoints

    assert find_fan_checkpoints(str(tmp_path)) == (None, None)
    sub = tmp_path / "face_alignment"
    sub.mkdir()
    (sub / "3DFAN4-7835d9f11d.pth.tar").write_bytes(b"x")
    (sub / "depth-2a464da4ea.pth.tar").write_bytes(b"x")
    fan, depth = find_fan_checkpoints(str(tmp_path))
    assert fan and fan.endswith("3DFAN4-7835d9f11d.pth.tar")
    assert depth and depth.endswith("depth-2a464da4ea.pth.tar")
    # glob fallback for nonstandard names
    (tmp_path / "myFAN4-weights.pth").write_bytes(b"x")
    fan2, _ = find_fan_checkpoints(str(tmp_path))
    assert fan2.endswith("myFAN4-weights.pth")


def test_make_fan_landmark_fn(rng):
    """The frame hook detects with MTCNN-style boxes and returns (68, 3)."""
    from animateportrait_tpu.models.fan3d import (
        FAN3D, FaceAlignment3D, load_fan3d_params, make_fan_landmark_fn)

    torch.manual_seed(4)
    tfan = TFAN(num_modules=1).eval()
    fan_v = load_fan3d_params(
        {k: v.numpy() for k, v in tfan.state_dict().items()},
        num_modules=1)
    fa = FaceAlignment3D(fan_v, None, num_modules=1)

    class Det:
        def __call__(self, rgb):
            return (np.array([[100.0, 90.0, 380.0, 400.0, 0.99]]),
                    np.zeros((1, 10)))

    fn = make_fan_landmark_fn(fa, Det())
    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    out = fn(img)
    assert out.shape == (68, 3)
    assert np.all(out[:, 2] == 0)  # no depth net -> z = 0
    assert np.isfinite(out).all()

    class NoDet:
        def __call__(self, rgb):
            return np.zeros((0, 5)), np.zeros((0, 10))

    with pytest.raises(ValueError):
        make_fan_landmark_fn(fa, NoDet())(img)


@pytest.mark.slow
def test_face_alignment_3d_end_to_end(rng):
    """Full landmarks_from_box path vs a torch transcription of
    face_alignment api.py's 3D branch, shared random weights."""
    from animateportrait_tpu.models.fan3d import (
        FaceAlignment3D, load_depth_params, load_fan3d_params)

    torch.manual_seed(2)
    tfan = TFAN(num_modules=1).eval()
    _randomize_bn_stats(tfan, seed=2)
    layers = (1, 1, 1, 1)
    tdep = TResNetDepth(layers=layers).eval()
    _randomize_bn_stats(tdep, seed=3)

    fan_v = load_fan3d_params(
        {k: v.numpy() for k, v in tfan.state_dict().items()},
        num_modules=1)
    dep_v = load_depth_params(
        {k: v.numpy() for k, v in tdep.state_dict().items()},
        layers=layers)

    fa = FaceAlignment3D(fan_v, dep_v, num_modules=1,
                         depth_layers=layers)

    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    box = (120.0, 110.0, 390.0, 425.0)

    # --- torch reference path (api.py get_landmarks, 3D branch) ---
    d = box
    center = torch.tensor([d[2] - (d[2] - d[0]) / 2.0,
                           d[3] - (d[3] - d[1]) / 2.0])
    center[1] = center[1] - (d[3] - d[1]) * 0.12
    scale = (d[2] - d[0] + d[3] - d[1]) / 195.0
    crop = _ref_crop(img, center, scale)
    inp = torch.from_numpy(crop.transpose(2, 0, 1)).float().div(
        255.0).unsqueeze(0)
    with torch.no_grad():
        out = tfan(inp)[-1]
    from test_fan import _ref_get_preds

    preds = _ref_get_preds(out)
    pts = preds.view(68, 2) * 4
    pts_img = torch.zeros(68, 2)
    for j in range(68):
        pts_img[j] = _ref_transform(preds[0, j], center, scale, 64, True)
    heatmaps = np.zeros((68, 256, 256), dtype=np.float32)
    for i in range(68):
        if pts[i, 0] > 0:
            heatmaps[i] = _ref_draw_gaussian(heatmaps[i],
                                             pts[i].numpy(), 2)
    hmt = torch.from_numpy(heatmaps).unsqueeze(0)
    with torch.no_grad():
        depth_pred = tdep(torch.cat((inp, hmt), 1)).view(68, 1)
    ref = torch.cat(
        (pts_img, depth_pred * (1.0 / (256.0 / (200.0 * scale)))),
        1).numpy()

    ours = fa.landmarks_from_box(img, box)
    np.testing.assert_allclose(ours[:, :2], ref[:, :2], atol=0)
    np.testing.assert_allclose(ours[:, 2], ref[:, 2], atol=2e-3)
