"""MTCNN parity tests: our Flax nets vs the reference torch nets with the
real pretrained weights from /root/reference/MTCNN/weights."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
WEIGHTS = os.path.join(REF, "MTCNN", "weights")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS, "pnet.npy")),
    reason="reference weights not mounted",
)


def _torch_pnet():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    from collections import OrderedDict

    class TP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(OrderedDict([
                ("conv1", tnn.Conv2d(3, 10, 3, 1)),
                ("prelu1", tnn.PReLU(10)),
                ("pool1", tnn.MaxPool2d(2, 2, ceil_mode=True)),
                ("conv2", tnn.Conv2d(10, 16, 3, 1)),
                ("prelu2", tnn.PReLU(16)),
                ("conv3", tnn.Conv2d(16, 32, 3, 1)),
                ("prelu3", tnn.PReLU(32)),
            ]))
            self.conv4_1 = tnn.Conv2d(32, 2, 1, 1)
            self.conv4_2 = tnn.Conv2d(32, 4, 1, 1)
            w = np.load(os.path.join(WEIGHTS, "pnet.npy"),
                        allow_pickle=True)[()]
            for n, p in self.named_parameters():
                p.data = torch.FloatTensor(w[n])

        def forward(self, x):
            x = self.features(x)
            b = self.conv4_2(x)
            a = F.softmax(self.conv4_1(x), dim=1)
            return b, a

    return TP().eval()


def test_pnet_forward_parity(rng):
    import torch
    from animateportrait_tpu.models.mtcnn import PNet, load_pnet_params

    img = rng.standard_normal((1, 37, 41, 3)).astype(np.float32)
    params = load_pnet_params(os.path.join(WEIGHTS, "pnet.npy"))
    off, probs = PNet().apply(params, jnp.asarray(img))

    tp = _torch_pnet()
    with torch.no_grad():
        toff, tprobs = tp(torch.from_numpy(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(off), toff.permute(0, 2, 3, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(probs), tprobs.permute(0, 2, 3, 1).numpy(), atol=2e-5)


def test_rnet_onet_forward_parity(rng):
    """RNet/ONet parity incl. the Flatten transpose quirk, using the real
    weights (the quirk would break parity if mis-reproduced)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    from collections import OrderedDict
    from animateportrait_tpu.models.mtcnn import (
        RNet, ONet, load_rnet_params, load_onet_params)

    class Flatten(tnn.Module):
        def forward(self, x):
            x = x.transpose(3, 2).contiguous()
            return x.view(x.size(0), -1)

    class TR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(OrderedDict([
                ("conv1", tnn.Conv2d(3, 28, 3, 1)),
                ("prelu1", tnn.PReLU(28)),
                ("pool1", tnn.MaxPool2d(3, 2, ceil_mode=True)),
                ("conv2", tnn.Conv2d(28, 48, 3, 1)),
                ("prelu2", tnn.PReLU(48)),
                ("pool2", tnn.MaxPool2d(3, 2, ceil_mode=True)),
                ("conv3", tnn.Conv2d(48, 64, 2, 1)),
                ("prelu3", tnn.PReLU(64)),
                ("flatten", Flatten()),
                ("conv4", tnn.Linear(576, 128)),
                ("prelu4", tnn.PReLU(128)),
            ]))
            self.conv5_1 = tnn.Linear(128, 2)
            self.conv5_2 = tnn.Linear(128, 4)
            w = np.load(os.path.join(WEIGHTS, "rnet.npy"),
                        allow_pickle=True)[()]
            for n, p in self.named_parameters():
                p.data = torch.FloatTensor(w[n])

        def forward(self, x):
            x = self.features(x)
            return self.conv5_2(x), F.softmax(self.conv5_1(x), dim=1)

    img = rng.standard_normal((3, 24, 24, 3)).astype(np.float32)
    params = load_rnet_params(os.path.join(WEIGHTS, "rnet.npy"))
    off, probs = RNet().apply(params, jnp.asarray(img))
    tr = TR().eval()
    with torch.no_grad():
        toff, tprobs = tr(torch.from_numpy(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(off), toff.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), tprobs.numpy(), atol=2e-5)

    class TO(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(OrderedDict([
                ("conv1", tnn.Conv2d(3, 32, 3, 1)),
                ("prelu1", tnn.PReLU(32)),
                ("pool1", tnn.MaxPool2d(3, 2, ceil_mode=True)),
                ("conv2", tnn.Conv2d(32, 64, 3, 1)),
                ("prelu2", tnn.PReLU(64)),
                ("pool2", tnn.MaxPool2d(3, 2, ceil_mode=True)),
                ("conv3", tnn.Conv2d(64, 64, 3, 1)),
                ("prelu3", tnn.PReLU(64)),
                ("pool3", tnn.MaxPool2d(2, 2, ceil_mode=True)),
                ("conv4", tnn.Conv2d(64, 128, 2, 1)),
                ("prelu4", tnn.PReLU(128)),
                ("flatten", Flatten()),
                ("conv5", tnn.Linear(1152, 256)),
                ("drop5", tnn.Dropout(0.25)),
                ("prelu5", tnn.PReLU(256)),
            ]))
            self.conv6_1 = tnn.Linear(256, 2)
            self.conv6_2 = tnn.Linear(256, 4)
            self.conv6_3 = tnn.Linear(256, 10)
            w = np.load(os.path.join(WEIGHTS, "onet.npy"),
                        allow_pickle=True)[()]
            for n, p in self.named_parameters():
                p.data = torch.FloatTensor(w[n])

        def forward(self, x):
            x = self.features(x)
            return (self.conv6_3(x), self.conv6_2(x),
                    F.softmax(self.conv6_1(x), dim=1))

    img = rng.standard_normal((2, 48, 48, 3)).astype(np.float32)
    params = load_onet_params(os.path.join(WEIGHTS, "onet.npy"))
    lm, off, probs = ONet().apply(params, jnp.asarray(img))
    to = TO().eval()
    with torch.no_grad():
        tlm, toff, tprobs = to(torch.from_numpy(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(lm), tlm.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(off), toff.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), tprobs.numpy(), atol=2e-5)


def test_cascade_detects_synthetic_face():
    """End-to-end cascade smoke test on the example photo if present."""
    from PIL import Image
    from animateportrait_tpu.models.mtcnn import (
        MTCNNDetector, load_pnet_params, load_rnet_params, load_onet_params)

    jpg = os.path.join(REF, "examples", "hermione2.jpeg")
    if not os.path.exists(jpg):
        pytest.skip("example photo missing")
    img = Image.open(jpg).convert("RGB")
    img = img.resize((img.width // 2, img.height // 2), Image.BILINEAR)
    det = MTCNNDetector(
        load_pnet_params(os.path.join(WEIGHTS, "pnet.npy")),
        load_rnet_params(os.path.join(WEIGHTS, "rnet.npy")),
        load_onet_params(os.path.join(WEIGHTS, "onet.npy")),
    )
    boxes, lms = det(np.asarray(img, np.float32))
    assert len(boxes) >= 1
    # face should be roughly centered horizontally
    x1, y1, x2, y2, score = boxes[0]
    assert score > 0.9
    assert 0 < x1 < x2 < img.width
    assert 0 < y1 < y2 < img.height
    # landmarks inside the box
    assert np.all(lms[0][:5] >= x1 - 5) and np.all(lms[0][:5] <= x2 + 5)
