"""LPIPS (PNetLin) parity vs torch replicas of
`Module2/models/{networks_basic,pretrained_networks}.py`, plus SSIM/PSNR
metric checks."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import pytest
import jax
import jax.numpy as jnp

from animateportrait_tpu.models.lpips import (
    Dist2LogitLayer, PNetLin, bce_ranking_loss, l2_rgb,
    load_alexnet_features, load_pnetlin_params, load_squeezenet_features,
    load_vgg16_features)
from animateportrait_tpu.utils.metrics import psnr_ref, ssim, ssim_ref


def _torch_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    return tnn.Sequential(*layers)


def _torch_alexnet_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU())


class _TFire(tnn.Module):
    def __init__(self, cin, s, e):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, s, 1)
        self.expand1x1 = tnn.Conv2d(s, e, 1)
        self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)

    def forward(self, x):
        x = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(x)),
                          F.relu(self.expand3x3(x))], 1)


def _torch_squeezenet_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, 2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(64, 16, 64), _TFire(128, 16, 64),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(128, 32, 128), _TFire(256, 32, 128),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(256, 48, 192), _TFire(384, 48, 192),
        _TFire(384, 64, 256), _TFire(512, 64, 256))


def _slice_ends(name):
    return {"vgg": (4, 9, 16, 23, 30), "alex": (2, 5, 8, 10, 12),
            "squeeze": (2, 5, 8, 10, 11, 12, 13)}[name]


def _torch_slices(feats, name, x):
    outs, i0 = [], 0
    for i1 in _slice_ends(name):
        for i in range(i0, i1):
            x = feats[i](x)
        outs.append(x)
        i0 = i1
    return outs


def _normalize(t, eps=1e-10):
    return t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True)) + eps)


def _torch_pnetlin(feats, name, lins, x0, x1):
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    o0 = _torch_slices(feats, name, (x0 - shift) / scale)
    o1 = _torch_slices(feats, name, (x1 - shift) / scale)
    val = 0
    for k, (a, b) in enumerate(zip(o0, o1)):
        d = (_normalize(a) - _normalize(b)) ** 2
        d = F.conv2d(d, lins[k])
        val = val + d.mean([2, 3], keepdim=True)
    return val


def _run_parity(name, build, loader, size):
    torch.manual_seed(0)
    feats = build().eval()
    sd = {f"features.{k}": v.numpy()
          for k, v in feats.state_dict().items()}
    chns = {"vgg": (64, 128, 256, 512, 512),
            "alex": (64, 192, 384, 256, 256),
            "squeeze": (64, 128, 256, 384, 384, 512, 512)}[name]
    lins = [torch.rand(1, c, 1, 1) for c in chns]
    lins_sd = {f"lin{k}.model.1.weight": w.numpy()
               for k, w in enumerate(lins)}
    variables = load_pnetlin_params(sd, lins_sd, pnet_type=name)
    model = PNetLin(pnet_type=name)

    rng = np.random.default_rng(1)
    x0 = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        tval = _torch_pnetlin(feats, name,
                              [w for w in lins],
                              torch.tensor(x0).permute(0, 3, 1, 2),
                              torch.tensor(x1).permute(0, 3, 1, 2))
    jval = model.apply(variables, jnp.asarray(x0), jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(jval).ravel(),
                               tval.numpy().ravel(), atol=1e-4)


@pytest.mark.slow
def test_pnetlin_vgg_parity():
    _run_parity("vgg", _torch_vgg16_features, load_vgg16_features, 64)


def test_pnetlin_alex_parity():
    _run_parity("alex", _torch_alexnet_features, load_alexnet_features, 64)


@pytest.mark.slow
def test_pnetlin_squeeze_parity():
    _run_parity("squeeze", _torch_squeezenet_features,
                load_squeezenet_features, 64)


def test_lpips_zero_for_identical():
    model = PNetLin(pnet_type="alex", lpips=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, x)
    assert float(model.apply(variables, x, x).ravel()[0]) < 1e-8


def test_dist2logit_and_ranking_loss():
    model = Dist2LogitLayer()
    d0 = jnp.full((2, 1, 1, 1), 0.3)
    d1 = jnp.full((2, 1, 1, 1), 0.7)
    variables = model.init(jax.random.key(0), d0, d1)
    logit = model.apply(variables, d0, d1)
    assert logit.shape == (2, 1, 1, 1)
    assert float(jnp.min(logit)) >= 0 and float(jnp.max(logit)) <= 1
    loss = bce_ranking_loss(logit, jnp.zeros((2, 1, 1, 1)))
    assert np.isfinite(float(loss))


def test_l2_rgb():
    a = jnp.zeros((1, 4, 4, 3))
    b = jnp.ones((1, 4, 4, 3)) * 2
    np.testing.assert_allclose(np.asarray(l2_rgb(a, b)), [4.0])


def _numpy_ssim(a, b, win=7, dr=255.0):
    """Direct per-window replica of skimage structural_similarity."""
    h, w, c = a.shape
    half = win // 2
    covn = win * win / (win * win - 1.0)
    c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
    vals = []
    for ch in range(c):
        for i in range(half, h - half):
            for j in range(half, w - half):
                pa = a[i - half:i + half + 1, j - half:j + half + 1, ch]
                pb = b[i - half:i + half + 1, j - half:j + half + 1, ch]
                ux, uy = pa.mean(), pb.mean()
                vx = covn * (np.mean(pa * pa) - ux * ux)
                vy = covn * (np.mean(pb * pb) - uy * uy)
                vxy = covn * (np.mean(pa * pb) - ux * uy)
                vals.append(((2 * ux * uy + c1) * (2 * vxy + c2)) /
                            ((ux * ux + uy * uy + c1) * (vx + vy + c2)))
    return np.mean(vals)


def test_ssim_matches_windowed_definition():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (10, 10, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
    ours = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    np.testing.assert_allclose(ours, _numpy_ssim(a, b), rtol=1e-5)


def test_ssim_psnr_ref_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    assert abs(float(ssim_ref(x, x)) - 1.0) < 1e-6
    assert float(psnr_ref(x, x)) > 80
    y = jnp.clip(x + 0.2, -1, 1)
    assert float(ssim_ref(x, y)) < 1.0
    assert float(psnr_ref(x, y)) < 30
