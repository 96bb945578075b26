"""GMM geometric-matching parity vs a torch replica of
`Module1/src/models/model_image_translation.py:102-290,599-623`."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import pytest
import jax.numpy as jnp

from animateportrait_tpu.models.image_translation import (
    GMM, affine_grid, feature_correlation, feature_l2_norm,
    load_gmm_params, tps_grid)


class _TFeatureExtraction(tnn.Module):
    def __init__(self, input_nc, ngf=64, n_layers=3):
        super().__init__()
        model = [tnn.Conv2d(input_nc, ngf, 4, 2, 1), tnn.ReLU(True),
                 tnn.BatchNorm2d(ngf)]
        for i in range(n_layers):
            cin = 2 ** i * ngf if 2 ** i * ngf < 512 else 512
            cout = 2 ** (i + 1) * ngf if 2 ** i * ngf < 512 else 512
            model += [tnn.Conv2d(cin, cout, 4, 2, 1), tnn.ReLU(True),
                      tnn.BatchNorm2d(cout)]
        model += [tnn.Conv2d(512, 512, 3, 1, 1), tnn.ReLU(True),
                  tnn.BatchNorm2d(512),
                  tnn.Conv2d(512, 512, 3, 1, 1), tnn.ReLU(True)]
        self.model = tnn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class _TFeatureRegression(tnn.Module):
    def __init__(self, input_nc=192, output_dim=18):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(input_nc, 512, 4, 2, 1), tnn.BatchNorm2d(512),
            tnn.ReLU(True),
            tnn.Conv2d(512, 256, 4, 2, 1), tnn.BatchNorm2d(256),
            tnn.ReLU(True),
            tnn.Conv2d(256, 128, 3, padding=1), tnn.BatchNorm2d(128),
            tnn.ReLU(True),
            tnn.Conv2d(128, 64, 3, padding=1), tnn.BatchNorm2d(64),
            tnn.ReLU(True))
        self.linear = tnn.Linear(64 * 4 * 3, output_dim)

    def forward(self, x):
        x = self.conv(x)
        return torch.tanh(self.linear(x.reshape(x.size(0), -1)))


def _l2norm(f):
    return f / torch.pow(torch.sum(f ** 2, 1) + 1e-6, 0.5).unsqueeze(1)


def _tcorrelation(fa, fb):
    b, c, h, w = fa.size()
    fa = fa.transpose(2, 3).contiguous().view(b, c, h * w)
    fb = fb.view(b, c, h * w).transpose(1, 2)
    mul = torch.bmm(fb, fa)
    return mul.view(b, h, w, h * w).transpose(2, 3).transpose(1, 2)


class _TGMM(tnn.Module):
    def __init__(self, input_nc, grid_size=3):
        super().__init__()
        self.extractionA = _TFeatureExtraction(input_nc)
        self.extractionB = _TFeatureExtraction(3)
        self.regression = _TFeatureRegression(192, 2 * grid_size ** 2)

    def forward(self, a, b):
        fa = _l2norm(self.extractionA(a))
        fb = _l2norm(self.extractionB(b))
        return self.regression(_tcorrelation(fa, fb))


def _torch_tps_grid(theta, h, w, grid_size=3):
    """Direct TpsGridGen math (:198-290)."""
    n_pts = grid_size ** 2
    ax = np.linspace(-1, 1, grid_size)
    py, px = np.meshgrid(ax, ax)
    px, py = px.reshape(-1, 1), py.reshape(-1, 1)
    d2 = (px - px.T) ** 2 + (py - py.T) ** 2
    d2[d2 == 0] = 1
    k = d2 * np.log(d2)
    p = np.concatenate([np.ones((n_pts, 1)), px, py], 1)
    li = np.linalg.inv(np.block([[k, p], [p.T, np.zeros((3, 3))]]))
    qx = theta[:, :n_pts] + px.ravel()
    qy = theta[:, n_pts:] + py.ravel()
    wx = qx @ li[:n_pts, :n_pts].T
    wy = qy @ li[:n_pts, :n_pts].T
    a_x = qx @ li[n_pts:, :n_pts].T
    a_y = qy @ li[n_pts:, :n_pts].T
    gx, gy = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    d2g = (gx[..., None] - px.ravel()) ** 2 + \
        (gy[..., None] - py.ravel()) ** 2
    d2g[d2g == 0] = 1
    u = d2g * np.log(d2g)
    out = np.zeros((theta.shape[0], h, w, 2))
    for b in range(theta.shape[0]):
        out[b, :, :, 0] = a_x[b, 0] + a_x[b, 1] * gx + a_x[b, 2] * gy + \
            np.sum(u * wx[b], -1)
        out[b, :, :, 1] = a_y[b, 0] + a_y[b, 1] * gx + a_y[b, 2] * gy + \
            np.sum(u * wy[b], -1)
    return out


def test_feature_correlation_matches_torch():
    rng = np.random.default_rng(0)
    fa = rng.standard_normal((2, 4, 3, 5)).astype(np.float32)
    fb = rng.standard_normal((2, 4, 3, 5)).astype(np.float32)
    ours = feature_correlation(jnp.asarray(fa), jnp.asarray(fb))
    theirs = _tcorrelation(
        torch.tensor(fa).permute(0, 3, 1, 2),
        torch.tensor(fb).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=1e-5)


def test_tps_grid_matches_reference_math():
    rng = np.random.default_rng(1)
    theta = (rng.uniform(-1, 1, (2, 18)) * 0.3).astype(np.float32)
    ours = tps_grid(jnp.asarray(theta), (8, 6))
    ref = _torch_tps_grid(theta, 8, 6)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_affine_grid_matches_torch():
    theta = np.array([[[1.1, 0.1, -0.2], [0.0, 0.9, 0.3]]],
                     dtype=np.float32)
    ours = affine_grid(jnp.asarray(theta), (6, 5))
    theirs = F.affine_grid(torch.tensor(theta), (1, 3, 6, 5),
                           align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=1e-6)


@pytest.mark.slow
def test_gmm_parity():
    torch.manual_seed(0)
    tmodel = _TGMM(input_nc=1).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = load_gmm_params(sd)
    model = GMM(input_nc=1)

    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 256, 192, 1)).astype(np.float32)
    b = rng.standard_normal((1, 256, 192, 3)).astype(np.float32)
    with torch.no_grad():
        t_theta = tmodel(torch.tensor(a).permute(0, 3, 1, 2),
                         torch.tensor(b).permute(0, 3, 1, 2))
    grid, theta = model.apply(variables, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(theta), t_theta.numpy(),
                               atol=2e-4)
    ref_grid = _torch_tps_grid(t_theta.numpy(), 256, 192)
    np.testing.assert_allclose(np.asarray(grid), ref_grid, atol=2e-3)
    assert grid.shape == (1, 256, 192, 2)
