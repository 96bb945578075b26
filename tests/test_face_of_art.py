"""Face-of-Art artistic landmark detector: heatmap-net parity vs a torch
replica of `face_of_art/deep_heatmaps_model_fusion_net.py:233-330`, PDM
correction behavior, evidence weighting."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from animateportrait_tpu.models.face_of_art import (
    PART_INDS, ArtisticHeatmapNet, bilinear_upsample_kernel,
    calculate_evidence, feature_based_pdm_correct,
    get_patches_around_landmarks, heatmaps_to_landmarks_yx, load_foa_params,
    pdm_correct, predict_artistic_landmarks, train_pdm)


class _TFoa(tnn.Module):
    """torch replica with TF-SAME paddings (all kernels odd, stride 1)."""

    def __init__(self, nl=4):
        super().__init__()

        def c(cin, cout, k, d=1):
            return tnn.Conv2d(cin, cout, k, padding=d * (k // 2),
                              dilation=d)

        self.conv_1 = c(3, 128, 5)
        self.conv_2 = c(128, 128, 5)
        self.conv_3 = c(128, 128, 5)
        for d in (1, 2, 3, 4):
            setattr(self, f"conv_4_{d}", c(128, 128, 3, d))
            setattr(self, f"conv_5_{d}", c(512, 256, 3, d))
        self.conv_6 = c(1024, 512, 1)
        self.conv_7 = c(512, 256, 1)
        self.conv_8 = c(256, nl, 1)
        for d in (1, 2, 3):
            setattr(self, f"conv_fsn_1_{d}", c(384, 64, 3, d))
        self.conv_fsn_2_1 = c(192, 64, 3, 1)
        self.conv_fsn_2_2 = c(192, 64, 3, 2)
        self.conv_fsn_2_3 = c(192, 64, 3, 4)
        self.conv_fsn_2_4 = c(192, 64, 5, 3)
        self.conv_fsn_3_1 = c(256, 128, 3, 1)
        self.conv_fsn_3_2 = c(256, 128, 3, 2)
        self.conv_fsn_3_3 = c(256, 128, 3, 4)
        self.conv_fsn_3_4 = c(256, 128, 5, 3)
        self.conv_fsn_4 = c(512, 256, 1)
        self.conv_fsn_5 = c(256, nl, 1)
        self.deconv_1 = tnn.ConvTranspose2d(nl, nl, 8, 4, padding=2)

    def forward(self, x):
        pool = lambda v: F.max_pool2d(v, 2, 2)  # noqa: E731
        l1 = pool(F.relu(self.conv_1(x)))
        l2 = pool(F.relu(self.conv_2(l1)))
        l3 = F.relu(self.conv_3(l2))
        l4 = torch.cat([F.relu(getattr(self, f"conv_4_{d}")(l3))
                        for d in (1, 2, 3, 4)], 1)
        l5 = torch.cat([F.relu(getattr(self, f"conv_5_{d}")(l4))
                        for d in (1, 2, 3, 4)], 1)
        l7 = F.relu(self.conv_7(F.relu(self.conv_6(l5))))
        primary = self.conv_8(l7)
        f0 = torch.cat([l3, l7], 1)
        f1 = torch.cat([F.relu(getattr(self, f"conv_fsn_1_{d}")(f0))
                        for d in (1, 2, 3)], 1)
        f2 = torch.cat([F.relu(getattr(self, f"conv_fsn_2_{i}")(f1))
                        for i in (1, 2, 3, 4)], 1)
        f3 = torch.cat([F.relu(getattr(self, f"conv_fsn_3_{i}")(f2))
                        for i in (1, 2, 3, 4)], 1)
        fusion = self.conv_fsn_5(F.relu(self.conv_fsn_4(f3)))
        return primary, fusion, self.deconv_1(fusion)


def test_heatmap_net_parity():
    nl = 4
    torch.manual_seed(0)
    tmodel = _TFoa(nl).eval()
    # build the TF-style var dict the converter expects
    var_dict = {}
    for name, mod in tmodel.named_modules():
        if isinstance(mod, tnn.Conv2d):
            var_dict[f"heatmaps_network/{name}/conv/kernel"] = \
                mod.weight.detach().numpy().transpose(2, 3, 1, 0)
            var_dict[f"heatmaps_network/{name}/conv/bias"] = \
                mod.bias.detach().numpy()
        elif isinstance(mod, tnn.ConvTranspose2d):
            # torch (in, out, h, w) -> TF (h, w, out, in)
            var_dict[f"heatmaps_network/{name}/deconv/kernel"] = \
                mod.weight.detach().numpy().transpose(2, 3, 1, 0)
            var_dict[f"heatmaps_network/{name}/deconv/bias"] = \
                mod.bias.detach().numpy()
    variables = load_foa_params(var_dict)
    model = ArtisticHeatmapNet(num_landmarks=nl)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tp, tf_, tu = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    jp, jf, ju = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jp),
                               tp.permute(0, 2, 3, 1).numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(jf),
                               tf_.permute(0, 2, 3, 1).numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(ju),
                               tu.permute(0, 2, 3, 1).numpy(), atol=3e-4)


def test_bilinear_deconv_init_interpolates():
    model = ArtisticHeatmapNet(num_landmarks=2)
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    _, fusion, up = model.apply(variables, x)
    assert fusion.shape == (1, 8, 8, 2) and up.shape == (1, 32, 32, 2)
    # a constant fusion map upsampled by the bilinear-init deconv stays
    # constant in the interior (SAME border taper aside)
    k = bilinear_upsample_kernel(8, 1)[:, :, 0, 0]
    np.testing.assert_allclose(k[3:5, 3:5], (1.0 - 1.0 / 8) ** 2,
                               atol=1e-6)
    # rows sum to the stride (partition of unity across phases)
    np.testing.assert_allclose(k.sum(), 16.0, atol=1e-5)


def test_heatmaps_to_landmarks_yx():
    hm = np.zeros((1, 16, 16, 2), np.float32)
    hm[0, 5, 9, 0] = 1.0
    hm[0, 12, 3, 1] = 1.0
    pts = np.asarray(heatmaps_to_landmarks_yx(jnp.asarray(hm)))[0]
    np.testing.assert_array_equal(pts, [[5, 9], [12, 3]])


def _ellipse_shapes(n=40, pts=10, seed=0):
    rng = np.random.default_rng(seed)
    shapes = []
    ang = np.linspace(0, 2 * np.pi, pts, endpoint=False)
    for _ in range(n):
        a, b = rng.uniform(0.8, 1.2, 2)
        th = rng.uniform(-0.4, 0.4)
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
        s = np.stack([a * np.cos(ang), b * np.sin(ang)], 1) @ rot.T
        shapes.append(s * rng.uniform(20, 40) + rng.uniform(50, 200, 2))
    return np.stack(shapes)


def test_pdm_correct_pulls_outlier_back():
    shapes = _ellipse_shapes()
    pdm = train_pdm(shapes, n_components=3)
    clean = shapes[0]
    noisy = clean.copy()
    noisy[3] += 25.0  # one gross outlier
    corrected = pdm_correct(noisy, pdm)
    assert np.linalg.norm(corrected[3] - clean[3]) < \
        0.5 * np.linalg.norm(noisy[3] - clean[3])
    # a clean in-family shape passes through nearly unchanged
    passthru = pdm_correct(clean, pdm)
    assert np.mean(np.linalg.norm(passthru - clean, axis=1)) < 1.5


def test_calculate_evidence_prefers_peaked_patches():
    patches = np.zeros((2, 1, 30, 30))
    patches[0, 0, 15, 15] = 50.0           # sharp, confident
    patches[1, 0] = 50.0 / 900.0           # flat, diffuse
    ev = calculate_evidence(patches, rate=0.5, offset=10.0)
    assert ev[0] > 0.9 and ev[1] > 0.9      # y-evidence
    assert ev[0] > ev[2] or ev[1] > ev[3]


def test_feature_based_correction_and_predict():
    rng = np.random.default_rng(2)
    # per-part PDMs trained on jittered versions of one base face
    base = rng.uniform(40, 216, (68, 2))
    shapes = base[None] + rng.normal(0, 2.0, (30, 68, 2))
    pdms = {part: train_pdm(shapes[:, inds], 3)
            for part, inds in PART_INDS.items()}
    noisy = shapes[0].copy()
    noisy[30] += 20.0
    corrected = feature_based_pdm_correct(noisy, pdms)
    assert np.linalg.norm(corrected[30] - shapes[0][30]) < 20.0
    # weighted variant with synthetic heatmaps runs and returns 68 pts
    hm = np.zeros((64, 64, 68))
    corrected2 = feature_based_pdm_correct(noisy * 0.25, pdms,
                                           heatmaps=hm)
    assert corrected2.shape == (68, 2)

    model = ArtisticHeatmapNet(num_landmarks=68)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), img[None])
    out = predict_artistic_landmarks(img, variables, model=model)
    assert out.shape == (68, 2)
