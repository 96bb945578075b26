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


# ---- validation against the reference's SHIPPED PDM/CLM model files ----

REF_PDM_DIR = ("/root/reference/Module1/thirdparty/face_of_art/"
               "pdm_clm_models/pdm_models")
REF_CLM_DIR = ("/root/reference/Module1/thirdparty/face_of_art/"
               "pdm_clm_models/clm_models")

import os
import pytest

needs_ref_models = pytest.mark.skipif(
    not os.path.isdir(REF_PDM_DIR), reason="reference mount absent")


@needs_ref_models
def test_shipped_pdm_loader_and_set_target_parity():
    """Every shipped per-part PDM loads, its joint basis is orthonormal,
    and our set_target math reproduces the pickle's own stored fitting
    state (target produced by the REAL menpofit library)."""
    from animateportrait_tpu.io.menpo_pickle import (
        load_reference_part_pdms)
    from animateportrait_tpu.models.face_of_art import (
        pdm_correct_reference)

    rpdms = load_reference_part_pdms(REF_PDM_DIR, "basic")
    assert set(rpdms) == set(PART_INDS)
    for part, inds in PART_INDS.items():
        r = rpdms[part]
        assert r.n_points == len(inds), part
        # joint [similarity; shape] basis is orthonormal
        g = r.basis @ r.basis.T
        assert np.abs(g - np.eye(g.shape[0])).max() < 1e-10, part
        # stored state consistency: mean + basis^T [sim_w; w] == target
        b = np.concatenate([r.stored_sim_weights, r.stored_weights])
        rec = (r.mean + r.basis.T @ b).reshape(-1, 2)
        assert np.abs(rec - r.stored_target).max() < 1e-9, part
        # our set_target on the stored target is a fixed point (the
        # stored target lies in the model subspace)
        out = pdm_correct_reference(r.stored_target, r)
        assert np.abs(out - r.stored_target).max() < 1e-9, part
        # and on a similarity transform of the mean shape it recovers
        # that transform exactly (linearized-similarity basis property)
        th, s = 0.3, 1.7
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
        tgt = s * r.mean.reshape(-1, 2) @ rot.T + np.array([5.0, -3.0])
        out = pdm_correct_reference(tgt, r)
        assert np.abs(out - tgt).max() < 1e-9, part


@needs_ref_models
def test_shipped_pdm_part_based_correction():
    """feature_based_pdm_corr on the shipped models: an outlier landmark
    is pulled toward the per-part shape manifold; an in-model shape
    passes through unchanged."""
    from animateportrait_tpu.io.menpo_pickle import (
        load_reference_part_pdms)
    from animateportrait_tpu.models.face_of_art import (
        feature_based_pdm_correct_reference)

    rpdms = load_reference_part_pdms(REF_PDM_DIR, "basic")
    # build a whole-face shape from the part models' own stored targets.
    # Stored targets are centered model-frame coordinates (jaw spans
    # ~±220); a common scale+shift keeps each part in its model subspace
    # (scale/translation lie in the linearized-similarity basis) while
    # landing in 256-image coordinates for the heatmap path.
    face = np.zeros((68, 2))
    for part, inds in PART_INDS.items():
        face[inds] = rpdms[part].stored_target * 0.4 + 128.0
    out = feature_based_pdm_correct_reference(face, rpdms)
    assert np.abs(out - face).max() < 1e-9  # in-model: fixed point

    noisy = face.copy()
    noisy[48] += 37.0  # gross mouth outlier
    out = feature_based_pdm_correct_reference(noisy, rpdms)
    assert (np.linalg.norm(out[48] - face[48])
            < 0.7 * np.linalg.norm(noisy[48] - face[48]))
    # untouched parts stay put
    assert np.abs(out[PART_INDS["jaw"]] - face[PART_INDS["jaw"]]).max() \
        < 1e-9

    # weighted path on synthetic heatmaps peaked at the TRUE positions
    hm = np.zeros((256, 256, 68), np.float32)
    for i, (y, x) in enumerate(np.clip(face, 2, 253).astype(int)):
        hm[y - 2:y + 3, x - 2:x + 3, i] = 10.0
    out_w = feature_based_pdm_correct_reference(noisy, rpdms,
                                                heatmaps=hm)
    assert np.linalg.norm(out_w[48] - face[48]) < \
        np.linalg.norm(noisy[48] - face[48])


@needs_ref_models
def test_shipped_clm_model_and_tuning():
    """clm_models/basic_all loads (68 pts, 30 active PCs like the
    reference fitter), set_target math holds on its stored state, and
    the ECT-style tuning loop pulls landmarks toward response peaks
    while staying on the shape manifold."""
    from animateportrait_tpu.io.menpo_pickle import load_reference_clm
    from animateportrait_tpu.models.face_of_art import (
        clm_correct_reference, pdm_correct_reference)

    clm_pdm, opt = load_reference_clm(
        os.path.join(REF_CLM_DIR, "basic_all"), n_shape=30)
    assert clm_pdm.n_points == 68 and clm_pdm.n_shape == 30
    assert opt["numIter"] == 5 and opt["rho2"] == 20
    g = clm_pdm.basis @ clm_pdm.basis.T
    assert np.abs(g - np.eye(34)).max() < 1e-10

    face = pdm_correct_reference(clm_pdm.stored_target, clm_pdm)
    # stored target of the full model is in the 132-PC space, not
    # necessarily the 30-PC one; project first, then fixed-point check
    again = pdm_correct_reference(face, clm_pdm)
    assert np.abs(again - face).max() < 1e-9

    # shift the face; heatmaps peak at the true positions; tuning must
    # recover most of the offset
    rng = np.random.default_rng(0)
    face256 = (face - face.mean(0)) * (80.0 / np.abs(
        face - face.mean(0)).max()) + 128.0
    face256 = pdm_correct_reference(face256, clm_pdm)
    hm = np.zeros((256, 256, 68), np.float32)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    for i, (y, x) in enumerate(face256):
        hm[:, :, i] = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 18.0)
    init = face256 + rng.normal(0, 4.0, face256.shape)
    init = pdm_correct_reference(init, clm_pdm)
    out = clm_correct_reference(hm, init, clm_pdm, opt)
    err_in = np.linalg.norm(init - face256, axis=1).mean()
    err_out = np.linalg.norm(out - face256, axis=1).mean()
    assert err_out < 0.6 * err_in, (err_in, err_out)


def test_clm_meanshift_unbiased_at_peaks():
    """Landmarks initialized exactly at the heatmap peaks must stay
    there: the mean-shift labels patch cells with the SAME image
    coordinates get_patches_around_landmarks cut them at (the ECT '+1'
    offset, pdm_clm_functions.py:76-77) — an off-by-one there drags
    every iteration ~1 px up-left, which five iterations compound."""
    import os

    from animateportrait_tpu.io.menpo_pickle import load_reference_clm
    from animateportrait_tpu.models.face_of_art import (
        clm_correct_reference, pdm_correct_reference)

    ref_dir = ("/root/reference/Module1/thirdparty/face_of_art/"
               "pdm_clm_models/clm_models")
    if not os.path.isdir(ref_dir):  # pragma: no cover
        import pytest

        pytest.skip("reference CLM models not mounted")
    clm_pdm, opt = load_reference_clm(
        os.path.join(ref_dir, "basic_all"), n_shape=30)
    face = pdm_correct_reference(clm_pdm.stored_target, clm_pdm)
    face256 = (face - face.mean(0)) * (80.0 / np.abs(
        face - face.mean(0)).max()) + 128.0
    face256 = pdm_correct_reference(face256, clm_pdm)
    hm = np.zeros((256, 256, 68), np.float32)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    for i, (y, x) in enumerate(face256):
        hm[:, :, i] = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 18.0)
    out = clm_correct_reference(hm, face256, clm_pdm, opt)
    drift = np.linalg.norm(out - face256, axis=1).mean()
    assert drift < 0.35, drift
