"""Artistic-portrait landmark detector ("Face of Art") — TPU-native.

Behavioral reimplementation of `Module1/thirdparty/face_of_art/` (TF1 in
the reference), the landmark source used to build artistic-drawing
training data. Three stages, as in `predict_landmarks.py:1-70`:

1. **Estimation** — `ArtisticHeatmapNet` reproduces the multi-scale
   fusion heatmap CNN `DeepHeatmapsModel.heatmaps_network`
   (`deep_heatmaps_model_fusion_net.py:233-330`): two conv-relu-pool 5x5
   stems, dilated conv banks (rates 1-4), 1x1 bottlenecks, a primary
   68-map head at 1/4 resolution, a fusion branch over concat(l3, l7)
   with its own dilated banks, and an 8x8 stride-4 transposed conv with
   bilinear initialization back to input resolution (`ops.py:44-85`).
2. **Correction** — part-based PDM (point distribution model): per-part
   Procrustes-aligned PCA shape models with the reference's component
   counts (jaw 7, nose 5, eyes 3, brows 2, mouth 7;
   `pdm_clm_functions.py:124-170`), applied by similarity-aligned
   projection (menpo OrthoPDM.set_target equivalent).
3. **Tuning** — ECT-style weighted-PDM refinement from heatmap patch
   responses (`calculate_evidence` / `get_patches_around_landmarks` /
   `weighted_pdm_transform`, `pdm_clm_functions.py:22-121`), the core
   update of the menpofit GradientDescentCLMFitter used in the reference
   (`clm_correct`, :172-203).

Landmarks follow menpo's (y, x) convention throughout this module, as in
the reference; `predict_artistic_landmarks` returns (x, y) for the rest
of this framework.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

N_LANDMARKS = 68

PART_INDS = {
    "jaw": np.arange(0, 17),
    "l_brow": np.arange(17, 22),
    "r_brow": np.arange(22, 27),
    "nose": np.arange(27, 36),
    "l_eye": np.arange(36, 42),
    "r_eye": np.arange(42, 48),
    "mouth": np.arange(48, 68),
}
# selected PC counts (pdm_clm_functions.py:139-146)
PART_PCS = {"jaw": 7, "nose": 5, "l_eye": 3, "r_eye": 3, "l_brow": 2,
            "r_brow": 2, "mouth": 7}


def _max_pool_same(x):
    """tf.layers.max_pooling2d(pool 2, stride 2, padding 'same')."""
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "SAME")


class _ConvRelu(nn.Module):
    features: int
    kernel: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Conv(
            self.features, (self.kernel, self.kernel),
            kernel_dilation=self.dilation, padding="SAME",
            name="conv")(x))


def bilinear_upsample_kernel(kernel: int, channels: int) -> np.ndarray:
    """deconv2d_bilinear_upsampling_initializer (ops.py:55-85): per-channel
    bilinear kernel, HWIO with I=O=channels (diagonal)."""
    factor = (kernel + 1) // 2
    center = factor - 1.0 if kernel % 2 == 1 else factor - 0.5
    og = np.ogrid[:kernel, :kernel]
    filt = (1 - abs(og[0] - center) / factor) * \
        (1 - abs(og[1] - center) / factor)
    w = np.zeros((kernel, kernel, channels, channels), np.float32)
    for c in range(channels):
        w[:, :, c, c] = filt
    return w


class _BilinearDeconv(nn.Module):
    """8x8 stride-4 SAME transposed conv, bilinear-initialized
    (the reference's upsample_net, :307-312)."""

    features: int
    kernel: int = 8
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        # kernel kept in TF conv2d_transpose layout (h, w, out, in);
        # transpose_kernel=True gives TF/keras gradient-of-conv semantics
        w = self.param(
            "kernel",
            lambda _rng, shape: jnp.asarray(
                bilinear_upsample_kernel(self.kernel, self.features)),
            (self.kernel, self.kernel, self.features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_transpose(
            x, w, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return y + b


class ArtisticHeatmapNet(nn.Module):
    """heatmaps_network (deep_heatmaps_model_fusion_net.py:233-330).

    __call__(images (N, 256, 256, 3)) ->
        (primary (N,64,64,68), fusion (N,64,64,68), upsampled
        (N,256,256,68)).
    """

    num_landmarks: int = N_LANDMARKS

    @nn.compact
    def __call__(self, x):
        l1 = _max_pool_same(_ConvRelu(128, 5, name="conv_1")(x))
        l2 = _max_pool_same(_ConvRelu(128, 5, name="conv_2")(l1))
        l3 = _ConvRelu(128, 5, name="conv_3")(l2)
        l4 = jnp.concatenate(
            [_ConvRelu(128, 3, dilation=d, name=f"conv_4_{d}")(l3)
             for d in (1, 2, 3, 4)], axis=-1)
        l5 = jnp.concatenate(
            [_ConvRelu(256, 3, dilation=d, name=f"conv_5_{d}")(l4)
             for d in (1, 2, 3, 4)], axis=-1)
        l6 = _ConvRelu(512, 1, name="conv_6")(l5)
        l7 = _ConvRelu(256, 1, name="conv_7")(l6)
        primary = nn.Conv(self.num_landmarks, (1, 1),
                          name="conv_8")(l7)

        f0 = jnp.concatenate([l3, l7], axis=-1)
        f1 = jnp.concatenate(
            [_ConvRelu(64, 3, dilation=d, name=f"conv_fsn_1_{d}")(f0)
             for d in (1, 2, 3)], axis=-1)
        f2 = jnp.concatenate(
            [_ConvRelu(64, 3, dilation=1, name="conv_fsn_2_1")(f1),
             _ConvRelu(64, 3, dilation=2, name="conv_fsn_2_2")(f1),
             _ConvRelu(64, 3, dilation=4, name="conv_fsn_2_3")(f1),
             _ConvRelu(64, 5, dilation=3, name="conv_fsn_2_4")(f1)],
            axis=-1)
        f3 = jnp.concatenate(
            [_ConvRelu(128, 3, dilation=1, name="conv_fsn_3_1")(f2),
             _ConvRelu(128, 3, dilation=2, name="conv_fsn_3_2")(f2),
             _ConvRelu(128, 3, dilation=4, name="conv_fsn_3_3")(f2),
             _ConvRelu(128, 5, dilation=3, name="conv_fsn_3_4")(f2)],
            axis=-1)
        f4 = _ConvRelu(256, 1, name="conv_fsn_4")(f3)
        fusion = nn.Conv(self.num_landmarks, (1, 1),
                         name="conv_fsn_5")(f4)
        up = _BilinearDeconv(self.num_landmarks, name="deconv_1")(fusion)
        return primary, fusion, up


def heatmaps_to_landmarks_yx(hm: jax.Array) -> jax.Array:
    """argmax decode, menpo (y, x) convention: (N,H,W,C) -> (N,C,2)."""
    n, h, w, c = hm.shape
    flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(n, c, h * w)
    idx = jnp.argmax(flat, axis=2)
    return jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.float32)


def load_foa_params(var_dict: dict) -> dict:
    """TF 'heatmaps_network/<scope>/conv/kernel' arrays -> flax variables.

    TF conv kernels are already HWIO; deconv kernels are HWOI and get
    their last two axes swapped.
    """
    p = {}
    for scope in (["conv_1", "conv_2", "conv_3", "conv_6", "conv_7",
                   "conv_8", "conv_fsn_4", "conv_fsn_5"]
                  + [f"conv_4_{d}" for d in (1, 2, 3, 4)]
                  + [f"conv_5_{d}" for d in (1, 2, 3, 4)]
                  + [f"conv_fsn_1_{d}" for d in (1, 2, 3)]
                  + [f"conv_fsn_2_{d}" for d in (1, 2, 3, 4)]
                  + [f"conv_fsn_3_{d}" for d in (1, 2, 3, 4)]):
        k = np.asarray(var_dict[f"heatmaps_network/{scope}/conv/kernel"])
        b = np.asarray(var_dict[f"heatmaps_network/{scope}/conv/bias"])
        node = {"kernel": k, "bias": b}
        p[scope] = node if scope.startswith("conv_8") or \
            scope == "conv_fsn_5" else {"conv": node}
    # TF conv2d_transpose kernels are (h, w, out, in) — kept verbatim
    p["deconv_1"] = {
        "kernel": np.asarray(
            var_dict["heatmaps_network/deconv_1/deconv/kernel"]),
        "bias": np.asarray(
            var_dict["heatmaps_network/deconv_1/deconv/bias"])}
    return {"params": p}


# ---------------------------------------------------------------------------
# PDM correction stage (host-side numpy, like the reference's menpo use)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PDM:
    """Point distribution model: Procrustes-aligned PCA shape space."""

    mean: np.ndarray          # (P, 2), centered reference frame
    components: np.ndarray    # (n_pc, 2P) orthonormal rows
    eigenvalues: np.ndarray   # (n_pc,)


def _similarity(src: np.ndarray, dst: np.ndarray
                ) -> tuple[float, np.ndarray, np.ndarray]:
    """Least-squares similarity (s, R, t) with s*R@src + t ~= dst."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    diag = np.diag([1.0, d])
    r = u @ diag @ vt
    var = (sc ** 2).sum() / len(src)
    scale = np.trace(np.diag(s) @ diag) / var
    t = mu_d - scale * r @ mu_s
    return float(scale), r, t


def train_pdm(shapes: np.ndarray, n_components: int) -> PDM:
    """Generalized Procrustes alignment + PCA over (M, P, 2) shapes."""
    shapes = np.asarray(shapes, np.float64)
    aligned = shapes - shapes.mean(axis=1, keepdims=True)
    mean = aligned[0]
    for _ in range(5):
        out = []
        for s in aligned:
            sc, r, t = _similarity(s, mean)
            out.append(sc * s @ r.T + t)
        aligned = np.stack(out)
        mean = aligned.mean(0)
        mean -= mean.mean(0)
        mean /= np.linalg.norm(mean)
    flat = (aligned - mean).reshape(len(shapes), -1)
    _, svals, vt = np.linalg.svd(flat, full_matrices=False)
    n_components = min(n_components, vt.shape[0])
    return PDM(mean=mean,
               components=vt[:n_components],
               eigenvalues=(svals[:n_components] ** 2) / len(shapes))


def pdm_correct(init_shape: np.ndarray, pdm: PDM,
                weights: np.ndarray | None = None,
                rho: float = 20.0) -> np.ndarray:
    """OrthoPDM.set_target equivalent (pdm_clm_functions.py:83-121).

    Similarity-aligns the model frame onto ``init_shape`` (y, x), projects
    the residual onto the shape basis — plainly, or with per-coordinate
    evidence ``weights`` and the reference's rho/eigenvalue Tikhonov prior
    (weighted_pdm_transform :92-110) — and reconstructs.
    """
    scale, r, t = _similarity(pdm.mean, init_shape)
    inv = (init_shape - t) @ r / scale
    resid = (inv - pdm.mean).ravel()
    if weights is None:
        b = pdm.components @ resid
    else:
        j = pdm.components.T  # (2P, n_pc)
        jwj = j.T @ (weights[:, None] * j)
        prior = np.diag(rho / np.maximum(pdm.eigenvalues, 1e-12))
        b = np.linalg.solve(jwj + prior, j.T @ (weights * resid))
    recon = pdm.mean + (pdm.components.T @ b).reshape(-1, 2)
    return scale * recon @ r.T + t


def calculate_evidence(patches: np.ndarray, rate: float = 0.25,
                       offset: float = 20.0) -> np.ndarray:
    """pdm_clm_functions.py:22-61: per-(y,x)-coordinate confidence of
    each landmark's heatmap patch. patches: (P, 1, h, w) -> (2P,)."""
    n_points, _, hh, ww = patches.shape
    out = np.zeros(2 * n_points)
    for i in range(n_points):
        resp = np.maximum(patches[i, 0], 0.0)
        yw = resp.sum(axis=1)
        xw = resp.sum(axis=0)
        yc = np.arange(hh)
        xc = np.arange(ww)
        tot = resp.sum()
        if tot <= 0:
            var_y = var_x = np.finfo(float).eps
        else:
            my = np.average(yc, weights=yw)
            mx = np.average(xc, weights=xw)
            var_y = max(np.average((yc - my) ** 2, weights=yw),
                        np.finfo(float).eps)
            var_x = max(np.average((xc - mx) ** 2, weights=xw),
                        np.finfo(float).eps)
        w_y = tot / np.sqrt(var_y)
        w_x = tot / np.sqrt(var_x)
        out[2 * i] = 1.0 / (1.0 + np.exp(-rate * (w_y - offset)))
        out[2 * i + 1] = 1.0 / (1.0 + np.exp(-rate * (w_x - offset)))
    return out


def get_patches_around_landmarks(heatmaps: np.ndarray,
                                 points_yx: np.ndarray,
                                 patch_size: int = 30,
                                 image_shape: int = 256) -> np.ndarray:
    """pdm_clm_functions.py:64-81: (H, W, P) maps + (P, 2) points ->
    (P, 1, patch, patch) zero-padded response patches."""
    pad = image_shape // 2
    p = points_yx.shape[0]
    padded = np.zeros((2 * image_shape, 2 * image_shape, p))
    padded[pad:pad + image_shape, pad:pad + image_shape, :] = heatmaps
    r_off = patch_size // 2
    l_off = patch_size - r_off
    patches = []
    for i in range(p):
        y = int(np.around(points_yx[i, 0] + 1 + pad))
        x = int(np.around(points_yx[i, 1] + 1 + pad))
        patches.append(padded[y - r_off:y + l_off,
                              x - r_off:x + l_off, i])
    return np.asarray(patches)[:, None]


def feature_based_pdm_correct(lms_init_yx: np.ndarray,
                              pdms: dict[str, PDM],
                              heatmaps: np.ndarray | None = None
                              ) -> np.ndarray:
    """Part-based correction (pdm_clm_functions.py:124-170): each facial
    part is corrected by its own PDM; with ``heatmaps`` the projection is
    evidence-weighted (the tuning stage's update)."""
    new = np.array(lms_init_yx, np.float64)
    patches = None
    if heatmaps is not None:
        patches = get_patches_around_landmarks(
            heatmaps, lms_init_yx, image_shape=heatmaps.shape[0])
        evidence = calculate_evidence(patches, rate=0.5, offset=10.0)
    for part, inds in PART_INDS.items():
        pdm = pdms.get(part)
        if pdm is None:
            continue
        w = None
        if heatmaps is not None:
            w = np.stack([evidence[2 * inds], evidence[2 * inds + 1]],
                         axis=1).ravel()
        new[inds] = pdm_correct(lms_init_yx[inds], pdm, weights=w)
    return new


def pdm_correct_reference(init_shape_yx: np.ndarray, rpdm) -> np.ndarray:
    """Exact menpofit ``OrthoPDM.set_target`` on a shipped model
    (``pdm_correct``, pdm_clm_functions.py:83-88).

    menpo linearizes the global similarity as 4 extra basis rows
    (scale/rotation/translation of a fixed shape is linear in 4 params)
    and keeps the joint [similarity; shape] basis orthonormal, so
    set_target is a one-shot projection — verified to reproduce the
    stored fitting state in the shipped pickles to ~1e-14.
    """
    x = np.asarray(init_shape_yx, np.float64).ravel()
    b = rpdm.basis @ (x - rpdm.mean)
    return (rpdm.mean + rpdm.basis.T @ b).reshape(-1, 2)


def weighted_pdm_correct_reference(init_shape_yx: np.ndarray, rpdm,
                                   weights: np.ndarray,
                                   rho: float = 20.0) -> np.ndarray:
    """Exact ``weighted_pdm_transform`` (pdm_clm_functions.py:91-110) on
    a shipped model: Tikhonov-regularized weighted projection with zero
    prior on the 4 similarity parameters and rho/eigenvalue on the shape
    parameters, solved jointly."""
    x = np.asarray(init_shape_yx, np.float64).ravel()
    w = np.asarray(weights, np.float64)
    j = rpdm.basis.T                              # (2P, 4 + n_pc)
    prior = np.concatenate([np.zeros(rpdm.n_sim),
                            rho / np.maximum(rpdm.eigenvalues, 1e-300)])
    resid = x - rpdm.mean
    jwj = j.T @ (w[:, None] * j)
    p = np.linalg.solve(jwj + np.diag(prior), j.T @ (w * resid))
    return (rpdm.mean + j @ p).reshape(-1, 2)


def feature_based_pdm_correct_reference(lms_init_yx: np.ndarray,
                                        rpdms: dict,
                                        heatmaps: np.ndarray | None = None
                                        ) -> np.ndarray:
    """``feature_based_pdm_corr`` (pdm_clm_functions.py:124-170) on the
    shipped per-part models: plain set_target per part, or the
    evidence-weighted transform when ``heatmaps`` are given (the w_pdm
    path, rate=0.5/offset=10 as at :92)."""
    lms_init_yx = np.asarray(lms_init_yx, np.float64)
    new = lms_init_yx.copy()
    evidence = None
    if heatmaps is not None:
        patches = get_patches_around_landmarks(
            heatmaps, lms_init_yx, image_shape=heatmaps.shape[0])
        evidence = calculate_evidence(patches, rate=0.5, offset=10.0)
    for part, inds in PART_INDS.items():
        rpdm = rpdms.get(part)
        if rpdm is None:
            continue
        if evidence is None:
            new[inds] = pdm_correct_reference(lms_init_yx[inds], rpdm)
        else:
            w = np.stack([evidence[2 * inds], evidence[2 * inds + 1]],
                         axis=1).ravel()
            new[inds] = weighted_pdm_correct_reference(
                lms_init_yx[inds], rpdm, w)
    return new


def clm_correct_reference(heatmaps: np.ndarray, lms_init_yx: np.ndarray,
                          clm_pdm, opt: dict | None = None) -> np.ndarray:
    """ECT-style CLM tuning on the shipped ``clm_models`` shape model
    (``clm_correct``, pdm_clm_functions.py:172-203).

    The reference delegates to the ECT fork's
    ``GradientDescentCLMFitter.fit_from_shape`` with the response maps
    attached as ``image.rspmap_data``; the fork itself is not shipped, so
    this implements its documented regularized-mean-shift loop (Zhang et
    al., ECT) with the pickle's own option values: ``numIter`` rounds of
    (1) Gaussian-kernel mean-shift of each landmark over its response
    patch (``kernel_covariance``), (2) evidence weighting
    (``sigRate``/``sigOffset`` via calculate_evidence), (3) the same
    joint weighted Tikhonov PDM solve as weighted_pdm_transform with
    ``rho2`` — all on the shipped 30-PC shape model.
    """
    opt = dict(opt or {})
    n_iter = int(opt.get("numIter", 5))
    kcov = float(opt.get("kernel_covariance", 10))
    rate = float(opt.get("sigRate", 0.25))
    offset = float(opt.get("sigOffset", 25))
    rho2 = float(opt.get("rho2", 20))
    patch = 30
    cur = np.asarray(lms_init_yx, np.float64).copy()
    img = heatmaps.shape[0]
    for _ in range(n_iter):
        patches = get_patches_around_landmarks(
            heatmaps, cur, patch_size=patch, image_shape=img)
        evidence = calculate_evidence(patches, rate=rate, offset=offset)
        # Gaussian-kernel mean shift over each landmark's patch
        r_off = patch // 2
        grid = np.arange(patch, dtype=np.float64)
        targets = np.empty_like(cur)
        for i in range(cur.shape[0]):
            resp = np.maximum(patches[i, 0], 0.0)
            # get_patches_around_landmarks cuts the patch centered at
            # round(pt + 1) (the ECT "+1", pdm_clm_functions.py:76-77),
            # so patch row r sits at image row round(cur) + 1 + r - r_off
            ys = np.around(cur[i, 0]) + 1 + grid - r_off
            xs = np.around(cur[i, 1]) + 1 + grid - r_off
            ky = np.exp(-0.5 * (ys - cur[i, 0]) ** 2 / kcov)
            kx = np.exp(-0.5 * (xs - cur[i, 1]) ** 2 / kcov)
            kern = resp * ky[:, None] * kx[None, :]
            tot = kern.sum()
            if tot <= 1e-12:
                targets[i] = cur[i]
                continue
            targets[i, 0] = (kern.sum(1) @ ys) / tot
            targets[i, 1] = (kern.sum(0) @ xs) / tot
        cur = weighted_pdm_correct_reference(targets, clm_pdm, evidence,
                                             rho=rho2)
    return cur


def predict_artistic_landmarks(image: np.ndarray, variables,
                               pdms: dict[str, PDM] | None = None,
                               model: ArtisticHeatmapNet | None = None
                               ) -> np.ndarray:
    """Full 3-stage prediction (predict_landmarks.py:50-70): heatmap
    estimation -> (optional) part-PDM correction -> evidence-weighted
    tuning. image: (256, 256, 3) in [0, 1]; returns (68, 2) (x, y)."""
    model = model or ArtisticHeatmapNet()
    _, _, up = model.apply(variables,
                           jnp.asarray(image, jnp.float32)[None])
    hm = np.asarray(up[0])
    lms_yx = np.asarray(heatmaps_to_landmarks_yx(up))[0]
    if pdms:
        # dispatch: shipped menpofit models (ReferencePDM, exact menpo
        # math) vs self-trained PDM (explicit Procrustes)
        ref = any(hasattr(p, "basis") for p in pdms.values())
        correct = (feature_based_pdm_correct_reference if ref
                   else feature_based_pdm_correct)
        lms_yx = correct(lms_yx, pdms)
        lms_yx = correct(lms_yx, pdms, heatmaps=hm)
    return lms_yx[:, ::-1].copy()
