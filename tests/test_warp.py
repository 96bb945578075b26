"""Parity tests for warp ops against torch.nn.functional oracles."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from animateportrait_tpu.ops.warp import (
    grid_sample,
    dense_image_warp,
    warp_acc_flow,
)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, align_corners, padding_mode, mode):
    n, h, w, c = 2, 9, 11, 3
    img = rng.standard_normal((n, h, w, c)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, (n, 7, 8, 2))).astype(np.float32)

    ours = np.asarray(
        grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode,
                    padding_mode=padding_mode, align_corners=align_corners)
    )
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    if mode == "nearest":
        # rounding ties can differ; compare where not on a .5 boundary
        close = np.isclose(ours, ref, atol=1e-5)
        assert close.mean() > 0.98
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_acc_flow_matches_reference_semantics(rng):
    """Oracle re-derives modules.py:596-625 semantics with torch."""
    n, h, w, c = 2, 8, 8, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((n, h, w, 2)) * 2).astype(np.float32)

    ours = np.asarray(warp_acc_flow(jnp.asarray(x), jnp.asarray(flow)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ft = torch.from_numpy(flow).permute(0, 3, 1, 2)
    xx = torch.arange(w).view(1, -1).repeat(h, 1)
    yy = torch.arange(h).view(-1, 1).repeat(1, w)
    grid = torch.stack([xx, yy]).unsqueeze(0).repeat(n, 1, 1, 1).float()
    grid = grid + ft
    grid[:, 0] = 2.0 * grid[:, 0] / max(w - 1, 1) - 1.0
    grid[:, 1] = 2.0 * grid[:, 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(xt, grid.permute(0, 2, 3, 1), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_acc_flow_mask_fill(rng):
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    mask = np.zeros((1, 4, 4, 1), np.float32)
    out = np.asarray(warp_acc_flow(jnp.asarray(x), jnp.asarray(flow),
                                   mask=jnp.asarray(mask), mask_value=-1.0))
    assert np.all(out == -1.0)


def test_dense_image_warp_identity(rng):
    img = rng.standard_normal((1, 6, 7, 2)).astype(np.float32)
    flow = np.zeros((1, 6, 7, 2), np.float32)
    out = np.asarray(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_dense_image_warp_shift():
    # constant flow (dy=1, dx=0): output[j] = image[j-1]; border clamp at j=0
    img = np.arange(5, dtype=np.float32).reshape(1, 5, 1, 1)
    img = np.tile(img, (1, 1, 4, 1))
    flow = np.zeros((1, 5, 4, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
    expected = np.array([0, 0, 1, 2, 3], np.float32)
    np.testing.assert_allclose(out[0, :, 0, 0], expected, atol=1e-6)


def test_sample_bicubic_matches_torch_border():
    """sample_bicubic vs torch grid_sample(mode='bicubic',
    padding_mode='border') on in-range coords (the only coords the train
    step's crop path produces)."""
    import torch
    import torch.nn.functional as F

    from animateportrait_tpu.ops.warp import sample_bicubic

    rng = np.random.default_rng(0)
    N, H, W, C = 2, 13, 17, 3
    img = rng.standard_normal((N, H, W, C)).astype(np.float32)
    # normalized grid in [-1, 1] -> pixel coords via align_corners=False
    grid = rng.uniform(-1, 1, (N, 6, 7, 2)).astype(np.float32)
    ix = ((grid[..., 0] + 1) * W - 1) * 0.5
    iy = ((grid[..., 1] + 1) * H - 1) * 0.5
    ours = sample_bicubic(jnp.asarray(img), jnp.asarray(iy),
                          jnp.asarray(ix))
    with torch.no_grad():
        ref = F.grid_sample(
            torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
            mode="bicubic", padding_mode="border", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5)


@pytest.mark.slow
def test_sample_bilinear_chunked_matches_unchunked(monkeypatch):
    """Force tiny gather-chunk limits: results must be identical."""
    import numpy as np
    import jax.numpy as jnp
    from animateportrait_tpu.ops import warp

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal((5, 17, 13, 3)), jnp.float32)
    iy = jnp.asarray(rng.uniform(-3, 19, (5, 9, 8)), jnp.float32)
    ix = jnp.asarray(rng.uniform(-3, 15, (5, 9, 8)), jnp.float32)
    ref = warp.sample_bilinear(img, iy, ix)
    refm = warp.sample_bilinear_multi(img, [(iy, ix), (ix, iy)], "border")
    refc = warp.sample_bicubic(img, iy, ix)
    monkeypatch.setattr(warp, "_GATHER_ROW_LIMIT", 2 * 18 * 14)
    monkeypatch.setattr(warp, "_GATHER_BYTE_LIMIT", 1 << 30)
    out = warp.sample_bilinear(img, iy, ix)
    outm = warp.sample_bilinear_multi(img, [(iy, ix), (ix, iy)], "border")
    outc = warp.sample_bicubic(img, iy, ix)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    for a, b in zip(refm, outm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(refc), np.asarray(outc))
