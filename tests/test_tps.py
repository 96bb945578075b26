"""Tests for polyharmonic spline fitting and the TPS warp-grid generator."""
import numpy as np
import jax.numpy as jnp

from animateportrait_tpu.ops.tps import (
    interpolate_spline,
    sparse_image_warp,
    motion_grid_from_landmarks,
)
from animateportrait_tpu.ops.warp import grid_sample


def test_spline_interpolates_training_points(rng):
    """Polyharmonic interpolation is exact at the control points."""
    pts = rng.uniform(0, 255, (2, 20, 2)).astype(np.float32)
    vals = rng.standard_normal((2, 20, 3)).astype(np.float32)
    out = np.asarray(interpolate_spline(jnp.asarray(pts), jnp.asarray(vals),
                                        jnp.asarray(pts), order=2))
    np.testing.assert_allclose(out, vals, atol=1e-2)


def test_spline_reproduces_affine_map(rng):
    """An affine displacement field is recovered exactly (linear term)."""
    pts = rng.uniform(0, 255, (1, 30, 2)).astype(np.float32)
    A = np.array([[0.9, 0.1], [-0.05, 1.1]], np.float32)
    b = np.array([3.0, -2.0], np.float32)
    vals = pts @ A.T + b
    query = rng.uniform(0, 255, (1, 50, 2)).astype(np.float32)
    out = np.asarray(interpolate_spline(jnp.asarray(pts), jnp.asarray(vals),
                                        jnp.asarray(query), order=2))
    np.testing.assert_allclose(out, query @ A.T + b, rtol=1e-3, atol=2e-2)


def test_sparse_image_warp_identity(rng):
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    pts = rng.uniform(4, 27, (1, 10, 2)).astype(np.float32)
    warped, flows = sparse_image_warp(jnp.asarray(img), jnp.asarray(pts),
                                      jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(flows), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(warped), img, atol=1e-2)


def test_motion_grid_identity_landmarks(rng):
    """Equal src/dst landmarks -> identity grid; sampling returns the image."""
    lm = rng.uniform(40, 210, (1, 68, 2)).astype(np.float32)
    grid = motion_grid_from_landmarks(jnp.asarray(lm), jnp.asarray(lm),
                                      size=64)
    # identity grid in the /127.5-1 convention (here /31.5+0.5... use size 64)
    g = np.asarray(grid)
    gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    half = (64 - 1) / 2.0 + 0.5
    np.testing.assert_allclose(g[0, ..., 0], gx / half - 1.0, atol=2e-3)
    np.testing.assert_allclose(g[0, ..., 1], gy / half - 1.0, atol=2e-3)


def test_motion_grid_translation(rng):
    """A pure translation of all landmarks produces a translated grid."""
    lm = rng.uniform(60, 190, (1, 68, 2)).astype(np.float32)
    # NOTE: edge anchors are fixed, so a global translation is only
    # approximated in the interior; check central region trend.
    shift = np.array([5.0, 0.0], np.float32)
    grid_id = np.asarray(motion_grid_from_landmarks(
        jnp.asarray(lm), jnp.asarray(lm), size=256))
    grid_sh = np.asarray(motion_grid_from_landmarks(
        jnp.asarray(lm + shift), jnp.asarray(lm), size=256))
    center = (slice(0, 1), slice(100, 156), slice(100, 156))
    dx = (grid_sh[..., 0] - grid_id[..., 0])[center] * 127.5
    assert abs(dx.mean() - 5.0) < 1.0


def test_motion_grid_matches_griddata_golden(rng):
    """TPS substitution stays close to the reference's scipy griddata
    (umlvd_ifw_dataset.py:60-74) in the face interior."""
    from scipy.interpolate import griddata

    size = 64
    lm_dst = rng.uniform(10, 53, (68, 2)).astype(np.float64)
    lm_src = lm_dst + rng.normal(0, 1.0, (68, 2))

    m = float(size - 1)
    edges = np.array([[0, 0], [m, m], [0, m], [m, 0], [0, m], [m, 0],
                      [m, m], [m, m]], np.float64)
    dst_yx = lm_dst[:, ::-1]
    src_yx = lm_src[:, ::-1]
    dest = np.concatenate([dst_yx, edges])
    source = np.concatenate([src_yx, edges])
    gy, gx = np.mgrid[0:m:complex(size), 0:m:complex(size)]
    gz = griddata(dest, source, (gy, gx), method="linear")
    map_x = gz[..., 1]
    map_y = gz[..., 0]
    half = m / 2.0 + 0.5
    ref_grid = np.stack([map_x, map_y], -1) / half - 1.0

    ours = np.asarray(motion_grid_from_landmarks(
        jnp.asarray(lm_src[None].astype(np.float32)),
        jnp.asarray(lm_dst[None].astype(np.float32)), size=size))[0]

    interior = (slice(16, 48), slice(16, 48))
    valid = ~np.isnan(ref_grid[interior]).any(-1)
    diff = np.abs(ours[interior] - ref_grid[interior])[valid]
    # within ~1.5 px of the piecewise-linear interpolant in the interior
    assert (diff * half).mean() < 1.5


def test_sparse_image_warp_moves_content():
    img = np.zeros((1, 64, 64, 1), np.float32)
    img[0, 30:34, 30:34, 0] = 1.0
    src = np.array([[[32.0, 32.0], [10, 10], [10, 54], [54, 10], [54, 54]]],
                   np.float32)
    dst = src.copy()
    dst[0, 0] = [40.0, 32.0]  # move center control point down by 8
    warped, _ = sparse_image_warp(jnp.asarray(img), jnp.asarray(src),
                                  jnp.asarray(dst))
    w = np.asarray(warped)[0, ..., 0]
    # mass should appear near row 40 now
    assert w[38:44, 30:34].sum() > w[28:34, 30:34].sum()
