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
    # identity grid in the reference's map/((size-1)/2) - 1 convention
    # (cal_motion256: map_xy/127.5 - 1 at size 256)
    g = np.asarray(grid)
    gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    half = (64 - 1) / 2.0
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
    half = m / 2.0
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


def _ref_spline_solve(train_pts, train_vals, query, order=2):
    """float64 numpy oracle of the reference interpolate_spline
    (Module2/models/sparse_image_warp.py:84-217)."""
    def phi(r2):
        r2 = np.maximum(r2, 1e-10)
        if order == 2:
            return 0.5 * r2 * np.log(r2)  # 0.5*r^2*log(r^2) = r^2*log(r)
        raise NotImplementedError

    b, n, d = train_pts.shape
    k = train_vals.shape[-1]
    out = np.zeros((b, query.shape[1], k))
    for i in range(b):
        c = train_pts[i].astype(np.float64)
        f = train_vals[i].astype(np.float64)
        d2 = ((c[:, None] - c[None, :]) ** 2).sum(-1)
        A = phi(d2)
        ones = np.ones((n, 1))
        V = np.concatenate([c, ones], axis=1)  # (n, d+1)
        top = np.concatenate([A, V], axis=1)
        bot = np.concatenate([V.T, np.zeros((d + 1, d + 1))], axis=1)
        lhs = np.concatenate([top, bot], axis=0)
        rhs = np.concatenate([f, np.zeros((d + 1, k))], axis=0)
        wv = np.linalg.solve(lhs + 1e-8 * np.eye(n + d + 1), rhs)
        w, v = wv[:n], wv[n:]
        q = query[i].astype(np.float64)
        qd2 = ((q[:, None] - c[None, :]) ** 2).sum(-1)
        out[i] = phi(qd2) @ w + np.concatenate(
            [q, np.ones((q.shape[0], 1))], axis=1) @ v
    return out


def test_spline_matches_reference_system(rng):
    """Our normalized-scale solve agrees with the reference's raw-scale
    float64 system on well-conditioned control points."""
    pts = rng.uniform(20, 235, (1, 24, 2)).astype(np.float32)
    vals = (rng.standard_normal((1, 24, 2)) * 5).astype(np.float32)
    query = rng.uniform(0, 255, (1, 200, 2)).astype(np.float32)
    ours = np.asarray(interpolate_spline(
        jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(query), order=2))
    ref = _ref_spline_solve(pts, vals, query)
    np.testing.assert_allclose(ours, ref, atol=0.15)


def test_motion_grid_close_to_scipy_griddata(rng):
    """motion_grid_from_landmarks vs the reference's cal_motion256 scipy
    griddata (linear Delaunay). Methods differ (TPS vs piecewise linear),
    so compare inside the face region with a loose tolerance."""
    from scipy.interpolate import griddata

    # realistic geometry: the canonical face scaled into the 256 frame
    # (interior landmarks constrain the interpolation; a hollow ring
    # exaggerates method differences between TPS and piecewise-linear)
    from animateportrait_tpu.utils.assets import std_face_landmarks

    std = std_face_landmarks()[:, :2]
    src = (std - std.mean(0)) * 60 + 128
    src[:, 1] *= -1
    src[:, 1] += 256
    src = np.clip(src, 20, 235)
    dst = src + rng.uniform(-3, 3, src.shape)

    ours = np.asarray(motion_grid_from_landmarks(
        jnp.asarray(src[None], jnp.float32),
        jnp.asarray(dst[None], jnp.float32), 256))[0]

    # reference cal_motion256 (umlvdfw_test_dataset.py:67-81)
    gx, gy = np.mgrid[0:255:256j, 0:255:256j]
    edges = np.array([[0, 0], [255, 255], [0, 255], [255, 0], [0, 255],
                      [255, 0], [255, 255], [255, 255]])
    d = np.concatenate([dst[:, [1, 0]], edges])
    s = np.concatenate([src[:, [1, 0]], edges])
    gz = griddata(d, s, (gx, gy), method="linear")
    map_x = gz[..., 1].astype(np.float32)
    map_y = gz[..., 0].astype(np.float32)
    ref = np.stack([map_x, map_y], -1) / 127.5 - 1.0

    # compare on the central face region where both are well-constrained
    c = slice(96, 160)
    region_ref = ref[c, c]
    region_ours = ours[c, c]
    ok = np.isfinite(region_ref)
    diff = np.abs(region_ours - region_ref)[ok]
    # methods differ (smooth TPS vs piecewise-linear Delaunay); agreement
    # should be sub-pixel-ish in the landmark-dense face interior
    assert float(np.median(diff)) < 0.012   # ~1.5 px of 256
    assert float(np.mean(diff)) < 0.025


def test_linear_motion_grid_matches_griddata_exactly(rng):
    """linear_motion_grid = EXACT cal_motion256: host Delaunay + device
    barycentric interpolation reproduces scipy griddata(method='linear')
    to fp32 noise at realistic talking-head amplitudes."""
    from scipy.interpolate import griddata

    from animateportrait_tpu.ops.tps import (
        delaunay_simplices, linear_motion_grid, ref_edge_anchors_yx)

    size = 256
    lm_dst = rng.uniform(40, 215, (68, 2))
    lm_src = lm_dst + rng.normal(0, 6.0, (68, 2))
    lm_src[48:68] += rng.normal(0, 4.0, (20, 2))   # mouth motion

    edges = ref_edge_anchors_yx(size)
    dest = np.concatenate([lm_dst[:, ::-1], edges])
    source = np.concatenate([lm_src[:, ::-1], edges])
    gy, gx = np.mgrid[0:size - 1:complex(size), 0:size - 1:complex(size)]
    gz = griddata(dest, source, (gy, gx), method="linear")
    ref_grid = np.stack([gz[..., 1], gz[..., 0]], -1) / 127.5 - 1.0

    tri = delaunay_simplices(dest)
    ours = np.asarray(linear_motion_grid(
        jnp.asarray(lm_src[None], jnp.float32),
        jnp.asarray(lm_dst[None], jnp.float32),
        jnp.asarray(tri[None]), size))[0]

    valid = ~np.isnan(ref_grid).any(-1)
    dpx = np.abs(ours - ref_grid)[valid] * 127.5
    assert dpx.max() < 1e-2, dpx.max()
    # batched path: two frames at once agree with per-frame evaluation
    tri2 = np.stack([tri, tri])
    both = np.asarray(linear_motion_grid(
        jnp.asarray(np.stack([lm_src, lm_src]), jnp.float32),
        jnp.asarray(np.stack([lm_dst, lm_dst]), jnp.float32),
        jnp.asarray(tri2), size))
    np.testing.assert_allclose(both[0], both[1], atol=0)
    np.testing.assert_allclose(both[0], ours, atol=0)


def test_linear_motion_grid_odd_size(rng):
    """Odd crop sizes (e.g. --crop_size 129) must evaluate: the pixel
    chunking pads to a multiple instead of requiring size*size to divide
    by the chunk count. Identity landmarks -> the identity grid."""
    from animateportrait_tpu.ops.tps import (
        linear_motion_grid, triangulate_frames)

    size = 129
    lm = rng.uniform(20, size - 20, (68, 2))
    tri = triangulate_frames(lm[None], size)
    grid = np.asarray(linear_motion_grid(
        jnp.asarray(lm[None], jnp.float32),
        jnp.asarray(lm[None], jnp.float32),
        jnp.asarray(tri), size))[0]
    assert grid.shape == (size, size, 2)
    half = (size - 1) / 2.0
    gy, gx = np.mgrid[0:size, 0:size]
    ident = np.stack([gx, gy], -1) / half - 1.0
    assert np.abs(grid - ident).max() * half < 1e-3
