"""Polyharmonic-spline (TPS) interpolation and sparse image warping.

TPU-first design notes
----------------------
The reference computes its per-frame warp grids on the host with
``scipy.interpolate.griddata`` (Delaunay piecewise-linear,
Module2/data/umlvd_ifw_dataset.py:60-74) — its dominant single-threaded CPU
cost — and fits thin-plate splines with per-item ``torch.solve`` calls
(Module2/models/sparse_image_warp.py:93-132). Here both become one batched
on-device pipeline: an (n+d+1)² linear solve per batch item (n=76 control
points → a 79×79 solve, trivially batched) followed by a dense MXU matmul
evaluating the spline at all H·W pixels. Replacing griddata's piecewise-linear
interpolant with the polyharmonic spline is an intentional substitution: it is
smooth, batched, fully on-device, and numerically close away from triangle
edges (golden tests bound the difference).

Math parity: Module2/models/sparse_image_warp.py:84-217. ``phi`` operates on
*squared* distances; order 2 gives phi(d²) = ½ d² log d² = d² log d, the
classic TPS kernel.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_EPS = 1e-10


def _phi(r2: jax.Array, order: int) -> jax.Array:
    """Polyharmonic radial basis evaluated on squared distances ``r2``."""
    if order == 1:
        return jnp.sqrt(jnp.maximum(r2, _EPS))
    if order == 2:
        return 0.5 * r2 * jnp.log(jnp.maximum(r2, _EPS))
    if order == 4:
        return 0.5 * jnp.square(r2) * jnp.log(jnp.maximum(r2, _EPS))
    if order % 2 == 0:
        r2 = jnp.maximum(r2, _EPS)
        return 0.5 * jnp.power(r2, 0.5 * order) * jnp.log(r2)
    r2 = jnp.maximum(r2, _EPS)
    return jnp.power(r2, 0.5 * order)


def _cross_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise squared distances between rows of x (..., n, d) and y (..., m, d).

    Uses the explicit difference form rather than ||x||²-2x·y+||y||²: the
    matmul form cancels catastrophically in float32/bf16-accumulated matmuls
    (the log in the TPS kernel then amplifies the error), and with d=2 the
    matmul buys no MXU time anyway. XLA fuses the subtract/square/reduce.
    """
    diff = x[..., :, None, :] - y[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def solve_spline(
    train_points: jax.Array,
    train_values: jax.Array,
    order: int = 2,
    regularization_weight: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Fit a polyharmonic spline; batched.

    Args:
      train_points: (b, n, d) control-point locations.
      train_values: (b, n, k) values at the control points.
    Returns:
      (w, v): RBF weights (b, n, k) and affine weights (b, d+1, k).
    """
    b, n, d = train_points.shape
    k = train_values.shape[-1]
    f32 = jnp.float32
    c = train_points.astype(f32)
    f = train_values.astype(f32)

    matrix_a = _phi(_cross_sqdist(c, c), order)  # (b, n, n)
    if regularization_weight > 0.0:
        matrix_a = matrix_a + regularization_weight * jnp.eye(n, dtype=f32)
    ones = jnp.ones((b, n, 1), f32)
    matrix_b = jnp.concatenate([c, ones], axis=2)  # (b, n, d+1)

    left = jnp.concatenate([matrix_a, jnp.swapaxes(matrix_b, 1, 2)], axis=1)
    right = jnp.concatenate(
        [matrix_b, jnp.zeros((b, d + 1, d + 1), f32)], axis=1
    )
    lhs = jnp.concatenate([left, right], axis=2)  # (b, n+d+1, n+d+1)
    rhs = jnp.concatenate([f, jnp.zeros((b, d + 1, k), f32)], axis=1)

    sol = jnp.linalg.solve(lhs, rhs)
    return sol[:, :n, :], sol[:, n:, :]


def apply_spline(
    query_points: jax.Array,
    train_points: jax.Array,
    w: jax.Array,
    v: jax.Array,
    order: int = 2,
) -> jax.Array:
    """Evaluate a fitted spline at ``query_points`` (b, m, d) -> (b, m, k).

    The RBF term is an (m, n) @ (n, k) matmul — MXU work when m = H*W.
    """
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    q = query_points.astype(f32)
    d2 = _cross_sqdist(q, train_points.astype(f32))
    rbf = jnp.einsum("...mn,...nk->...mk", _phi(d2, order), w, precision=hi)
    ones = jnp.ones((*q.shape[:-1], 1), f32)
    qp = jnp.concatenate([q, ones], axis=-1)
    linear = jnp.einsum("...md,...dk->...mk", qp, v, precision=hi)
    return rbf + linear


def interpolate_spline(
    train_points: jax.Array,
    train_values: jax.Array,
    query_points: jax.Array,
    order: int = 2,
    regularization_weight: float = 1e-6,
) -> jax.Array:
    """Fit + evaluate (reference: sparse_image_warp.py:84-91).

    Unlike the reference (which solves the pixel-scale system in float32 with
    ``torch.solve`` and papers over singularity with a randn-epsilon hack,
    sparse_image_warp.py:113-116), coordinates are internally normalized to
    unit scale before the solve: the polyharmonic system at 256-pixel scale is
    too ill-conditioned for float32, and coincident control points (e.g.
    closed-mouth lip landmarks) make it exactly singular. Normalization plus a
    tiny ridge term keeps the solve stable on TPU (float32, no x64).
    """
    f32 = jnp.float32
    tp = train_points.astype(f32)
    center = jnp.mean(tp, axis=1, keepdims=True)
    scale = jnp.maximum(jnp.std(tp, axis=(1, 2), keepdims=True), 1e-3)
    tpn = (tp - center) / scale
    qpn = (query_points.astype(f32) - center) / scale
    w, v = solve_spline(tpn, train_values, order, regularization_weight)
    return apply_spline(qpn, tpn, w, v, order)


@functools.partial(jax.jit, static_argnames=("order",))
def sparse_image_warp(
    image: jax.Array,
    source_control_points: jax.Array,
    dest_control_points: jax.Array,
    order: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Warp ``image`` so dest control points show source content.

    Reference: Module2/models/sparse_image_warp.py:36-59. Control points are
    (b, n, 2) in (y, x) pixel coordinates.

    Returns (warped_image (N,H,W,C), dense_flows (N,H,W,2) in (dy, dx)).
    """
    from animateportrait_tpu.ops.warp import dense_image_warp

    n, h, w_, c = image.shape
    flows = dest_control_points - source_control_points
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w_, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([gy, gx], axis=-1).reshape(1, h * w_, 2)
    grid = jnp.broadcast_to(grid, (n, h * w_, 2))
    flat_flows = interpolate_spline(
        dest_control_points.astype(jnp.float32),
        flows.astype(jnp.float32),
        grid,
        order,
    )
    dense_flows = flat_flows.reshape(n, h, w_, 2)
    warped = dense_image_warp(image, dense_flows)
    return warped, dense_flows


def _edge_anchors(size: int) -> jnp.ndarray:
    """Fixed border anchors pinning the warp at the image boundary.

    The reference passes 8 anchors with duplicates to griddata
    (umlvd_ifw_dataset.py:62: [255,255] three times, [0,255]/[255,0] twice) —
    harmless for Delaunay interpolation but exactly singular for a spline
    system, so here the 4 unique corners plus 4 edge midpoints are used.
    """
    m = float(size - 1)
    h = m / 2.0
    return jnp.array(
        [[0, 0], [m, m], [0, m], [m, 0], [0, h], [h, 0], [m, h], [h, m]],
        dtype=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("size",))
def motion_grid_from_landmarks(
    lm_src: jax.Array,
    lm_dst: jax.Array,
    size: int = 256,
) -> jax.Array:
    """Backward warp grid mapping dst-landmark geometry onto src geometry.

    Device-side replacement for ``cal_motion256``
    (Module2/data/umlvd_ifw_dataset.py:60-74): the reference interpolates the
    dst->src correspondence with scipy griddata per frame on the host; we fit
    a batched TPS instead. Output grid is normalized to [-1, 1]
    (``map/127.5 - 1`` convention for size=256) in (x, y) order, directly
    usable by :func:`animateportrait_tpu.ops.warp.grid_sample`.

    Args:
      lm_src: (b, 68, 2) landmarks of the source frame, (x, y) pixels.
      lm_dst: (b, 68, 2) landmarks of the target pose, (x, y) pixels.
    Returns:
      (b, size, size, 2) normalized sampling grid.
    """
    b = lm_src.shape[0]
    anchors = jnp.broadcast_to(_edge_anchors(size)[None], (b, 8, 2))
    # work in (y, x) like the reference's griddata call
    src_yx = lm_src[..., ::-1]
    dst_yx = lm_dst[..., ::-1]
    dest = jnp.concatenate([dst_yx, anchors], axis=1)
    source = jnp.concatenate([src_yx, anchors], axis=1)

    gy, gx = jnp.meshgrid(
        jnp.linspace(0.0, float(size - 1), size),
        jnp.linspace(0.0, float(size - 1), size),
        indexing="ij",
    )
    query = jnp.stack([gy, gx], axis=-1).reshape(1, size * size, 2)
    query = jnp.broadcast_to(query, (b, size * size, 2))
    mapped = interpolate_spline(dest, source, query, order=2)
    mapped = mapped.reshape(b, size, size, 2)
    map_y = mapped[..., 0]
    map_x = mapped[..., 1]
    grid = jnp.stack([map_x, map_y], axis=-1)
    half = (size - 1) / 2.0  # 127.5 for size 256 (map_xy/127.5 - 1)
    return grid / half - 1.0


def ref_edge_anchors_yx(size: int = 256) -> np.ndarray:
    """The reference's EXACT 8 border anchors, duplicates included
    (umlvd_ifw_dataset.py:62 / umlvdfw_test_dataset.py:69), in (y, x),
    scaled from its hardcoded 255 to ``size - 1``."""
    m = float(size - 1)
    return np.array([[0, 0], [m, m], [0, m], [m, 0],
                     [0, m], [m, 0], [m, m], [m, m]], np.float64)


def delaunay_simplices(dest_yx: np.ndarray, pad_to: int = 160
                       ) -> np.ndarray:
    """Host-side Delaunay triangulation of the warp control points.

    scipy ``griddata(method='linear')`` = Qhull Delaunay of the scattered
    points + barycentric interpolation; the triangulation is the only
    part that resists XLA (data-dependent combinatorics over 76 points,
    ~100 us on host), so it runs here and the dense per-pixel evaluation
    runs on device (:func:`linear_motion_grid`). Qhull merges the
    reference's duplicated anchors exactly like griddata does.

    Returns (pad_to, 3) int32, padded by repeating the first simplex
    (harmless for the argmax-containment evaluation).
    """
    from scipy.spatial import Delaunay

    tri = Delaunay(np.asarray(dest_yx, np.float64)).simplices
    if tri.shape[0] > pad_to:
        raise ValueError(f"{tri.shape[0]} simplices > pad_to={pad_to}")
    pad = np.broadcast_to(tri[:1], (pad_to - tri.shape[0], 3))
    return np.concatenate([tri, pad], 0).astype(np.int32)


def triangulate_frames(lm_xy: np.ndarray, size: int) -> np.ndarray:
    """Per-frame Delaunay simplices of [landmarks (y, x); the 8 border
    anchors] — the control-point order :func:`linear_motion_grid`
    expects. ``lm_xy``: (T, 68, 2) in (x, y); returns (T, pad_to, 3)."""
    lm_xy = np.asarray(lm_xy)
    anch = ref_edge_anchors_yx(size)
    return np.stack([
        delaunay_simplices(np.concatenate([f[:, ::-1], anch], 0))
        for f in lm_xy])


@functools.partial(jax.jit, static_argnames=("size",))
def linear_motion_grid(lm_src: jax.Array, lm_dst: jax.Array,
                       simplices: jax.Array, size: int = 256) -> jax.Array:
    """EXACT ``cal_motion256`` (umlvdfw_test_dataset.py:67-81) on device.

    Piecewise-linear (Delaunay barycentric) interpolation of the source
    coordinates over the dest control points — bit-matching scipy
    ``griddata(method='linear')`` up to fp order, given the host-computed
    triangulation of the same points (:func:`delaunay_simplices`).

    The evaluation is dense and regular (TPU-friendly): for every pixel,
    barycentric coordinates against all T triangles, argmax of the
    minimum coordinate picks the containing triangle (unique for points
    inside; the argmax extension also covers fp-boundary pixels, where
    griddata's choice is tie-broken arbitrarily).

    Args:
      lm_src: (b, 68, 2) source-frame landmarks, (x, y) pixels.
      lm_dst: (b, 68, 2) target-pose landmarks, (x, y) pixels.
      simplices: (b, T, 3) int32 triangulations of [lm_dst_yx; anchors].
    Returns:
      (b, size, size, 2) normalized grid, (x, y) order, map/half - 1
      with half = (size-1)/2 (127.5), as the reference.
    """
    b = lm_src.shape[0]
    anchors = jnp.asarray(ref_edge_anchors_yx(size), jnp.float32)
    anchors = jnp.broadcast_to(anchors[None], (b, 8, 2))
    src = jnp.concatenate([lm_src[..., ::-1].astype(jnp.float32),
                           anchors], axis=1)   # (b, 76, 2) (y, x)
    dst = jnp.concatenate([lm_dst[..., ::-1].astype(jnp.float32),
                           anchors], axis=1)

    gy, gx = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32),
                          indexing="ij")
    pix = jnp.stack([gy, gx], -1).reshape(size * size, 2)

    def one(src_i, dst_i, tri):
        d = dst_i[tri]                      # (T, 3, 2) dest vertices
        s = src_i[tri]                      # (T, 3, 2) source vertices
        e1 = d[:, 1] - d[:, 0]              # (T, 2)
        e2 = d[:, 2] - d[:, 0]
        det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        degen = jnp.abs(det) < 1e-9         # merged-duplicate triangles
        det = jnp.where(degen, 1.0, det)
        # rows of the 2x2 inverse of [e1 e2] (columns): lam12 = Minv(p-D0)
        i00 = e2[:, 1] / det
        i01 = -e2[:, 0] / det
        i10 = -e1[:, 1] / det
        i11 = e1[:, 0] / det
        s0, s1, s2 = s[:, 0], s[:, 1], s[:, 2]
        hi = jax.lax.Precision.HIGHEST

        def rows(p):                        # p: (hw, 2) pixel chunk
            # barycentric coords via the RELATIVE form (p - D0): affine-
            # in-absolute-coords coefficients cancel catastrophically in
            # f32 at 256-pixel scale (measured ~1e-2 px); this form stays
            # at ~5e-5 px
            rel_y = p[None, :, 0] - d[:, None, 0, 0]     # (T, hw)
            rel_x = p[None, :, 1] - d[:, None, 0, 1]
            l1 = i00[:, None] * rel_y + i01[:, None] * rel_x
            l2 = i10[:, None] * rel_y + i11[:, None] * rel_x
            l0 = 1.0 - l1 - l2
            minb = jnp.minimum(l0, jnp.minimum(l1, l2))
            minb = jnp.where(degen[:, None], -jnp.inf, minb)
            # gather-free containment select: per-triangle interpolant
            # contracted against a one-hot of the argmax triangle (fp
            # ties averaged — they agree to fp noise on the shared
            # edge). The contraction is an MXU matmul over T instead of
            # 65k row gathers (XLA's TPU gather is the slow path —
            # PERF.md "chunked warp gathers").
            best = jnp.max(minb, axis=0, keepdims=True)  # (1, hw)
            onehot = (minb >= best).astype(jnp.float32)
            onehot = onehot / jnp.sum(onehot, 0, keepdims=True)
            # contract the one-hot into each barycentric field FIRST:
            # three (hw,T)@(T,2) dots whose (T,hw) operands fuse
            # elementwise, instead of materializing the (T,hw,2)
            # interpolant v and contracting once — same sum reassociated
            return (jnp.einsum("th,tj->hj", onehot * l0, s0, precision=hi)
                    + jnp.einsum("th,tj->hj", onehot * l1, s1,
                                 precision=hi)
                    + jnp.einsum("th,tj->hj", onehot * l2, s2,
                                 precision=hi))

        total = size * size
        per = -(-total // n_chunks)
        p = jnp.pad(pix, ((0, n_chunks * per - total), (0, 0)))
        out = jax.lax.map(rows, p.reshape(n_chunks, per, 2))
        return out.reshape(n_chunks * per, 2)[:total].reshape(
            size, size, 2)

    # Pixel-row chunking bounds the (T, hw) intermediates (the lax.map
    # per-frame lowers to a serial while loop). The loop's bookkeeping
    # alone measured 8.7% of the renderer's device-busy (round-5
    # trace); evaluating all pixels in ONE chunk is bit-identical and,
    # with the one-hot contraction restructure above, wins -13.6%
    # renderer device time and e2e 171.7 -> 182-185 f/s. The chunk
    # count is chosen OUTSIDE the vmap so it can account for the frame
    # batch: the live (T, hw) intermediates scale with b x T x hw (~6
    # of them), so bound the whole vmapped set to ~2 GB — at the
    # shipped (b=8, T~150, 256^2) that resolves to ONE chunk; bigger
    # frame batches or sizes chunk up instead of OOMing a 16 GB chip.
    # Budget 4 GB: the shipped (b=8, T_pad=160, 256^2) needs 2.0 GB and
    # must stay in ONE chunk (the measured win); fb=32 or 512 px
    # resolve to 2 chunks. AP_TPS_CHUNKS overrides (trace-time read).
    import os
    b, T = simplices.shape[0], simplices.shape[1]
    budget = 4e9
    need = b * T * (size * size) * 4.0 * 6
    n_chunks = int(os.environ.get("AP_TPS_CHUNKS") or 0) or max(
        1, int(np.ceil(need / budget)))

    mapped = jax.vmap(one)(src, dst, simplices)
    grid = jnp.stack([mapped[..., 1], mapped[..., 0]], -1)  # (x, y)
    half = (size - 1) / 2.0
    return grid / half - 1.0
