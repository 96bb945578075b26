"""Masked, fixed-shape non-maximum suppression.

TPU-first design notes
----------------------
The reference's NMS (MTCNN/box_utils.py:5-68) is a data-dependent
``np.delete`` loop on the host. XLA needs static shapes, so here NMS operates
on a fixed-capacity box buffer with a validity mask: one (K, K) IoU matrix
(vectorized, fused by XLA) plus a K-trip ``lax.fori_loop`` carrying a
suppression mask. Results are bit-equal to greedy NMS given the same candidate
set and score order.

Box/IoU conventions match the reference: inclusive pixel boxes with
``w = x2 - x1 + 1`` and modes 'union' (IoU) / 'min' (overlap over smaller
area, used by ONet's final NMS, MTCNN/detector.py:124).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jax.Array, mode: str = "union") -> jax.Array:
    """Pairwise overlap of (K, 4) boxes (x1, y1, x2, y2), inclusive coords."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, ix2 - ix1 + 1.0)
    h = jnp.maximum(0.0, iy2 - iy1 + 1.0)
    inter = w * h
    if mode == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(denom, 1e-10)


@functools.partial(jax.jit, static_argnames=("mode",))
def masked_nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    mode: str = "union",
) -> jax.Array:
    """Greedy NMS over a fixed-size masked buffer.

    Args:
      boxes:  (K, 4) box corners; rows with valid=False are ignored.
      scores: (K,) confidence scores.
      valid:  (K,) bool mask of live rows.
    Returns:
      (K,) bool keep mask (subset of ``valid``).
    """
    K = boxes.shape[0]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg)
    order = jnp.argsort(-masked_scores)  # descending; invalid rows last
    overlaps = iou_matrix(boxes, mode)  # (K, K)

    def body(i, state):
        keep, suppressed = state
        idx = order[i]
        ok = jnp.logical_and(~suppressed[idx], valid[idx])
        keep = keep.at[idx].set(ok)
        row = overlaps[idx] > iou_threshold
        suppressed = jnp.where(ok, suppressed | row, suppressed)
        return keep, suppressed

    keep0 = jnp.zeros((K,), bool)
    sup0 = ~valid
    keep, _ = jax.lax.fori_loop(0, K, body, (keep0, sup0))
    return keep


def topk_mask(scores: jax.Array, valid: jax.Array, k: int
              ) -> tuple[jax.Array, jax.Array]:
    """Indices of the top-k valid scores plus a validity mask for them."""
    masked = jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, k)
    return idx, vals > -jnp.inf
