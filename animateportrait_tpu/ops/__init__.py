"""Jittable numerical building blocks (pure JAX, NHWC layouts)."""

from animateportrait_tpu.ops.warp import (
    grid_sample,
    sample_bilinear,
    dense_image_warp,
    warp_acc_flow,
)
from animateportrait_tpu.ops.tps import (
    solve_spline,
    apply_spline,
    interpolate_spline,
    sparse_image_warp,
    motion_grid_from_landmarks,
)
