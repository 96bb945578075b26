"""Shared Flax layers used across the framework's model zoo.

All modules are NHWC (TPU-native layout) flax.linen, with parameter layouts
chosen so torch checkpoints convert by pure transposition (see
``animateportrait_tpu.io.torch_convert``).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def env_choice(name: str, default: str, allowed: tuple[str, ...]) -> str:
    """Read a lowering-selector env var, rejecting unknown values.

    These selectors are read at TRACE time: changing the env var after a
    function has been jit-compiled has no effect until a retrace. A typo
    ('0', 'off', ...) must raise rather than silently select a non-default
    lowering — AP_REFLECT_CONV's non-default path is measured 43% slower.
    """
    val = os.environ.get(name, default)
    if val not in allowed:
        raise ValueError(
            f"{name}={val!r}: expected one of {sorted(allowed)}")
    return val


def reflect_conv_mode() -> str:
    """'pad' (default): materialized reflect pad + VALID conv.
    'fix': zero-padded SAME conv + border-repair thin convs — only for
    isolated-conv workloads; in-graph it is measured 43% slower (see
    Conv2dReflect). Trace-time read; see ``env_choice``."""
    return env_choice("AP_REFLECT_CONV", "pad", ("pad", "fix"))


class PReLU(nn.Module):
    """Channel-wise parametric ReLU (torch nn.PReLU(num_parameters=C))."""

    features: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, self.init, jnp.float32),
            (self.features,),
        )
        return jnp.where(x >= 0, x, x * alpha)


def max_pool_ceil(x, window: int, stride: int) -> jax.Array:
    """Max pool with torch ceil_mode=True semantics, NHWC.

    torch pads implicitly on the bottom/right so that the last window may
    start at the final valid position; emulated with -inf padding sized
    ceil((size - window)/stride)*stride + window - size.
    """
    n, h, w, c = x.shape

    def pad_amount(size):
        import math

        out = math.ceil((size - window) / stride) + 1
        return max(0, (out - 1) * stride + window - size)

    ph, pw = pad_amount(h), pad_amount(w)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, ph), (0, pw), (0, 0)),
    )


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization (torch InstanceNorm2d defaults:
    affine=False, eps=1e-5) over spatial dims of NHWC input."""

    eps: float = 1e-5
    affine: bool = False
    features: int | None = None
    # fuse a following ReLU into the normalization kernel (parameter-free,
    # so flipping it never changes the param tree)
    relu: bool = False

    @nn.compact
    def __call__(self, x):
        # statistics in f32 regardless of compute dtype: bf16 mean/var
        # across 64k pixels loses ~3 decimal digits per layer and the
        # IN chains compound it (measured PSNR 17 dB vs fp32 with bf16
        # stats on the composed render chain); the upcast is VPU-cheap.
        # On TPU, eligible shapes route to the single-pass Pallas fused
        # kernel (ops/pallas_instnorm.py) — one HBM read+write instead
        # of XLA's reduce+normalize double read.
        from animateportrait_tpu.ops.pallas_instnorm import instance_norm

        fuse_relu = self.relu and not self.affine
        y = instance_norm(x, eps=self.eps, relu=fuse_relu)
        if self.affine:
            feats = self.features or x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (feats,))
            bias = self.param("bias", nn.initializers.zeros, (feats,))
            y = y * scale + bias
        if self.relu and not fuse_relu:
            y = nn.relu(y)
        return y


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm (eps 1e-5, affine)."""

    num_groups: int
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, name="gn"
        )(x)


def reflect_pad_2d(x, pad: int):
    """NHWC reflection padding (torch ReflectionPad2d)."""
    return jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )


def replicate_pad_2d(x, pad: int):
    """NHWC replication padding (torch ReplicationPad2d)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


_DN = ("NHWC", "HWIO", "NHWC")


def conv2d_reflect_same(x, kernel, bias=None):
    """Stride-1 odd-k conv with torch ReflectionPad2d(k//2) + Conv2d
    semantics, computed WITHOUT materializing the reflect-padded tensor.

    ``jnp.pad(mode='reflect')`` lowers to reversed-slice concats — a
    full extra HBM read+write of the activation per conv (plus its
    mirror in the backward pass). A 2026-08-19 v5e device trace
    attributes ~6% of the generator forward to these pads (the 'pad'
    HLO category + nn.py reflect fusions). Zero padding, by contrast,
    folds into the conv op for free. So: run the conv zero-padded SAME
    (every in-range tap, identical to the interior of the reflect
    conv), then add the pad-tap contributions back onto the p border
    rows/columns with thin 1-row/1-column convs:

      top rows    y<p:  taps with r = y+ty-p < 0 read x[p-y-ty] — a
                        1D conv of that row along W, itself
                        reflect-padded in W so corner pads (r<0, c out
                        of range) resolve to x[-r, ref(c)] exactly;
      bottom      symmetric;
      left/right  x'<p: taps with c out of range but r IN range — the
                        1D conv down H is ZERO-padded so r-out taps
                        (already counted by top/bottom) drop out.

    Every pad tap is counted exactly once, so the result is the exact
    linear map of the reflect conv (float reassociation only). Border
    updates use static-slice ``.at[].add`` → in-place
    dynamic-update-slice, never a full-tensor pass.

    NOTE: measured in-graph on v5e (2026-08-20) this formulation LOSES
    43% on the generator forward despite the per-op accounting above —
    see the ``Conv2dReflect`` docstring and PERF.md. It is kept as the
    opt-in ``AP_REFLECT_CONV=fix`` path.
    """
    k = kernel.shape[0]
    p = k // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(p, p), (p, p)], dimension_numbers=_DN)
    if bias is not None:
        y = y + bias
    if p == 0:
        return y
    return add_reflect_border_corrections(y, x, kernel)


def add_reflect_border_corrections(y, x, kernel):
    """Add the reflect-pad tap contributions of a stride-1 SAME conv of
    ``x`` (N,H,W,C) by ``kernel`` (k,k,C,F) onto the zero-padded conv
    result ``y`` (N,H,W,F). See ``conv2d_reflect_same`` for the exact
    accounting of which 1D conv covers which pad region.

    Cost discipline (v5e-measured): every (row, kernel-row) pair for one
    side goes through ONE thin conv via a block-diagonal kernel (two
    dispatches total: rows + columns), and the strips are applied as
    ``y + zero-padded strips`` — a single elementwise op XLA fuses into
    the consumer — never ``.at[].add`` (its dynamic-update-slice copies
    the whole tensor when it cannot update in place)."""
    k = kernel.shape[0]
    assert kernel.shape[1] == k and k % 2 == 1, "square odd kernel"
    p = k // 2
    N, H, W, C = x.shape
    F = kernel.shape[3]
    assert H > p and W > p, "reflect padding needs size > pad"

    # (source row in x, kernel row, destination out row) triples
    rows = [(p - yo - ty, ty, yo)
            for yo in range(p) for ty in range(p - yo)]
    rows += [(H - 1 + p + yo - ty, ty, H - 1 - yo)
             for yo in range(p) for ty in range(p + yo + 1, k)]
    cols = [(p - xo - tx, tx, xo)
            for xo in range(p) for tx in range(p - xo)]
    cols += [(W - 1 + p + xo - tx, tx, W - 1 - xo)
             for xo in range(p) for tx in range(p + xo + 1, k)]

    def blockdiag_1d(slabs, taps, reflect):
        """One thin conv for all (slab, kernel-1D-slice) pairs: slabs
        (M, N, L, C) stacked as M channel blocks, kernel block-diagonal
        (1, k, M*C, M*F); returns (M, N, L, F)."""
        M = len(slabs)
        xin = jnp.concatenate(slabs, axis=-1)[:, None]  # (N,1,L,M*C)
        if reflect:
            xin = jnp.pad(xin, ((0, 0), (0, 0), (p, p), (0, 0)),
                          mode="reflect")
            padw = "VALID"
        else:
            padw = [(0, 0), (p, p)]
        wblk = jnp.zeros((1, k, M * C, M * F), kernel.dtype)
        for i, t in enumerate(taps):
            wblk = wblk.at[0, :, i * C:(i + 1) * C,
                           i * F:(i + 1) * F].set(t)
        out = jax.lax.conv_general_dilated(
            xin, wblk, (1, 1), padw, dimension_numbers=_DN)[:, 0]
        return [out[..., i * F:(i + 1) * F] for i in range(M)]

    corr = jnp.zeros_like(y)
    if rows:
        outs = blockdiag_1d([x[:, m] for m, _, _ in rows],
                            [kernel[t] for _, t, _ in rows], reflect=True)
        strips = {}
        for (_, _, dst), o in zip(rows, outs):
            strips[dst] = strips.get(dst, 0) + o
        # one (N, 2p, W, F) block per edge, zero-padded to full H and
        # added in one fused elementwise op
        top = jnp.stack([strips[yo] for yo in range(p)], axis=1)
        bot = jnp.stack([strips[H - 1 - yo] for yo in range(p)][::-1],
                        axis=1)
        corr = corr + jnp.pad(top, ((0, 0), (0, H - p), (0, 0), (0, 0)))
        corr = corr + jnp.pad(bot, ((0, 0), (H - p, 0), (0, 0), (0, 0)))
    if cols:
        # columns conv'd down H with ZERO padding (r-out taps belong to
        # the row corrections): transpose the (N,H,C) columns into the
        # thin conv's L axis
        outs = blockdiag_1d([x[:, :, m] for m, _, _ in cols],
                            [kernel[:, t] for _, t, _ in cols],
                            reflect=False)
        strips = {}
        for (_, _, dst), o in zip(cols, outs):
            strips[dst] = strips.get(dst, 0) + o
        left = jnp.stack([strips[xo] for xo in range(p)], axis=2)
        right = jnp.stack([strips[W - 1 - xo] for xo in range(p)][::-1],
                          axis=2)
        corr = corr + jnp.pad(left, ((0, 0), (0, 0), (0, W - p), (0, 0)))
        corr = corr + jnp.pad(right, ((0, 0), (0, 0), (W - p, 0), (0, 0)))
    return y + corr.astype(y.dtype)


class Conv2dReflect(nn.Module):
    """ReflectionPad2d(k//2) + Conv2d(k, stride 1), parameter-identical
    to ``nn.Conv(features, (k, k), padding=0)`` applied to a
    reflect-padded input.

    Two lowerings, selected by ``AP_REFLECT_CONV`` (validated,
    trace-time read — see ``reflect_conv_mode``):
    ``pad`` (default) materializes the reflect pad and runs a VALID
    conv; ``fix`` folds the pad into a zero-padded SAME conv and
    repairs the borders with thin convs (``conv2d_reflect_same``).
    MEASURED AND LOST IN-GRAPH (v5e, 2026-08-20): generator forward
    147.2 f/s with ``fix`` vs 256.8 f/s with ``pad`` (same session,
    healthy-tunnel control), plus a much slower compile — the dozens of
    extra thin convs and concats defeat XLA's fusion of the pads into
    neighboring ops, which was already cheaper than the trace's 'pad'
    category suggested. ``fix`` stays available for isolated-conv
    workloads; see PERF.md 'what lost'."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=None)
        if reflect_conv_mode() == "pad":
            xp = reflect_pad_2d(x, k // 2)
            return jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID", dimension_numbers=_DN) + b
        return conv2d_reflect_same(x, w, b)


def _phase_taps(k: int, s: int, p: int, op: int):
    """Per-phase tap tables for the phase-split transposed conv.

    Returns (taps, lo, hi) where taps[dy] lists (window offset d,
    kernel index t) pairs contributing to output row s*m + dy, or None
    when the split does not apply (output length must be exactly s*H,
    i.e. (H-1)*s - 2p + k + op == s*H, and every output needs >=1 tap).
    """
    if s < 2 or (k + op - 2 * p) != s:
        return None
    taps: list[list[tuple[int, int]]] = []
    for dy in range(s):
        row = [(d, dy + p - s * d)
               for d in range(-(k // s) - 1, k // s + 2)
               if 0 <= dy + p - s * d < k]
        if not row:
            return None
        taps.append(row)
    offs = [d for row in taps for d, _ in row]
    return taps, min(offs), max(offs)


class ConvTranspose2dTorch(nn.Module):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) semantics, NHWC.

    Implemented via lax.conv_transpose with explicit padding
    ((k-1-p, k-1-p+output_padding), ...) and transpose_kernel=True so
    converted torch weights (IOHW -> HWIO without flipping) apply directly.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        import os

        in_ch = x.shape[-1]
        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, self.features, in_ch))  # HWOI: transpose_kernel layout
        if (_phase_taps(k, self.stride, self.padding,
                        self.output_padding) is not None
                and env_choice("AP_CONVT", "phase",
                               ("phase", "dilated")) == "phase"):
            y = self._phase_split(x, kernel)
        else:
            lo = k - 1 - self.padding
            hi = k - 1 - self.padding + self.output_padding
            y = jax.lax.conv_transpose(
                x, kernel,
                strides=(self.stride, self.stride),
                padding=((lo, hi), (lo, hi)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y

    def _phase_split(self, x, w):
        """Strided transposed conv as ONE dense small conv to s^2*C_out
        phase channels + a depth-to-space interleave.

        TPU note: lax.conv_transpose lowers to an input-dilated conv —
        the MXU then multiplies inserted zeros for (s^2-1)/s^2 of the
        tap rows. Splitting the output into its s x s phases uses only
        the real taps each phase touches: for the hot k=3/s=2/p=1/op=1
        layers (generator up0/up1, FlowUnet up-convs) that is a dense
        2x2 conv, 16 MACs per output quad instead of 36.

        Derivation (per axis): out[o] = sum over (i, t) with
        o = s*i - p + t of x[i] w[t]; writing o = s*m + dy gives the
        per-phase taps t = (dy + p - s*d) for window offsets d = i - m,
        enumerated by :func:`_phase_taps`.
        """
        s = self.stride
        co = self.features
        taps, lo, hi = _phase_taps(k := self.kernel, s, self.padding,
                                   self.output_padding)
        win = hi - lo + 1
        pk = jnp.zeros((win, win, x.shape[-1], s * s * co), w.dtype)
        for dy in range(s):
            for dx in range(s):
                ph = dy * s + dx
                for d_y, wy in taps[dy]:
                    for d_x, wx in taps[dx]:
                        # w is HWOI -> (O, I) slice transposed to (I, O)
                        blk = jnp.swapaxes(w[wy, wx], 0, 1)
                        pk = pk.at[d_y - lo, d_x - lo, :,
                                   ph * co:(ph + 1) * co].set(blk)
        xp = jnp.pad(x, ((0, 0), (-lo, hi), (-lo, hi), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, pk, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n, h, wdt, _ = y.shape
        y = y.reshape(n, h, wdt, s, s, co)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(n, s * h, s * wdt, co)


def _resize_matrix(n_in: int, n_out: int, align_corners: bool):
    """(n_out, n_in) two-tap interpolation matrix for a 1-D bilinear
    resize, torch semantics (border-clamped taps; at edges both taps
    collapse onto the same pixel and their weights sum)."""
    import numpy as np

    # weights in float32 exactly like torch's upsample kernels
    # (area_pixel_compute_scale/source_index use float for f32 tensors)
    if align_corners:
        scale = np.float32(n_in - 1) / np.float32(max(n_out - 1, 1))
        pos = scale * np.arange(n_out, dtype=np.float32)
    else:
        scale = np.float32(n_in) / np.float32(n_out)
        pos = np.maximum(
            scale * (np.arange(n_out, dtype=np.float32) + np.float32(0.5))
            - np.float32(0.5), np.float32(0))
    lo = np.floor(pos).astype(np.int64)
    f = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    o = np.arange(n_out)
    m[o, np.clip(lo, 0, n_in - 1)] += 1.0 - f
    m[o, np.clip(lo + 1, 0, n_in - 1)] += f
    return m


def interpolate_bilinear(x, size, align_corners: bool = False):
    """torch F.interpolate(mode='bilinear') for NHWC input.

    TPU note: a regular resize is separable, so it runs as two small
    matmuls (rows then columns) on the MXU instead of the generic warp
    gather — the gather path is lane-starved for the C=1..3 flow/mask/
    image resizes that dominate this call's uses.
    """
    N, H, W, C = x.shape
    Ho, Wo = size
    my = jnp.asarray(_resize_matrix(H, Ho, align_corners), x.dtype)
    mx = jnp.asarray(_resize_matrix(W, Wo, align_corners), x.dtype)
    # HIGHEST: keeps f32 resizes exact on TPU (DEFAULT matmul precision
    # would run them as bf16 MXU passes); the op is bandwidth-bound, so
    # the full-precision pass costs nothing
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,nhwc->nowc", my, x, precision=hp)
    return jnp.einsum("ow,nhwc->nhoc", mx, y, precision=hp)


class LSTMLayerTorch(nn.Module):
    """One LSTM direction over (B, T, F), torch param layout.

    TPU-first: the input projection for the whole sequence runs as one
    (B*T, I) x (I, 4H) matmul on the MXU *outside* the scan; the scan body
    only does the recurrent (B, H) x (H, 4H) matmul, minimizing sequential
    work per step.
    """

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        input_dim = x.shape[-1]
        k = 1.0 / jnp.sqrt(self.hidden)

        def unif(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        w_ih = self.param("w_ih", unif, (4 * self.hidden, input_dim))
        w_hh = self.param("w_hh", unif, (4 * self.hidden, self.hidden))
        b_ih = self.param("b_ih", unif, (4 * self.hidden,))
        b_hh = self.param("b_hh", unif, (4 * self.hidden,))

        xg = x @ w_ih.T + (b_ih + b_hh)  # (B, T, 4H), one big matmul
        if self.reverse:
            xg = jnp.flip(xg, axis=1)
        w_hh_t = w_hh.T

        def step(carry, xg_t):
            h, c = carry
            z = xg_t + h @ w_hh_t
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        carry0 = (
            jnp.zeros((B, self.hidden), x.dtype),
            jnp.zeros((B, self.hidden), x.dtype),
        )
        carry, ys = jax.lax.scan(
            step, carry0, jnp.swapaxes(xg, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, carry


class LSTM(nn.Module):
    """(Stacked, optionally bidirectional) LSTM over (B, T, F).

    Mirrors torch nn.LSTM(batch_first=True): layer l direction d parameters
    live under scope ``layer{l}{_rev}``.
    """

    hidden: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        out = x
        final_states = []
        for layer in range(self.num_layers):
            ys_f, carry_f = LSTMLayerTorch(
                self.hidden, name=f"layer{layer}")(out)
            if self.bidirectional:
                ys_b, carry_b = LSTMLayerTorch(
                    self.hidden, reverse=True, name=f"layer{layer}_rev")(out)
                out = jnp.concatenate([ys_f, ys_b], axis=-1)
                final_states.append((carry_f, carry_b))
            else:
                out = ys_f
                final_states.append(carry_f)
        return out, final_states


class GRULayerTorch(nn.Module):
    """One GRU layer over (B, T, F) with the input projection hoisted out of
    the scan (same MXU-first structure as LSTMLayerTorch)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        input_dim = x.shape[-1]
        k = 1.0 / jnp.sqrt(self.hidden)

        def unif(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        w_ih = self.param("w_ih", unif, (3 * self.hidden, input_dim))
        w_hh = self.param("w_hh", unif, (3 * self.hidden, self.hidden))
        b_ih = self.param("b_ih", unif, (3 * self.hidden,))
        b_hh = self.param("b_hh", unif, (3 * self.hidden,))

        gi = x @ w_ih.T + b_ih  # (B, T, 3H)
        w_hh_t = w_hh.T

        def step(h, gi_t):
            gh = h @ w_hh_t + b_hh
            ir, iz, in_ = jnp.split(gi_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((B, self.hidden), x.dtype)
        last_h, ys = jax.lax.scan(step, h0, jnp.swapaxes(gi, 0, 1))
        return jnp.swapaxes(ys, 0, 1), last_h


class GRU(nn.Module):
    """Stacked unidirectional GRU over (B, T, F)."""

    hidden: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x):
        out = x
        last_h = None
        for layer in range(self.num_layers):
            out, last_h = GRULayerTorch(self.hidden, name=f"layer{layer}")(out)
        return out, last_h
