"""Pallas single-pass fused InstanceNorm (+ optional ReLU) for TPU.

XLA lowers InstanceNorm as reduce(mean/var) + normalize — the input
crosses HBM twice (plus one write), and a following ReLU adds another
pass when it doesn't fuse. This kernel holds one (H, W, ctile) block in
VMEM, computes the statistics, normalizes, and applies the ReLU in a
single read + write.

Measured on the v5e chip (tools/probe_instnorm.py, chained-dispatch
timing): (8,64,64,256) 1.30x / 1.63x with ReLU; (8,64,64,512) 1.14x /
1.42x — the generator's 64^2 ResNet-bottleneck chain is exactly this
shape. Blocks that don't fit the 16 MB kernel VMEM stack (the 256^2 /
128^2 stems: <=64 channels pad to 128 lanes, blowing the window to
8-32 MB) fall back to the XLA formulation; `eligible()` is the guard.

Differentiation: `pallas_call` has no autodiff rule, so the public
entry is a `jax.custom_vjp` — forward through the kernel, backward
through `jax.vjp` of the plain XLA formulation (mathematically the
same function; forwards agree to ~1e-6 f32).

MEASURED IN-GRAPH AND LOST (2026-08-19): generator forward 241.0 f/s
with the kernel vs 257.3 without (same-day baseline). The standalone op
win does not survive composition — the custom-call is a fusion barrier,
and XLA was already folding the IN normalize into neighboring
elementwise ops (residual adds, pads, conv epilogues), so the in-graph
IN cost is well below the standalone microbench. The kernel therefore
defaults OFF and remains available for isolated-IN workloads.

Env: AP_PALLAS_IN=1 enables the kernel (default off — see above).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# padded VMEM block budget: ~4 temporaries of one block must fit the
# 16 MB kernel stack -> keep a block under ~2 MB => H*W <= 4096 at a
# 128-lane-padded channel tile
_MAX_HW = 64 * 64


def _xla_instance_norm(x, eps: float, relu: bool):
    xs = x.astype(jnp.float32)
    from animateportrait_tpu.nn import env_choice
    mode = env_choice("AP_IN_STATS", "onepass",
                      ("onepass", "twopass", "matmul"))
    if mode == "matmul":
        # Statistics as MXU dots over the flattened spatial dim. The
        # round-4 device trace attributes ~8% of generator device-busy
        # to 'data formatting' copies around the IN reduces: XLA
        # relayouts the activation to spatial-minor for the (H, W)
        # reduction, then back to channel-minor for the next conv (two
        # full read+write passes of the tensor). A dot against a ones
        # vector computes the same sums in the conv's own layout; the
        # square fuses into the second dot's operand read.
        # MEASURED AND LOST on v5e (2026-08-20): generator forward
        # 251.2 f/s vs 271-273 onepass controls (-7.5%) — the two dots
        # re-read the activation from HBM (the sibling-fused onepass
        # reduce reads it once) and the relayout copies around the
        # surrounding convs persist regardless (they belong to the conv
        # emitter's internal blocked layouts, not to the reduce).
        # Kept opt-in for the ledger; see PERF.md round-5 entries.
        n, h, w, c = x.shape
        cnt = h * w
        xf = xs.reshape(n, cnt, c)
        # barrier: a CONSTANT ones operand gets algebraically folded
        # back into reduce(x) — the exact HLO whose relayout this mode
        # exists to avoid (verified: without the barrier the compiled
        # program is bit-identical to 'onepass')
        ones = jax.lax.optimization_barrier(jnp.ones((cnt,), jnp.float32))
        s1 = jnp.einsum("npc,p->nc", xf, ones,
                        preferred_element_type=jnp.float32)
        s2 = jnp.einsum("npc,p->nc", jnp.square(xf), ones,
                        preferred_element_type=jnp.float32)
        mean = (s1 / cnt)[:, None, None, :]
        var = jnp.maximum((s2 / cnt)[:, None, None, :]
                          - jnp.square(mean), 0.0)
    elif mode == "onepass":
        # E[x^2]-E[x]^2: both sums read the input once and XLA
        # sibling-fuses them into a single reduction loop — one HBM
        # pass for statistics instead of two (mean, then (x-mean)^2).
        # MEASURED WIN on v5e (2026-08-20): generator forward 271.2 f/s
        # vs 256.8/257.7 twopass same-session controls (+5.3%, beyond
        # the ~2% repeat band) — hence the default. f32 accumulation
        # over <=64k pixels of IN-scale activations keeps ~7
        # significant digits; the subtraction cancels at most ~2 of
        # them (activations are O(1) post-IN), well inside the
        # composed-chain PSNR budget. Clamp guards the var>=0 invariant
        # against that cancellation. AP_IN_STATS=twopass restores the
        # textbook mean/var formulation.
        cnt = x.shape[1] * x.shape[2]
        s1 = jnp.sum(xs, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(jnp.square(xs), axis=(1, 2), keepdims=True)
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
    else:
        mean = jnp.mean(xs, axis=(1, 2), keepdims=True)
        var = jnp.var(xs, axis=(1, 2), keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + eps)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _ctile(c: int) -> int | None:
    if c <= 128:
        return c
    if c % 128 == 0:
        return 128
    return None


def eligible(shape: tuple[int, ...]) -> bool:
    """True when the fused kernel supports this NHWC shape."""
    if os.environ.get("AP_PALLAS_IN", "0") != "1":
        return False
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    return h * w <= _MAX_HW and _ctile(c) is not None


def _kernel(x_ref, o_ref, *, eps: float, relu: bool):
    x = x_ref[...].astype(jnp.float32)              # (1, H, W, ct)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "relu", "interpret"))
def _pallas_forward(x, eps: float, relu: bool, interpret: bool = False):
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    ct = _ctile(c)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, relu=relu),
        grid=(n, c // ct),
        in_specs=[pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_fused(x, eps: float = 1e-5, relu: bool = False):
    """Fused IN(+ReLU) via the Pallas kernel; grads via the XLA form."""
    return _pallas_forward(x, eps, relu)


def _fwd(x, eps, relu):
    return _pallas_forward(x, eps, relu), x


def _bwd(eps, relu, x, g):
    _, vjp = jax.vjp(lambda v: _xla_instance_norm(v, eps, relu), x)
    return (vjp(g)[0],)


instance_norm_fused.defvjp(_fwd, _bwd)


def instance_norm(x, eps: float = 1e-5, relu: bool = False):
    """InstanceNorm(+ReLU) with f32 statistics: the Pallas fused kernel
    for eligible shapes when lowering to TPU, the XLA formulation
    otherwise. The dispatch is per LOWERING PLATFORM
    (`lax.platform_dependent`), not per process — a program traced
    under `jax.default_device(cpu)` in a TPU process (bench warmups,
    host-side inits) must not embed an uncompilable TPU kernel."""
    if not eligible(x.shape):
        return _xla_instance_norm(x, eps, relu)
    return jax.lax.platform_dependent(
        x,
        tpu=lambda v: instance_norm_fused(v, eps, relu),
        default=lambda v: _xla_instance_norm(v, eps, relu),
    )
