"""Jittable NCCF pitch tracker (device-side RAPT replacement).

The reference extracts f0 with ``pysptk.sptk.rapt`` (C code on the host,
extract_f0_func.py:120). RAPT itself is a two-pass NCCF + dynamic-programming
tracker with data-dependent candidate sets — a poor fit for XLA. This module
implements the same signal model as a fully batched, static-shape JAX
computation:

  - all-lag NCCF via rFFT cross-correlation (one batched FFT per utterance),
    with RAPT's ``a_fact`` damping so silence yields low correlations,
  - parabolic sub-lag refinement of top-K local maxima,
  - RAPT's dynamic program over (K voiced candidates + 1 unvoiced state)
    per frame: voicing is decided BY the DP (local unvoiced bias +
    voicing-transition costs), not by a hard threshold, and octave jumps
    between voiced frames pay the classic ``DOUBL_C`` penalty,
  - log-f0 output with the -1e10 unvoiced sentinel.

This is an intentional substitution, not a port: outputs agree with RAPT on
>= 0.92 of voicing decisions and within ~2 Hz median on voiced frames, with
octave-scale disagreements on 6-10% of common-voiced frames that a harmonic
-comb attribution splits roughly evenly between the two trackers
(tests/test_f0_golden.py quantifies all of this on real speech, both gender
bands). Downstream consumers only see the speaker-normalized,
257-bin-quantized encoding (Module1/src/autovc/utils.py:95-146) which is
robust to that difference. The DP weights (vo_bias/trans_c/freq_wt/doubl_c/
lag_wt) were tuned against the golden on the reference's own example clip;
the defaults below are NOT Talkin's table values because the cost model is
simplified (no rms-ratio/Itakura transition modulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.partial(
    jax.jit,
    static_argnames=("sr", "hop", "lo", "hi", "frame_len", "n_cands"),
)
def track_f0(
    x: jax.Array,
    sr: int = 16000,
    hop: int = 256,
    lo: float = 50.0,
    hi: float = 600.0,
    frame_len: int = 280,
    n_cands: int = 12,
    vo_bias: float = 0.08,
    trans_c: float = 0.05,
    freq_wt: float = 0.1,
    doubl_c: float = 0.35,
    lag_wt: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """Track f0 of a mono signal.

    Args:
      x: (n_samples,) float32 waveform (unit scale, i.e. wav/32768).
      lo/hi: pitch search range in Hz (reference genders: M 50-250, F 100-600,
             extract_f0_func.py:52-56).
    Returns:
      (logf0, voiced): (n_frames,) natural-log f0 with unvoiced = -1e10, and
      the boolean voicing mask. n_frames = n_samples // hop + 1, matching the
      RAPT/mel frame count used by the reference.
    """
    lag_min = int(sr / hi)
    lag_max = int(np.ceil(sr / lo))
    win = frame_len
    span = win + lag_max

    n = x.shape[0]
    n_frames = n // hop + 1
    # center frames like the STFT does (reflect pad half a correlation span)
    pad_l = win // 2
    pad_r = span  # generous right pad; masked frames beyond signal end
    xp = jnp.pad(x, (pad_l, pad_r), mode="constant")
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(span)[None, :]
    frames = xp[idx]  # (T, span)

    a = frames[:, :win]
    nfft = _next_pow2(span + win)
    fa = jnp.fft.rfft(a, n=nfft)
    ff = jnp.fft.rfft(frames, n=nfft)
    corr = jnp.fft.irfft(jnp.conj(fa) * ff, n=nfft)[:, : lag_max + 1]  # (T, L+1)

    # energy terms: e0 = ||a||^2 ; ek = sum_j f[j+k]^2 over the window.
    # RAPT's A_FACT (an ABSOLUTE energy floor: 10000 at 16-bit sample
    # scale, rescaled to the unit-amplitude input — NOT per-sample, so
    # no `win` factor) inflates the denominator so silence and very
    # low-level frames produce LOW correlations instead of 0/0 noise —
    # this is what lets the DP's unvoiced state win there.
    a_fact = 10000.0 / 32768.0 ** 2
    sq = frames * frames
    csum = jnp.cumsum(sq, axis=1)
    zeros = jnp.zeros((csum.shape[0], 1), csum.dtype)
    csum = jnp.concatenate([zeros, csum], axis=1)  # (T, span+1)
    lags_all = jnp.arange(lag_max + 1)
    ek = csum[:, lags_all + win] - csum[:, lags_all]  # (T, L+1)
    e0 = csum[:, win][:, None] - csum[:, 0][:, None]
    denom = jnp.sqrt((e0 + a_fact) * (ek + a_fact))
    nccf = corr / denom  # (T, L+1)

    # ---- candidate set: top-K NCCF local maxima inside the lag band
    # (RAPT keeps up to 20 candidates per frame)
    K = n_cands
    band = (lags_all >= lag_min) & (lags_all <= lag_max)
    left = jnp.pad(nccf[:, :-1], ((0, 0), (1, 0)),
                   constant_values=-jnp.inf)
    right = jnp.pad(nccf[:, 1:], ((0, 0), (0, 1)),
                    constant_values=-jnp.inf)
    is_max = (nccf >= left) & (nccf >= right) & band[None, :]
    cand_score = jnp.where(is_max, nccf, -jnp.inf)
    cvals, cidx = jax.lax.top_k(cand_score, K)  # (T, K)
    have = jnp.isfinite(cvals)
    cvals = jnp.where(have, cvals, 0.0)

    # parabolic sub-lag refinement per candidate
    km = jnp.clip(cidx - 1, 0, lag_max)
    kp = jnp.clip(cidx + 1, 0, lag_max)
    ym = jnp.take_along_axis(nccf, km, axis=1)
    y0 = jnp.take_along_axis(nccf, jnp.clip(cidx, 0, lag_max), axis=1)
    yp = jnp.take_along_axis(nccf, kp, axis=1)
    denom2 = ym - 2.0 * y0 + yp
    delta = jnp.where(jnp.abs(denom2) > 1e-8,
                      0.5 * (ym - yp) / denom2, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    clag = jnp.maximum(cidx.astype(jnp.float32) + delta, 1.0)

    # ---- RAPT's dynamic program (lax.scan form) over K+1 states per
    # frame: states 0..K-1 = voiced candidates, state K = unvoiced.
    #   voiced local cost:   1 - C*(1 - LAG_WT*lag/lag_max)
    #   unvoiced local cost: VO_BIAS + max(C) (cheap when all C are weak)
    #   V->V transition:     FREQ_WT*min(|d|, DOUBL_C + ||d| - ln2|) on
    #                        the log-lag jump d (octave flips pay DOUBL_C)
    #   V<->U transition:    TRANS_C (voicing-state changes are sticky)
    #   U->U transition:     0
    # Voicing falls out of the backtracked path — no hard NCCF threshold.
    local_v = jnp.where(
        have, 1.0 - cvals * (1.0 - lag_wt * clag / lag_max), 1e3)
    cmax = jnp.max(cvals, axis=1)
    local_u = vo_bias + cmax  # (T,)
    local = jnp.concatenate([local_v, local_u[:, None]], axis=1)  # (T,K+1)
    loglag = jnp.log(clag)
    ln2 = float(np.log(2.0))

    def vit_step(carry, inp):
        prev_cost, prev_loglag = carry
        loc_t, ll_t = inp
        d = jnp.abs(ll_t[:, None] - prev_loglag[None, :])  # (K, K)
        tvv = freq_wt * jnp.minimum(d, doubl_c + jnp.abs(d - ln2))
        # full (K+1, K+1) transition block
        row_u = jnp.full((1, K), trans_c)           # V(prev) -> U(next)
        col_u = jnp.full((K, 1), trans_c)           # U(prev) -> V(next)
        tc = jnp.block([[tvv, col_u], [row_u, jnp.zeros((1, 1))]])
        tot = prev_cost[None, :] + tc
        bp = jnp.argmin(tot, axis=1)
        cost = loc_t + jnp.min(tot, axis=1)
        cost = cost - jnp.min(cost)  # keep costs bounded over long tracks
        return (cost, ll_t), bp

    init = (local[0], loglag[0])
    (last_cost, _), bps = jax.lax.scan(
        vit_step, init, (local[1:], loglag[1:]))

    # backtrack: bps[t] maps the state at frame t+1 to its best
    # predecessor at frame t
    def back_step(state, bp_t):
        return bp_t[state], state

    end_state = jnp.argmin(last_cost)
    first_state, rev_states = jax.lax.scan(back_step, end_state, bps[::-1])
    states = jnp.concatenate([first_state[None], rev_states[::-1]])
    voiced = states < K
    vstate = jnp.minimum(states, K - 1)
    lag_trk = jnp.take_along_axis(clag, vstate[:, None], axis=1)[:, 0]

    f0 = sr / jnp.maximum(lag_trk, 1.0)
    f0 = jnp.clip(f0, lo, hi)
    logf0 = jnp.where(voiced, jnp.log(f0), -1e10)
    return logf0, voiced
