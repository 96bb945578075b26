"""Independent NumPy implementation of Talkin's RAPT pitch tracker.

Test-only golden used to quantify the substitution error of the
framework's jittable NCCF tracker (`animateportrait_tpu/ops/f0.py`)
against the algorithm the reference actually uses
(`pysptk.sptk.rapt`, extract_f0_func.py:74) on real speech, since
pysptk is not installable in this environment (zero egress).

This follows the published RAPT spec (D. Talkin, "A Robust Algorithm
for Pitch Tracking", in Speech Coding and Synthesis, 1995), the same
algorithm family as ESPS get_f0 from which SPTK's rapt derives:

  - first-pass NCCF on a ~2 kHz downsampled signal over the full lag
    range, local-maximum candidate generation;
  - second-pass NCCF at the original rate only around first-pass
    candidate lags, with the additive a_fact noise-floor term and
    parabolic sub-sample peak refinement;
  - Viterbi tracking over {candidates + unvoiced} per frame with
    Talkin's local cost 1 - C*(1 - beta*lag), octave-jump transition
    cost FREQ_WT*min(|d|, DOUBL_C + ||d| - ln2|), and voicing
    transition costs modulated by the inter-frame rms ratio and the
    Itakura spectral-stationarity measure.

Deliberately independent of ops/f0.py: no code or structure is shared
(this one is two-pass, candidate-based and Viterbi-smoothed; the
framework tracker is single-pass, all-lag, locally greedy).
"""
from __future__ import annotations

import numpy as np
from scipy import signal as sps

# Talkin's default parameters (RAPT paper, table 1 / get_f0 defaults)
CAND_TR = 0.3     # first-pass candidate threshold (fraction of frame max)
LAG_WT = 0.3      # local-cost lag weight (beta * max_lag)
FREQ_WT = 0.02    # voiced->voiced frequency-jump weight
VTRAN_C = 0.005   # fixed voicing transition cost
VTR_A_C = 0.5     # amplitude-modulated voicing transition cost
VTR_S_C = 0.5     # spectral-stationarity-modulated transition cost
VO_BIAS = 0.0     # voiced-state bias
DOUBL_C = 0.35    # octave-jump penalty
A_FACT = 10000.0  # NCCF noise floor (signal scaled to int16 range)
N_CANDS = 20      # max pitch candidates per frame
WIND_DUR = 0.0075  # correlation window, seconds
LPC_ORDER = 10    # order for the Itakura stationarity measure


def _nccf(x: np.ndarray, starts: np.ndarray, win: int, lags: np.ndarray,
          a_fact: float = 0.0) -> np.ndarray:
    """NCCF phi[t, k] = sum x[s:s+w] x[s+k:s+k+w] / sqrt(e0' ek') for
    every frame start s in `starts` and lag k in `lags`, with the
    additive a_fact term of RAPT's high-resolution pass."""
    n = x.shape[0]
    need = int(starts.max()) + win + int(lags.max()) + 1
    if need > n:
        x = np.concatenate([x, np.zeros(need - n, x.dtype)])
    sq = np.concatenate([[0.0], np.cumsum(x * x)])
    out = np.empty((len(starts), len(lags)), np.float64)
    e0 = sq[starts + win] - sq[starts]
    frame_idx = starts[:, None] + np.arange(win)[None, :]
    f0s = x[frame_idx]
    for j, k in enumerate(lags):
        fk = x[frame_idx + int(k)]
        num = np.einsum("tj,tj->t", f0s, fk)
        ek = sq[starts + int(k) + win] - sq[starts + int(k)]
        den = np.sqrt((e0 + a_fact) * (ek + a_fact))
        out[:, j] = num / np.maximum(den, 1e-20)
    return out


def _local_maxima(v: np.ndarray) -> np.ndarray:
    """Indices of strict-or-plateau local maxima of a 1-D array."""
    if len(v) < 3:
        return np.array([int(np.argmax(v))])
    m = (v[1:-1] >= v[:-2]) & (v[1:-1] >= v[2:])
    idx = np.nonzero(m)[0] + 1
    if len(idx) == 0:
        idx = np.array([int(np.argmax(v))])
    return idx


def _lpc(frame: np.ndarray, order: int) -> tuple[np.ndarray, float]:
    """Levinson-Durbin LPC coefficients a (1, -a1, ..) and residual
    energy for the Itakura distortion."""
    w = frame * np.hanning(len(frame))
    r = np.correlate(w, w, "full")[len(w) - 1:len(w) + order]
    a = np.zeros(order + 1)
    a[0] = 1.0
    err = r[0] + 1e-9
    for i in range(1, order + 1):
        acc = r[i] + np.dot(a[1:i], r[1:i][::-1])
        k = -acc / err
        a[1:i + 1] = a[1:i + 1] + k * a[i - 1::-1][:i]
        a[i] = k
        err *= (1.0 - k * k)
    return a, err


def _itakura_stationarity(x: np.ndarray, starts: np.ndarray,
                          win: int) -> np.ndarray:
    """Talkin's spectral stationarity S = 0.2 / (d_I - 0.8), d_I the
    Itakura distortion between consecutive analysis frames."""
    frames = [x[s:s + win] for s in starts]
    S = np.full(len(starts), 0.2 / (1.0 - 0.8 + 0.2))
    prev = None
    for t, fr in enumerate(frames):
        a, _ = _lpc(fr, LPC_ORDER)
        w = fr * np.hanning(len(fr))
        r = np.correlate(w, w, "full")[len(w) - 1:len(w) + LPC_ORDER]
        if prev is not None:
            ap, rp = prev
            # d_I = (a' R_cur a) / (a_cur' R_cur a_cur) in log form;
            # RAPT uses the ratio directly (>= 1)
            def quad(c, rr):
                acc = rr[0] * np.dot(c, c)
                for k in range(1, LPC_ORDER + 1):
                    acc += 2.0 * rr[k] * np.dot(c[:-k], c[k:])
                return max(acc, 1e-12)
            d_i = quad(ap, r) / quad(a, r)
            d_i = max(d_i, 1.0)
            S[t] = 0.2 / (d_i - 0.8)
        prev = (a, r)
    return np.clip(S, 0.0, 1.0)


def rapt(x: np.ndarray, fs: int, hop: int, f0_min: float = 50.0,
         f0_max: float = 600.0) -> np.ndarray:
    """RAPT log-f0 track of a mono signal.

    Returns (n_frames,) natural-log f0 with unvoiced frames = -1e10
    (the shape/encoding of ``sptk.rapt(..., otype=2)`` that
    extract_f0_func.py consumes); n_frames = len(x)//hop + 1.
    """
    x = np.asarray(x, np.float64)
    n_frames = len(x) // hop + 1

    # ---- first pass: downsampled NCCF over the full lag range
    k_ds = max(1, int(round(fs / (4.0 * f0_max))))
    xd = sps.resample_poly(x, 1, k_ds) if k_ds > 1 else x
    fs_d = fs / k_ds
    win_d = max(2, int(round(WIND_DUR * fs_d)))
    lag_lo_d = max(1, int(np.floor(fs_d / f0_max)))
    lag_hi_d = int(np.ceil(fs_d / f0_min)) + 1
    starts_d = np.minimum(
        (np.arange(n_frames) * hop / k_ds).astype(int),
        max(0, len(xd) - 1))
    lags_d = np.arange(lag_lo_d, lag_hi_d + 1)
    phi1 = _nccf(xd, starts_d, win_d, lags_d)

    # ---- second pass: full-rate NCCF around first-pass candidates
    win = int(round(WIND_DUR * fs))
    lag_lo = max(2, int(np.floor(fs / f0_max)))
    lag_hi = int(np.ceil(fs / f0_min)) + 1
    starts = np.arange(n_frames) * hop
    # a_fact is an absolute energy floor specified for int16-range
    # signals — callers should pass x scaled like the reference does
    # (wav * 32768, extract_f0_func.py:74); it only suppresses spurious
    # correlations in near-silence
    a_fact = A_FACT

    cands_lag: list[np.ndarray] = []
    cands_val: list[np.ndarray] = []
    for t in range(n_frames):
        v = phi1[t]
        peaks = _local_maxima(v)
        vmax = v[peaks].max()
        peaks = peaks[v[peaks] >= CAND_TR * max(vmax, 1e-9)]
        peaks = peaks[np.argsort(v[peaks])[::-1][:N_CANDS]]
        fine_lags: list[int] = []
        for p in peaks:
            centre = int(lags_d[p]) * k_ds
            fine_lags.extend(range(centre - k_ds - 1, centre + k_ds + 2))
        fine = np.unique([l for l in fine_lags if lag_lo <= l <= lag_hi])
        if len(fine) == 0:
            cands_lag.append(np.empty(0))
            cands_val.append(np.empty(0))
            continue
        phi2 = _nccf(x, starts[t:t + 1], win, fine, a_fact)[0]
        pk = _local_maxima(phi2)
        pk = pk[np.argsort(phi2[pk])[::-1][:N_CANDS]]
        lags_f = []
        vals_f = []
        for p in pk:
            lag = float(fine[p])
            val = float(phi2[p])
            if 0 < p < len(fine) - 1 and fine[p + 1] - fine[p - 1] == 2:
                ym, y0, yp = phi2[p - 1], phi2[p], phi2[p + 1]
                d2 = ym - 2 * y0 + yp
                if abs(d2) > 1e-12:
                    dd = np.clip(0.5 * (ym - yp) / d2, -0.5, 0.5)
                    lag += float(dd)
                    val = float(y0 - 0.25 * (ym - yp) * dd)
            lags_f.append(lag)
            vals_f.append(min(val, 1.0))
        cands_lag.append(np.asarray(lags_f))
        cands_val.append(np.asarray(vals_f))

    # ---- voicing-transition modulators
    eng = np.array([
        np.sqrt(np.mean(x[min(s, max(0, len(x) - win)):
                          min(s, max(0, len(x) - win)) + win] ** 2) + 1e-20)
        for s in starts])
    rr = eng / np.maximum(np.concatenate([[eng[0]], eng[:-1]]), 1e-20)
    S = _itakura_stationarity(x, np.minimum(starts, max(0, len(x) - win)),
                              win)

    # ---- Viterbi over candidates + unvoiced
    beta = LAG_WT / float(lag_hi)
    LN2 = np.log(2.0)
    # state 0 = unvoiced; states 1.. = voiced candidates
    prev_cost = None
    backptr: list[np.ndarray] = []
    states_lag: list[np.ndarray] = []
    for t in range(n_frames):
        lags_t, vals_t = cands_lag[t], cands_val[t]
        cmax = vals_t.max() if len(vals_t) else 0.0
        local = np.concatenate([
            [VO_BIAS + cmax],
            1.0 - vals_t * (1.0 - beta * lags_t)])
        if prev_cost is None:
            cost = local.copy()
            backptr.append(np.zeros(len(local), np.int32))
        else:
            plags = states_lag[-1]
            ns, ps = len(local), len(prev_cost)
            trans = np.zeros((ns, ps))
            # voiced->voiced octave-aware frequency-jump cost
            if ns > 1 and ps > 1:
                d = np.abs(np.log(lags_t[:, None] / plags[None, 1:]))
                trans[1:, 1:] = FREQ_WT * np.minimum(
                    d, DOUBL_C + np.abs(d - LN2))
            # voicing changes, modulated by rms ratio + stationarity
            vtr = VTRAN_C + VTR_S_C * S[t]
            if ns > 1:
                trans[1:, 0] = vtr + VTR_A_C / max(rr[t], 1e-3)
            trans[0, 1:] = vtr + VTR_A_C * rr[t]
            tot = prev_cost[None, :] + trans
            backptr.append(np.argmin(tot, axis=1).astype(np.int32))
            cost = local + tot[np.arange(ns), backptr[-1]]
        states_lag.append(np.concatenate([[0.0], lags_t]))
        prev_cost = cost

    # backtrack
    path = np.empty(n_frames, np.int32)
    path[-1] = int(np.argmin(prev_cost))
    for t in range(n_frames - 1, 0, -1):
        path[t - 1] = backptr[t][path[t]]
    logf0 = np.full(n_frames, -1e10)
    for t in range(n_frames):
        if path[t] > 0:
            logf0[t] = np.log(fs / states_lag[t][path[t]])
    return logf0
