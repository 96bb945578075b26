"""RAPT-parity evidence for the f0 substitution on real speech.

The reference extracts f0 with pysptk's RAPT (extract_f0_func.py:74).
pysptk is not installable here, so the golden is an independent NumPy
implementation of Talkin's RAPT (tests/rapt_golden.py: two-pass NCCF +
Viterbi) — deliberately sharing no code or structure with the
framework's jittable tracker — run on the reference's own example
speech (/root/reference/examples/female12.wav) through the reference's
exact preprocessing chain.

Measured on 2026-08-19 after the round-3 tracker upgrade (full RAPT DP
with an explicit unvoiced state; absolute a_fact floor; tuned weights —
the bounds below assert these with margin):
  female band (100-600): voicing agreement 0.921, common-voiced median
    |dHz| 1.97, octave-scale (ratio>1.5) disagreement 6.4%;
  male band (50-250, 1.6x-stretched clip): agreement 0.928, median
    |dHz| 1.02, octave disagreement 9.7%.
An independent harmonic-comb attribution of the octave-disagreement
frames splits them roughly evenly between the two trackers (male band:
ours 28 / golden 34 / tie 19) — ambiguous frames, not a systematic
tracker error; the male test asserts that attribution directly, and
bounds our comb-confirmed true octave errors at < 5% of common-voiced
frames.

Why the raw male-band cross-tracker disagreement stays ~9-10% (round-4
investigation, 2026-08-19): a 24-point grid over the DP weights
(freq_wt 0.1-0.3 x doubl_c 0.35-0.7 x lag_wt 0.2-0.3) moves it only
9.72% -> 9.08%, and only by trading away voicing agreement
(0.928 -> 0.916); n_cands 12->20 changes nothing (the right candidate
is already in the set), and longer NCCF frames (320-480) make every
metric worse. The disagreement is therefore not a transition-weight
deficit of our tracker: it is the two trackers each independently
resolving genuinely bistable frames — band-edge frames near 2x lo
where BOTH f and f/2 lie in-band and the NCCF scores near-ties (RAPT's
own published behavior in this regime). The decisive evidence is the
known-ground-truth test below
(test_true_octave_errors_on_resynthesized_male): on a male-register
clip whose f0 is known by construction, OUR true octave-error rate is
3.4% and the GOLDEN's own is 2.3% — individually both trackers are
fine; their mutual disagreement (~9%) double-counts each tracker's
independent coin-flips on ambiguous frames (3.4% + 2.3% + ambiguity
overlap), which no DP tuning can reconcile.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from animateportrait_tpu.ops import f0 as f0_ops
from animateportrait_tpu.ops.spectral import (
    quantize_f0_onehot, speaker_normalize_f0)
from tests.rapt_golden import rapt

WAV = "/root/reference/examples/female12.wav"


def _reference_preproc():
    """The chain rapt sees in extract_f0_func.py:95-127: channel 0,
    odd-length fixup, 30 Hz 5th-order butter filtfilt, 0.95 gain +
    RandomState(0) dither."""
    from scipy import signal
    from scipy.io import wavfile

    sr, wav = wavfile.read(WAV)
    x = np.asarray(wav, np.float64)
    if x.ndim > 1:
        x = x[:, 0]
    x = x / 32768.0
    if x.shape[0] % 256 == 0:
        x = np.concatenate([x, [1e-6]])
    b, a = signal.butter(5, 30 / (sr / 2), "high")
    y = signal.filtfilt(b, a, x)
    w = y * 0.95 + (np.random.RandomState(0).rand(len(y)) - 0.5) * 1e-6
    return w, sr


def test_golden_rapt_tracks_synthetic_tone():
    """The golden itself locks to a vibrato tone with silence gaps."""
    sr, hop = 16000, 256
    t = np.arange(sr * 2) / sr
    f = 180 + 15 * np.sin(2 * np.pi * 3 * t)
    x = np.sin(2 * np.pi * np.cumsum(f) / sr) * 0.3
    x[:3000] = 0
    x[20000:23000] = 0
    lf = rapt(x * 32768, sr, hop, 100, 600)
    v = lf > -1e9
    hz = np.exp(lf[v])
    assert 0.7 < v.mean() < 0.9
    assert hz.min() > 160 and hz.max() < 200
    assert abs(hz.mean() - 180) < 5


@pytest.mark.slow
def test_nccf_tracker_vs_rapt_golden_on_real_speech():
    """Quantified substitution error of ops/f0.track_f0 vs RAPT on
    female12.wav, female gender bounds (lo=100, hi=600) — compared on
    the speaker-normalized 257-bin encoding AutoVC actually consumes
    (utils.py:95-146)."""
    w, sr = _reference_preproc()

    lf_g = rapt(w * 32768, sr, 256, 100, 600)
    vg = lf_g > -1e9
    lf_o, vo = f0_ops.track_f0(jnp.asarray(w, jnp.float32), sr=sr,
                               hop=256, lo=100.0, hi=600.0)
    lf_o, vo = np.asarray(lf_o), np.asarray(vo)
    assert lf_g.shape == lf_o.shape

    # voicing decisions agree on the large majority of frames
    agreement = (vg == vo).mean()
    assert agreement >= 0.90, agreement

    both = vg & vo
    assert both.sum() > 300  # the comparison is not vacuous

    # voiced-frame Hz error: tight in the median; a bounded minority of
    # ambiguous frames may disagree at octave scale (verified
    # independently to split evenly between the two trackers)
    err = np.abs(np.exp(lf_g[both]) - np.exp(lf_o[both]))
    assert np.median(err) <= 4.0, np.median(err)
    octave = (np.exp(np.abs(lf_g[both] - lf_o[both])) > 1.5).mean()
    assert octave <= 0.10, octave

    # the downstream encoding: speaker-normalized, 257-bin one-hot
    ng = np.asarray(speaker_normalize_f0(jnp.asarray(lf_g, jnp.float32),
                                         jnp.asarray(vg)))
    no = np.asarray(speaker_normalize_f0(jnp.asarray(lf_o, jnp.float32),
                                         jnp.asarray(vo)))
    qg = np.argmax(np.asarray(quantize_f0_onehot(jnp.asarray(ng))), -1)
    qo = np.argmax(np.asarray(quantize_f0_onehot(jnp.asarray(no))), -1)
    bins = np.abs(qg[both].astype(int) - qo[both].astype(int))
    assert np.median(bins) <= 6, np.median(bins)
    assert (bins <= 8).mean() >= 0.70, (bins <= 8).mean()


def _male_speech():
    """Male-range real speech derived from the reference's own example:
    resample_poly(8, 5) stretches female12.wav by 1.6x at a fixed sample
    rate, scaling f0 by 0.625 (~150-300 Hz -> ~95-190 Hz) into the
    reference's male band (extract_f0_func.py:52-56: lo=50, hi=250) —
    real glottal excitation, not a synthetic tone."""
    from scipy import signal

    w, sr = _reference_preproc()
    return signal.resample_poly(w, 8, 5), sr


@pytest.mark.slow
def test_nccf_tracker_vs_rapt_golden_male_band():
    """Same quantified comparison on the male gender branch (lo=50,
    hi=250): the 50-250 Hz band exercises long lags (64-320 samples)
    and the octave ambiguity at the band's bottom edge."""
    w, sr = _male_speech()
    lf_g = rapt(w * 32768, sr, 256, 50, 250)
    vg = lf_g > -1e9
    lf_o, vo = f0_ops.track_f0(jnp.asarray(w, jnp.float32), sr=sr,
                               hop=256, lo=50.0, hi=250.0)
    lf_o, vo = np.asarray(lf_o), np.asarray(vo)
    assert lf_g.shape == lf_o.shape

    agreement = (vg == vo).mean()
    assert agreement >= 0.90, agreement
    both = vg & vo
    assert both.sum() > 300
    err = np.abs(np.exp(lf_g[both]) - np.exp(lf_o[both]))
    assert np.median(err) <= 3.0, np.median(err)
    octave = (np.exp(np.abs(lf_g[both] - lf_o[both])) > 1.5).mean()
    assert octave <= 0.12, octave

    # Attribute the octave disagreements with an 8-harmonic comb: on each
    # disagreeing frame, whichever tracker's f0 aligns the comb with more
    # spectral energy is "right". The attribution must stay a rough
    # split (measured 2026-08-19: ours 28 / golden 34 / tie 19 of 81) —
    # ambiguous frames, not a systematic error of ours — and our TRUE
    # octave errors (comb clearly sides with the golden) must be < 5%
    # of common-voiced frames (measured 4.9%).
    octf = np.nonzero(both & (np.abs(lf_g - lf_o) > np.log(1.5)))[0]
    win = 1024
    ours_right = gold_right = 0
    for t in octf:
        s = t * 256
        seg = w[max(0, s - win // 2):s + win // 2]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg)), 4096))
        freqs = np.fft.rfftfreq(4096, 1 / sr)

        def comb(f):
            return sum(
                spec[max(0, i - 2):i + 3].max()
                for h in range(1, 9)
                for i in [int(np.argmin(np.abs(freqs - h * f)))])

        cg, co = comb(np.exp(lf_g[t])), comb(np.exp(lf_o[t]))
        if co > 1.1 * cg:
            ours_right += 1
        elif cg > 1.1 * co:
            gold_right += 1
    assert ours_right >= 0.5 * gold_right, (ours_right, gold_right)
    assert gold_right / max(both.sum(), 1) < 0.05, gold_right


def _resynth_male(sr=16000):
    """Male-register speech with KNOWN f0: female12's golden track,
    halved (~75-150 Hz, squarely in the reference male band 50-250),
    drives a 6-harmonic source shaped by the original's RMS envelope —
    glottal-like excitation whose per-frame ground truth we constructed."""
    w, _ = _reference_preproc()
    lf = rapt(w * 32768, sr, 256, 100, 600)
    v = lf > -1e9
    hz = np.where(v, np.exp(np.where(v, lf, 0.0)) * 0.5, 0.0)
    n = min(len(hz) * 256, len(w))
    f_s = np.repeat(hz, 256)[:n]
    env = np.sqrt(np.convolve(w[:n] ** 2, np.ones(512) / 512, "same"))
    ph = 2 * np.pi * np.cumsum(f_s) / sr
    x = np.zeros(n)
    for h, a in [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25), (5, 0.15),
                 (6, 0.1)]:
        x += a * np.sin(h * ph)
    x *= (f_s > 0) * env * 3.0
    x += 0.001 * np.random.RandomState(0).standard_normal(n)
    return x, hz  # (samples, per-frame GT Hz; 0 = unvoiced)


@pytest.mark.slow
def test_true_octave_errors_on_resynthesized_male():
    """TRUE accuracy (vs construction ground truth, not vs the golden)
    on the second male-band clip construction: our tracker's octave
    errors must be < 5% of GT-voiced frames it marks voiced (measured
    2026-08-19: ours 3.4%, the RAPT golden's own 2.3% — the mutual
    ~9% disagreement in the stretched-clip test double-counts each
    tracker's independent ambiguous-frame flips)."""
    x, gt_hz = _resynth_male()
    sr = 16000
    lf_o, vo = f0_ops.track_f0(jnp.asarray(x, jnp.float32), sr=sr,
                               hop=256, lo=50.0, hi=250.0)
    lf_o, vo = np.asarray(lf_o), np.asarray(vo)
    T = min(len(gt_hz), len(lf_o))
    gt, lf_o, vo = gt_hz[:T], lf_o[:T], vo[:T]
    vt = gt > 0

    agreement = (vt == vo).mean()
    assert agreement >= 0.90, agreement
    both = vt & vo
    assert both.sum() > 300
    ratio = np.exp(np.abs(lf_o[both] - np.log(gt[both])))
    true_oct = (ratio > 1.5).mean()
    assert true_oct < 0.05, true_oct
    med = np.median(np.abs(np.exp(lf_o[both]) - gt[both]))
    assert med <= 2.0, med

    # calibration: the golden itself makes octave errors of the same
    # order on this clip — the mutual-disagreement metric above is
    # tracker ambiguity, not our tracker's deficit
    lf_g = rapt(x * 32768, sr, 256, 50, 250)
    vg = lf_g > -1e9
    bg = vt[:len(lf_g)] & vg[:T]
    gold_oct = (np.exp(np.abs(lf_g[:T][bg] - np.log(gt[bg]))) > 1.5).mean()
    assert gold_oct > 0.01, gold_oct  # golden is NOT oracle-perfect here
    assert true_oct < gold_oct + 0.03, (true_oct, gold_oct)


@pytest.mark.slow
def test_autovc_mel_delta_golden_vs_ours():
    """END effect of the f0 substitution: run the SAME AutoVC generator
    (shared random weights, the real architecture) on female12 mel
    features conditioned on (a) the RAPT-golden 257-bin f0 one-hot and
    (b) ours. Two controls calibrate the delta: (c) shuffled golden f0
    (same marginal distribution, destroyed alignment — an upper
    anchor), and (d) the golden uniformly shifted +5 bins (~2% of the
    speaker's normalized pitch range — the magnitude of our median
    per-frame disagreement, applied systematically). Ours must sit at
    the shift-control's level, well below the shuffle control. A
    random-weight model treats the one-hot as a random projection (no
    bin-adjacency smoothness a trained model would have), so matching
    the equivalent-magnitude control is the right bar, not a small
    fraction of the shuffle delta.
    Measured 2026-08-19: ours 0.0369, shift5 0.0347, shuffled 0.0493."""
    import jax

    from animateportrait_tpu.models.autovc import AutoVCGenerator

    w, sr = _reference_preproc()
    n = 2048 * 256  # first ~32 s cap -> 2049 frames max; female12 shorter
    w = w[:n]
    lf_g = rapt(w * 32768, sr, 256, 100, 600)
    vg = lf_g > -1e9
    lf_o, vo = f0_ops.track_f0(jnp.asarray(w, jnp.float32), sr=sr,
                               hop=256, lo=100.0, hi=600.0)
    lf_o, vo = np.asarray(lf_o), np.asarray(vo)

    def onehot(lf, v):
        nrm = np.asarray(speaker_normalize_f0(
            jnp.asarray(lf, jnp.float32), jnp.asarray(v)))
        return np.asarray(quantize_f0_onehot(jnp.asarray(nrm)))

    oh_g, oh_o = onehot(lf_g, vg), onehot(lf_o, vo)
    rng = np.random.default_rng(0)
    oh_s = oh_g[rng.permutation(len(oh_g))]  # control: shuffled golden
    ag = oh_g.argmax(-1)  # control: +5-bin uniform shift on voiced frames
    oh_b = np.eye(257, dtype=np.float32)[
        np.where(ag > 0, np.minimum(ag + 5, 256), 0)]

    T = (len(oh_g) // 32) * 32
    mel = rng.uniform(0, 1, (1, T, 80)).astype(np.float32)
    model = AutoVCGenerator()
    key = jax.random.PRNGKey(0)
    emb = np.zeros((1, 256), np.float32)
    params = model.init(key, jnp.asarray(mel), jnp.asarray(emb),
                        jnp.asarray(emb), jnp.zeros((1, T, 257)))

    def run(oh):
        return np.asarray(model.apply(
            params, jnp.asarray(mel), jnp.asarray(emb), jnp.asarray(emb),
            jnp.asarray(oh[None, :T].astype(np.float32)))[1])

    out_g = run(oh_g)
    d_ours = np.abs(run(oh_o) - out_g).mean()
    d_shuf = np.abs(run(oh_s) - out_g).mean()
    d_bin = np.abs(run(oh_b) - out_g).mean()
    # our f0 perturbs the output like an equivalent-magnitude uniform
    # pitch offset would, and clearly less than a misaligned track
    assert d_ours < 1.25 * d_bin, (d_ours, d_bin)
    assert d_ours < 0.80 * d_shuf, (d_ours, d_shuf)
