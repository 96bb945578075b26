"""Module1 + face_of_art trainer convergence evidence.

Synthetic-but-coherent overfit runs for the three non-GAN trainers,
mirroring tools/overfit_convergence.py's role for the Module2 GAN:

- content branch (train/module1.py:build_content_train_step; reference
  Module1/src/approaches/train_content.py:80-141): audio windows whose
  energy drives a lip-opening displacement — the exact structure the
  branch is meant to learn;
- speaker-aware branch (build_speaker_aware_train_step; reference
  train_speaker_aware.py:177-339): same audio plus a head-pose
  trajectory for the quat+trans pos head;
- face_of_art heatmap net (train/face_of_art.py; reference
  deep_heatmaps_model_fusion_net.py:495-720): 4 rendered face blobs,
  NME measured before/after.

Writes first-vs-last loss means (and FOA NME) to stdout and appends a
markdown section suitable for CONVERGENCE.md. Run anywhere; the TPU
chip makes it fast but CPU finishes in minutes.

Usage: python tools/module1_convergence.py [--steps N] [--md out.md]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _window(sig: np.ndarray, w: int) -> np.ndarray:
    """(T+w, d) -> (T, w, d) sliding windows, step 1."""
    T = sig.shape[0] - w
    return np.stack([sig[i:i + w] for i in range(T)])


def synth_audio_landmarks(T: int = 140, w: int = 18, seed: int = 0):
    """Coherent audio/landmark pair: au energy e(t) opens the mouth."""
    from animateportrait_tpu.utils.assets import std_face_landmarks

    rng = np.random.default_rng(seed)
    t = np.arange(T + w, dtype=np.float64)
    e = 0.5 + 0.5 * np.sin(2 * np.pi * t / 25.0)          # openness
    au = (e[:, None]
          * np.abs(np.sin(np.linspace(0, np.pi, 80)))[None, :]
          + 0.05 * rng.standard_normal((T + w, 80)))
    std = std_face_landmarks().reshape(68, 3)
    fls = np.tile(std.reshape(1, 204), (T + w, 1))
    # open the mouth: lower lip y (index 3*i+1) moves with e
    lower_lip = [55, 56, 57, 58, 59, 65, 66, 67]
    for i in lower_lip:
        fls[:, 3 * i + 1] += 0.08 * e
    aus = _window(au, w).astype(np.float32)               # (T, w, 80)
    flsw = _window(fls, w).astype(np.float32)             # (T, w, 204)
    face_id = std.reshape(1, 204).astype(np.float32)
    return aus, flsw, face_id, e[:T]


def run_content(steps: int) -> tuple[float, float]:
    from animateportrait_tpu.train.module1 import (
        ContentConfig, build_content_train_step, init_content_state)

    aus, fls, face_id, _ = synth_audio_landmarks()
    cfg = ContentConfig(lr=1e-3)
    state = init_content_state(cfg, jax.random.key(0))
    step = jax.jit(build_content_train_step(cfg))
    a, f, fi = jnp.asarray(aus), jnp.asarray(fls), jnp.asarray(face_id)
    first = last = None
    for i in range(steps):
        state, m = step(state, f, a, fi)
        v = float(m["loss"])
        first = v if first is None else first
        last = v
    return first, last


def run_speaker_aware(steps: int) -> tuple[float, float]:
    from animateportrait_tpu.train.module1 import (
        SpeakerAwareConfig, build_speaker_aware_train_step,
        init_speaker_aware_state)

    aus, fls, face_id, e = synth_audio_landmarks()
    T = aus.shape[0]
    rng = np.random.default_rng(1)
    embs = np.tile(rng.standard_normal((1, 256)).astype(np.float32) * 0.1,
                   (T, 1))
    reg_fls_gt = fls[:, 0, :]
    # smooth head pose: yaw follows a slow sine; quat ~ [cos, 0, sin, 0]
    yaw = 0.1 * np.sin(2 * np.pi * np.arange(T) / 60.0)
    rot_quat = np.stack([np.cos(yaw / 2), np.zeros(T), np.sin(yaw / 2),
                         np.zeros(T)], 1).astype(np.float32)
    rot_trans = np.zeros((T, 3, 4), np.float32)
    rot_trans[:, 0, 3] = 5.0 * yaw
    cfg = SpeakerAwareConfig(lr=1e-3)
    state = init_speaker_aware_state(cfg, jax.random.key(0))
    step = jax.jit(build_speaker_aware_train_step(cfg))
    args = tuple(jnp.asarray(x) for x in
                 (aus, embs, face_id, reg_fls_gt, rot_quat, rot_trans))
    first = last = None
    for i in range(steps):
        state, m = step(state, *args, jax.random.key(i))
        v = float(m["loss"])
        first = v if first is None else first
        last = v
    return first, last


def _render_face(lms_yx: np.ndarray, size: int) -> np.ndarray:
    """Shaded blob + dark strokes at the landmarks — a deterministic
    image whose structure the heatmap net can localize."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    c = lms_yx.mean(0)
    img = 0.8 * np.exp(-(((yy - c[0]) / (size * 0.4)) ** 2
                         + ((xx - c[1]) / (size * 0.33)) ** 2))
    for y, x in lms_yx:
        img += -0.6 * np.exp(-(((yy - y) ** 2 + (xx - x) ** 2)
                               / (2 * 1.5 ** 2)))
    img = np.clip(img + 0.1, 0, 1)
    return np.repeat(img[..., None], 3, axis=2).astype(np.float32)


def run_foa(steps: int, size: int = 64) -> tuple[float, float]:
    from animateportrait_tpu.data.face_of_art import FOAItem
    from animateportrait_tpu.train.face_of_art import (
        FOATrainConfig, evaluate_foa, init_foa_state, train_foa)
    from animateportrait_tpu.utils.assets import std_face_landmarks

    rng = np.random.default_rng(0)
    base = std_face_landmarks().reshape(68, 3)[:, :2]
    base = base - base.min(0)
    base = base / base.max() * (0.55 * size) + 0.22 * size
    base = base[:, ::-1]
    items = []
    for i in range(4):
        lms = base + rng.uniform(-2, 2, (68, 2))
        items.append(FOAItem(path=f"synt{i}", lms=lms,
                             image=_render_face(lms, size)))
    cfg = FOATrainConfig(lr=3e-4)
    state0 = init_foa_state(cfg, jax.random.key(0), size=size)
    imgs = np.stack([it.image for it in items])
    lms = np.stack([it.lms for it in items])
    nme0 = evaluate_foa(state0, cfg, imgs, lms)
    state = train_foa(items, cfg, train_iter=steps, batch_size=2,
                      image_size=size, sigma=4.0, augment=False,
                      print_every=max(steps // 4, 1), seed=0,
                      state=state0, log_fn=lambda m: print("  " + m))
    nme1 = evaluate_foa(state, cfg, imgs, lms)
    return nme0, nme1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--md", default="")
    # jax arrives pre-imported with the ambient platform (axon tunnel)
    # already resolved, so env vars are too late — select explicitly
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default) | tpu | keep (ambient)")
    args = ap.parse_args(argv)
    if args.platform != "keep":
        jax.config.update("jax_platforms",
                          {"tpu": "axon"}.get(args.platform,
                                              args.platform))
    print("devices:", jax.devices(), flush=True)

    rows = []
    print("content branch ...", flush=True)
    f, l = run_content(args.steps)
    rows.append(("content L1+motion+laplacian", f, l))
    print(f"  {f:.4f} -> {l:.4f}")
    print("speaker-aware branch ...", flush=True)
    f, l = run_speaker_aware(args.steps)
    rows.append(("speaker-aware reg+lap+pos", f, l))
    print(f"  {f:.4f} -> {l:.4f}")
    print("face_of_art heatmap net ...", flush=True)
    f, l = run_foa(args.steps)
    rows.append(("face_of_art valid NME (argmax decode)", f, l))
    print(f"  NME {f:.4f} -> {l:.4f}")

    ok = all(l < f for _, f, l in rows)
    md = ["| trainer / metric | first | last |", "|---|---|---|"]
    md += [f"| {n} | {f:.4f} | {l:.4f} |" for n, f, l in rows]
    body = "\n".join(md)
    print(body)
    if args.md:
        with open(args.md, "w") as fp:
            fp.write(body + "\n")
    if not ok:
        print("FAIL: a trainer did not descend", file=sys.stderr)
        return 1
    print("OK: all three trainers descend")
    return 0


if __name__ == "__main__":
    sys.exit(main())
