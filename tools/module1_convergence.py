"""Trainer convergence evidence for every non-Module2-GAN trainer.

Synthetic-but-coherent overfit runs, mirroring
tools/overfit_convergence.py's role for the Module2 GAN:

- content branch (train/module1.py:build_content_train_step; reference
  Module1/src/approaches/train_content.py:80-141): audio windows whose
  energy drives a lip-opening displacement — the exact structure the
  branch is meant to learn;
- speaker-aware branch (build_speaker_aware_train_step; reference
  train_speaker_aware.py:177-339): same audio plus a head-pose
  trajectory for the quat+trans pos head;
- face_of_art heatmap net (train/face_of_art.py; reference
  deep_heatmaps_model_fusion_net.py:495-720): 4 rendered face blobs,
  NME measured before/after;
- flow regressor (train/flow_regression.py; reference
  flow_regression_model.py:119-129): landmark-pair -> constant-flow
  fields, masked EPE measured before/after;
- image translation (train/image_translation.py; reference
  Module1/src/approaches/train_image_translation.py): ResUnet+VGG
  overfit on landmark-image -> rendered-face pairs, L1 falling;
- pose transfer (train/pose_transfer.py; reference
  pose_transfer_model.py:307-321): shifted-appearance pairs, L1 falling
  and PSNR rising;
- FAN/AWing (train/fan.py; reference AdaptiveWingLoss/core): rendered
  face blobs, weighted-AWing loss and argmax-decode NME falling.

Writes first-vs-last metrics to stdout and a markdown section suitable
for CONVERGENCE.md. Run anywhere; the TPU chip makes it fast but CPU
finishes in minutes.

Usage: python tools/module1_convergence.py [--steps N] [--md out.md]
       [--only content,speaker,foa,flow,imtrans,pose,fan]
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


def run_flow(steps: int) -> tuple[float, float]:
    """Flow regressor on landmark pairs with constant ground-truth flow:
    kp2 = kp1 + shift, flow_gt = shift everywhere, all pixels visible.
    Metric: masked EPE (flow_regression_model.py:119-129)."""
    from animateportrait_tpu.train.flow_regression import (
        FlowRegConfig, build_flow_train_step, init_flow_state)

    rng = np.random.default_rng(0)
    cfg = FlowRegConfig(num_scale=3, lr=2e-4)
    state = init_flow_state(cfg, jax.random.key(0), input_nc=136,
                            size=224)
    step = jax.jit(build_flow_train_step(cfg))
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    base = np.stack([112 + 52 * np.cos(theta), 112 + 48 * np.sin(theta)],
                    -1).astype(np.float32)
    # 4 samples, each a different rigid shift: the net must map the
    # keypoint-pair encoding to its dense flow
    shifts = np.array([[6, 0], [0, 6], [-5, 4], [4, -5]], np.float32)
    kp1 = np.tile(base[None], (4, 1, 1))
    kp2 = kp1 + shifts[:, None, :]
    flow_gt = np.tile(shifts[:, None, None, :], (1, 224, 224, 1))
    vis_gt = np.ones((4, 224, 224), np.int32)  # all "visible"
    args = tuple(jnp.asarray(x) for x in (kp1, kp2, flow_gt, vis_gt))
    first = last = None
    for i in range(steps):
        state, m = step(state, *args)
        v = float(m["epe"])
        first = v if first is None else first
        last = v
    return first, last


def run_image_translation(steps: int, size: int = 64
                          ) -> tuple[float, float]:
    """ResUnet+VGG overfit: landmark-dot image (+ static face) -> the
    rendered face (the MakeItTalk texture-renderer task,
    train_image_translation.py). Metric: L1. VGG runs with random
    weights (no shipped checkpoint in the mount) — it contributes a
    valid differentiable perceptual term either way."""
    from animateportrait_tpu.models.image_translation import Vgg19Features
    from animateportrait_tpu.train.image_translation import (
        ImageTranslationConfig, build_image_translation_train_step,
        init_image_translation_state)
    from animateportrait_tpu.utils.assets import std_face_landmarks

    rng = np.random.default_rng(0)
    base = std_face_landmarks().reshape(68, 3)[:, :2]
    base = base - base.min(0)
    base = base / base.max() * (0.55 * size) + 0.22 * size
    base = base[:, ::-1]
    ins, outs = [], []
    for i in range(4):
        lms = base + rng.uniform(-2, 2, (68, 2))
        face = _render_face(lms, size)                   # target
        dots = np.zeros((size, size, 3), np.float32)     # landmark image
        iy = np.clip(lms[:, 0].astype(int), 0, size - 1)
        ix = np.clip(lms[:, 1].astype(int), 0, size - 1)
        dots[iy, ix] = 1.0
        static = _render_face(base, size)                # source texture
        ins.append(np.concatenate([dots, static], -1))
        outs.append(face)
    image_in = jnp.asarray(np.stack(ins) * 2 - 1)
    image_out = jnp.asarray(np.stack(outs) * 2 - 1)

    cfg = ImageTranslationConfig(num_downs=5, ngf=8, lr=1e-3,
                                 use_vgg=True)
    state = init_image_translation_state(cfg, jax.random.key(0),
                                         size=size)
    vgg_v = Vgg19Features().init(jax.random.key(1),
                                 jnp.zeros((1, size, size, 3)))
    step = jax.jit(build_image_translation_train_step(cfg, vgg_v))
    first = last = None
    for i in range(steps):
        state, m = step(state, image_in, image_out)
        v = float(m["l1"])
        first = v if first is None else first
        last = v
    return first, last


def run_pose_transfer(steps: int) -> tuple[float, float, float, float]:
    """Pose-transfer GAN on shifted-appearance pairs: img_2 is img_1
    rolled by the keypoint shift. Returns (l1_first, l1_last,
    psnr_first, psnr_last)."""
    from animateportrait_tpu.train.pose_transfer import (
        PoseTransferConfig, build_pt_train_step, init_pt_state)

    rng = np.random.default_rng(0)
    cfg = PoseTransferConfig(G_nf=8, G_max_nf=32, G_n_scale=3,
                             G_n_warp_scale=2, joint_nc=6, size=32,
                             D_nf=8, D_n_layers=2, lr=1e-3)
    n, s, j = 4, cfg.size, cfg.joint_nc
    img1 = rng.uniform(-1, 1, (n, s, s, 3)).astype(np.float32)
    # smooth the appearance so rolling is learnable structure, not noise
    for _ in range(2):
        img1 = (img1 + np.roll(img1, 1, 1) + np.roll(img1, 1, 2)) / 3.0
    dy = np.array([2, -2, 4, 0])
    img2 = np.stack([np.roll(img1[i], dy[i], axis=0) for i in range(n)])
    kp1 = rng.uniform(8, s - 8, (n, j, 2)).astype(np.float32)
    kp2 = kp1 + np.stack([dy, np.zeros(n)], -1)[:, None, :]
    batch = {"img_1": jnp.asarray(img1), "img_2": jnp.asarray(img2),
             "kp_1": jnp.asarray(kp1),
             "kp_2": jnp.asarray(kp2.astype(np.float32))}
    state = init_pt_state(cfg, jax.random.key(0))
    step = jax.jit(build_pt_train_step(cfg))
    l1_first = l1_last = ps_first = ps_last = None
    for i in range(steps):
        state, m = step(state, batch)
        l1, ps = float(m["loss_l1"]), float(m["PSNR"])
        if l1_first is None:
            l1_first, ps_first = l1, ps
        l1_last, ps_last = l1, ps
    return l1_first, l1_last, ps_first, ps_last


def run_fan(steps: int, size: int = 64) -> tuple[float, float]:
    """AWing FAN on rendered face blobs; metric = argmax-decode NME
    (evaluate_fan, evaler.py:21-128)."""
    from animateportrait_tpu.train.fan import (
        FANTrainConfig, build_fan_train_step, evaluate_fan,
        init_fan_state, make_fan_targets)
    from animateportrait_tpu.utils.assets import std_face_landmarks

    rng = np.random.default_rng(0)
    base = std_face_landmarks().reshape(68, 3)[:, :2]
    base = base - base.min(0)
    base = base / base.max() * (0.55 * size) + 0.22 * size
    base = base[:, ::-1]
    imgs, lms = [], []
    for i in range(4):
        lm = base + rng.uniform(-2, 2, (68, 2))
        imgs.append(_render_face(lm, size))
        lms.append(lm)
    imgs = np.stack(imgs)
    lms = np.stack(lms)

    # fan_nme / make_fan_targets take (x, y) image-pixel coords
    # (make_fan_targets divides by the stride 4 itself); lms above are
    # (y, x) for _render_face
    lms_xy = lms[:, :, ::-1].copy()
    cfg = FANTrainConfig(num_modules=1, num_landmarks=68, lr=1e-3)
    state, tx = init_fan_state(cfg, jax.random.key(0), size=size)
    nme0 = evaluate_fan(state.variables, imgs, lms_xy, cfg)
    step = build_fan_train_step(cfg, tx)
    hm = size // 4  # the FAN emits heatmaps at size/4
    gt = np.stack([make_fan_targets(lm, hm_size=hm)[0] for lm in lms_xy])
    w = np.stack([make_fan_targets(lm, hm_size=hm)[1] for lm in lms_xy])
    xb = jnp.asarray(imgs)
    gtb, wb = jnp.asarray(gt), jnp.asarray(w)
    for i in range(steps):
        state, loss = step(state, xb, gtb, wb)
    nme1 = evaluate_fan(state.variables, imgs, lms_xy, cfg)
    return nme0, nme1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--md", default="")
    ap.add_argument("--only", default="",
                    help="comma list: content,speaker,foa,flow,imtrans,"
                         "pose,fan (default: all)")
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

    sel = set(args.only.split(",")) if args.only else {
        "content", "speaker", "foa", "flow", "imtrans", "pose", "fan"}
    rows = []
    if "content" in sel:
        print("content branch ...", flush=True)
        f, l = run_content(args.steps)
        rows.append(("content L1+motion+laplacian", f, l))
        print(f"  {f:.4f} -> {l:.4f}")
    if "speaker" in sel:
        print("speaker-aware branch ...", flush=True)
        f, l = run_speaker_aware(args.steps)
        rows.append(("speaker-aware reg+lap+pos", f, l))
        print(f"  {f:.4f} -> {l:.4f}")
    if "foa" in sel:
        print("face_of_art heatmap net ...", flush=True)
        f, l = run_foa(args.steps)
        rows.append(("face_of_art valid NME (argmax decode)", f, l))
        print(f"  NME {f:.4f} -> {l:.4f}")
    if "flow" in sel:
        print("flow regressor ...", flush=True)
        f, l = run_flow(args.steps)
        rows.append(("flow_regression masked EPE", f, l))
        print(f"  EPE {f:.4f} -> {l:.4f}")
    if "imtrans" in sel:
        print("image translation ...", flush=True)
        f, l = run_image_translation(args.steps)
        rows.append(("image_translation L1 (ResUnet+VGG)", f, l))
        print(f"  L1 {f:.4f} -> {l:.4f}")
    if "pose" in sel:
        print("pose transfer ...", flush=True)
        f, l, p0, p1 = run_pose_transfer(args.steps)
        rows.append(("pose_transfer L1", f, l))
        # PSNR rises; encode as a descending row via its negation so the
        # uniform `last < first` check applies
        rows.append(("pose_transfer -PSNR (dB)", -p0, -p1))
        print(f"  L1 {f:.4f} -> {l:.4f}, PSNR {p0:.2f} -> {p1:.2f}")
    if "fan" in sel:
        print("FAN (AWing) ...", flush=True)
        f, l = run_fan(args.steps)
        rows.append(("FAN/AWing NME (argmax decode)", f, l))
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
    print(f"OK: all {len(rows)} metrics descend")
    return 0


if __name__ == "__main__":
    sys.exit(main())
