"""Train STAND-IN frozen perception nets for the GAN convergence run.

The reference's geometry / identity supervision
(`/root/reference/Module2/models/geomgm_ifw_fore_model.py:702-713,748-752`)
relies on shipped frozen checkpoints (MobileFaceNet landmarks, Sphere20a
identity features) that are not in the mount. With random frozen nets,
geom_B / iden_B are noise through a random projection and cannot be
expected to fall (round-4 convergence run). This tool closes that
evidence gap without the shipped blobs: it trains small stand-ins on the
SAME constructed-face family the convergence dataset uses
(`tools/overfit_convergence.py`), so the GAN's geometry-supervision core
can be shown to actually train.

- ``mobilefacenet.flax.npz``: the real `models.perception.MobileFaceNet`
  trained THROUGH `train.module2.extract_landmarks` — i.e. through the
  exact crop/resize/BGR/reproject operator the GAN loss applies — to
  regress the 68 landmarks of rendered line drawings (the domain fake_B
  lives in; output_nc=1).
- ``sphere.flax.npz``: the real `models.perception.Sphere20a` trained as
  an identity classifier over constructed identities rendered as
  drawings, cropped with `crop_head_bbox` exactly as the iden_B FaceLoss
  does; the classifier head is discarded, the 5-level features kept.

Both are written in the native ``<name>.flax.npz`` format that
``train_cli --frozen_dir`` now prefers over converted torch checkpoints.

Usage:  python tools/train_standin_frozen.py [outdir]
            [--steps 3000] [--sphere_steps 1500] [--n_faces 3000]
            [--ids 48] [--seed 0]
(run on the TPU chip; CPU works but slower)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from overfit_convergence import _face_landmarks  # noqa: E402

LOAD, CROP, WIN = 286, 256, 200  # dataset defaults: load 286, crop 256,
# face window rs=.7*286=200 at rx=.15/ry=.2 (data/umlvd_ifw.py:138-142)


def _render_drawing_aug(lm, size, rng):
    """Line drawing with appearance augmentation (stroke width, gray
    level, blur, noise) so the stand-in is robust to imperfect GAN
    outputs, not just clean renders."""
    import cv2

    img = np.full((size, size), 255, np.uint8)
    thick = int(rng.integers(1, 4))
    gray = int(rng.integers(0, 90))

    def poly(idx, closed=False):
        pts = lm[list(idx)].round().astype(np.int32).reshape(-1, 1, 2)
        cv2.polylines(img, [pts], closed, gray, thick, cv2.LINE_AA)

    poly(range(0, 17))
    poly(range(17, 22)); poly(range(22, 27))              # noqa: E702
    poly(range(27, 31)); poly(range(31, 36))              # noqa: E702
    poly(range(36, 42), True); poly(range(42, 48), True)  # noqa: E702
    poly(range(48, 60), True); poly(range(60, 68), True)  # noqa: E702
    if rng.random() < 0.5:
        sigma = rng.uniform(0.3, 1.2)
        img = cv2.GaussianBlur(img, (5, 5), sigma)
    out = img.astype(np.float32)
    if rng.random() < 0.5:
        out = out + rng.normal(0, rng.uniform(2, 12), img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def _identity_landmarks(id_rng, size):
    """A per-identity face shape: the base constructed face plus
    identity-specific group deformations (jaw width, eye spacing, brow
    height, nose length, mouth width) that persist across samples."""
    base = _face_landmarks(id_rng, size, mouth_open=5.0)
    d = base.copy()
    cx = d[:, 0].mean()
    jaw_w = id_rng.uniform(0.85, 1.15)
    d[0:17, 0] = cx + (d[0:17, 0] - cx) * jaw_w
    eye_sp = id_rng.uniform(0.85, 1.15)
    for sl in (slice(36, 42), slice(42, 48)):
        ec = d[sl].mean(0)
        d[sl] += (ec - [cx, ec[1]]) * (eye_sp - 1.0)
    d[17:27, 1] += id_rng.uniform(-6, 6)          # brow height
    d[27:31, 1] = (d[27, 1]
                   + (d[27:31, 1] - d[27, 1]) * id_rng.uniform(0.85, 1.2))
    mouth_w = id_rng.uniform(0.85, 1.15)
    mc = d[48:68].mean(0)
    d[48:68, 0] = mc[0] + (d[48:68, 0] - mc[0]) * mouth_w
    return d


def _vary(lm, rng, size):
    """Within-identity variation: mouth opening, small rigid motion."""
    d = lm.copy()
    gap = rng.uniform(0, 9)
    my = d[60:68, 1].mean()
    d[60:68, 1] = my + np.sign(d[60:68, 1] - my) * gap / 2
    d[48:60, 1] += np.sign(d[48:60, 1] - d[48:60, 1].mean()) * gap * 0.25
    ang = rng.uniform(-0.06, 0.06)
    c, s = np.cos(ang), np.sin(ang)
    ctr = d.mean(0)
    d = (d - ctr) @ np.array([[c, -s], [s, c]]).T + ctr
    d += rng.uniform(-6, 6, 2)
    return d


def _to_crop(lm300, img300, rng):
    """size-300 render -> load 286 -> random 256 crop, landmark + face
    window transforms exactly as data/umlvd_ifw.py:127-150 (no flip)."""
    import cv2

    img = cv2.resize(img300, (LOAD, LOAD), interpolation=cv2.INTER_CUBIC)
    tx = int(rng.integers(0, LOAD - CROP + 1))
    ty = int(rng.integers(0, LOAD - CROP + 1))
    crop = img[ty:ty + CROP, tx:tx + CROP]
    lm = lm300 * (LOAD / 300.0) - [tx, ty]
    x1 = int(round(0.15 * LOAD - tx))
    y1 = int(round(0.20 * LOAD - ty))
    win = np.array([x1, x1 + WIN, y1, y1 + WIN], np.int32)
    return crop, lm.astype(np.float32), win


def build_landmark_set(n, seed):
    rng = np.random.default_rng(seed)
    imgs = np.empty((n, CROP, CROP), np.uint8)
    lms = np.empty((n, 68, 2), np.float32)
    wins = np.empty((n, 4), np.int32)
    for i in range(n):
        lm300 = _vary(_identity_landmarks(
            np.random.default_rng(seed * 70001 + i), 300), rng, 300)
        img300 = _render_drawing_aug(lm300, 300, rng)
        imgs[i], lms[i], wins[i] = _to_crop(lm300, img300, rng)
    return imgs, lms, wins


def build_identity_set(n_ids, per_id, seed):
    rng = np.random.default_rng(seed + 9)
    n = n_ids * per_id
    imgs = np.empty((n, CROP, CROP), np.uint8)
    wins = np.empty((n, 4), np.int32)
    labels = np.empty((n,), np.int32)
    k = 0
    for i in range(n_ids):
        base = _identity_landmarks(np.random.default_rng(seed * 31 + i), 300)
        for _ in range(per_id):
            lm300 = _vary(base, rng, 300)
            img300 = _render_drawing_aug(lm300, 300, rng)
            imgs[k], _, wins[k] = _to_crop(lm300, img300, rng)
            labels[k] = i
            k += 1
    # shuffle: samples are generated grouped by identity, and the
    # trainers hold out the FIRST n_val samples — an unshuffled split
    # would hold out whole identities the classifier never saw
    perm = rng.permutation(n)
    return imgs[perm], wins[perm], labels[perm]


def train_mobilefacenet(imgs, lms, wins, steps, seed, log):
    import jax
    import jax.numpy as jnp
    import optax

    from animateportrait_tpu.models.perception import MobileFaceNet
    from animateportrait_tpu.train.module2 import extract_landmarks

    n = imgs.shape[0]
    n_val = min(n // 2, max(64, n // 20))
    variables = MobileFaceNet().init(
        jax.random.key(seed), jnp.zeros((1, 112, 112, 3)))
    params, rest = variables["params"], {
        k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(optax.cosine_decay_schedule(1e-3, steps, 1e-2))
    opt_state = tx.init(params)

    def loss_fn(p, img_u8, lm, win):
        img = img_u8.astype(jnp.float32)[..., None] / 127.5 - 1.0
        pred = extract_landmarks({"params": p, **rest}, img, win, CROP)
        return jnp.mean(jnp.square((pred - lm) / CROP))

    @jax.jit
    def step(p, o, img_u8, lm, win):
        l, g = jax.value_and_grad(loss_fn)(p, img_u8, lm, win)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    @jax.jit
    def val_err(p, img_u8, lm, win):
        img = img_u8.astype(jnp.float32)[..., None] / 127.5 - 1.0
        pred = extract_landmarks({"params": p, **rest}, img, win, CROP)
        return jnp.mean(jnp.linalg.norm(pred - lm, axis=-1))

    rng = np.random.default_rng(seed)
    bs = 32
    t0 = time.time()
    for it in range(steps):
        idx = rng.integers(n_val, n, bs)
        params, opt_state, l = step(
            params, opt_state, jnp.asarray(imgs[idx]),
            jnp.asarray(lms[idx]), jnp.asarray(wins[idx]))
        if it % 200 == 0 or it == steps - 1:
            ve = float(val_err(params, jnp.asarray(imgs[:n_val]),
                               jnp.asarray(lms[:n_val]),
                               jnp.asarray(wins[:n_val])))
            log(f"[mfn {it:5d}] loss {float(l):.3e} "
                f"val px-err {ve:.2f} NME {ve / WIN * 100:.2f}% "
                f"({time.time() - t0:.0f}s)")
    ve = float(val_err(params, jnp.asarray(imgs[:n_val]),
                       jnp.asarray(lms[:n_val]), jnp.asarray(wins[:n_val])))
    return {"params": params, **rest}, ve


def train_sphere(imgs, wins, labels, n_ids, steps, seed, log):
    import jax
    import jax.numpy as jnp
    import optax

    from animateportrait_tpu.models.perception import (Sphere20a,
                                                       crop_head_bbox)

    n = imgs.shape[0]
    n_val = min(n // 2, max(64, n // 10))
    sphere = Sphere20a()
    variables = sphere.init(jax.random.key(seed),
                            jnp.zeros((1, 112, 96, 3)))
    params = variables["params"]
    kh = jax.random.normal(jax.random.key(seed + 1), (512, n_ids)) * 0.02
    tx = optax.adam(optax.cosine_decay_schedule(2e-4, steps, 1e-2))
    opt_state = tx.init((params, kh))

    def crops(img_u8, win):
        img = img_u8.astype(jnp.float32)[..., None] / 127.5 - 1.0
        return crop_head_bbox(jnp.repeat(img, 3, -1), win)

    def cos_logits(f, w, scale=16.0):
        # normalized (cosine) logits: raw fc5 magnitudes explode the CE
        # with plain softmax on this from-scratch PReLU stack (measured:
        # CE rose past chance at lr 5e-4); the sphereface-style
        # normalization keeps the logit scale fixed
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-6)
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-6)
        return scale * (f @ w)

    def loss_fn(pw, img_u8, win, lab):
        p, w = pw
        feats = sphere.apply({"params": p}, crops(img_u8, win))
        ce = optax.softmax_cross_entropy_with_integer_labels(
            cos_logits(feats[4], w), lab).mean()
        # feature-scale anchor: cosine CE is scale-invariant, so without
        # this the raw feature magnitudes drift unboundedly (first
        # attempt reached O(1e4), making the downstream unweighted-L1
        # FaceLoss explode to ~75k in the GAN run). Penalize each
        # feature level's log-RMS toward 0 => every level lands at
        # RMS ~1, the scale the reference's FaceLoss operates at
        # (iden_B ~ 2.8 with shipped weights).
        fs = sum(jnp.square(jnp.log(
            jnp.sqrt(jnp.mean(jnp.square(f)) + 1e-12))) for f in feats)
        return ce + 0.05 * fs

    @jax.jit
    def step(pw, o, img_u8, win, lab):
        l, g = jax.value_and_grad(loss_fn)(pw, img_u8, win, lab)
        up, o = tx.update(g, o)
        return optax.apply_updates(pw, up), o, l

    @jax.jit
    def val_acc(pw, img_u8, win, lab):
        p, w = pw
        feats = sphere.apply({"params": p}, crops(img_u8, win))
        return jnp.mean((jnp.argmax(cos_logits(feats[4], w), -1) == lab)
                        .astype(jnp.float32))

    rng = np.random.default_rng(seed)
    bs = 32
    pw = (params, kh)
    t0 = time.time()
    for it in range(steps):
        idx = rng.integers(n_val, n, bs)
        pw, opt_state, l = step(pw, opt_state, jnp.asarray(imgs[idx]),
                                jnp.asarray(wins[idx]),
                                jnp.asarray(labels[idx]))
        if it % 200 == 0 or it == steps - 1:
            acc = float(val_acc(pw, jnp.asarray(imgs[:n_val]),
                                jnp.asarray(wins[:n_val]),
                                jnp.asarray(labels[:n_val])))
            log(f"[sphere {it:5d}] ce {float(l):.3f} val id-acc "
                f"{acc * 100:.1f}% ({time.time() - t0:.0f}s)")
    acc = float(val_acc(pw, jnp.asarray(imgs[:n_val]),
                        jnp.asarray(wins[:n_val]),
                        jnp.asarray(labels[:n_val])))
    feats = sphere.apply({"params": pw[0]},
                         crops(jnp.asarray(imgs[:32]),
                               jnp.asarray(wins[:32])))
    rms = [float(jnp.sqrt(jnp.mean(jnp.square(f)))) for f in feats]
    log("[sphere] feature RMS per level: "
        + " ".join(f"{r:.3f}" for r in rms)
        + " (FaceLoss operates on raw L1 of these)")
    return {"params": pw[0]}, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/standin_frozen")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--sphere_steps", type=int, default=1500)
    ap.add_argument("--n_faces", type=int, default=3000)
    ap.add_argument("--ids", type=int, default=48)
    ap.add_argument("--per_id", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_mfn", action="store_true",
                    help="keep an existing mobilefacenet.flax.npz")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    log_path = os.path.join(args.outdir, "train_log.txt")
    logf = open(log_path, "a")

    def log(msg):
        print(msg, flush=True)
        print(msg, file=logf, flush=True)

    from animateportrait_tpu.io.checkpoint import save_flax_npz
    from animateportrait_tpu.utils.observe import enable_compile_cache
    enable_compile_cache("/tmp/jax_cache")

    ve = None
    if not args.skip_mfn:
        log(f"[data] rendering {args.n_faces} landmark faces...")
        imgs, lms, wins = build_landmark_set(args.n_faces, args.seed)
        mfn_vars, ve = train_mobilefacenet(imgs, lms, wins, args.steps,
                                           args.seed, log)
        save_flax_npz(os.path.join(args.outdir, "mobilefacenet.flax.npz"),
                      mfn_vars)
        log(f"[mfn] saved; held-out px-err {ve:.2f} "
            f"(NME {ve / WIN * 100:.2f}% of the {WIN}px face window)")

    log(f"[data] rendering {args.ids}x{args.per_id} identity faces...")
    id_imgs, id_wins, id_labels = build_identity_set(
        args.ids, args.per_id, args.seed)
    sph_vars, acc = train_sphere(id_imgs, id_wins, id_labels, args.ids,
                                 args.sphere_steps, args.seed, log)
    save_flax_npz(os.path.join(args.outdir, "sphere.flax.npz"), sph_vars)
    log(f"[sphere] saved; held-out identity accuracy {acc * 100:.1f}%")

    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump({"mfn_val_px_err": ve,
                   "mfn_nme_pct": None if ve is None else ve / WIN * 100,
                   "sphere_val_acc": acc, "steps": args.steps,
                   "sphere_steps": args.sphere_steps}, f, indent=1)


if __name__ == "__main__":
    main()
