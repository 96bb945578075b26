"""Module2 GAN convergence evidence (VERDICT r2 Next #3).

Builds a small CONSTRUCTED dataset whose drawings are a deterministic
function of face geometry (white background + black strokes rendered
from the 68 landmarks; photos are shaded face blobs with the same
geometry), then drives the REAL `train_cli` path — the full 5-D GAN step
(G x2 + D_A/D_A_l/D_A_le/D_A_ll/D_A_coh + frozen nets + TPS warps + both
Adams + in-state image pool) — for a few hundred steps at reduced
resolution, interrupting once mid-run and resuming with
``--continue_train`` to exercise checkpoint resume.

Afterwards it parses ``metrics.jsonl`` and writes ``CONVERGENCE.md``
with first-vs-last-window loss means, asserting the trainable losses
(warp_B, geom_B, iden_B) actually trend down and the adversarial pair
stays in the healthy lsgan band — i.e. the GAN *trains*, not just steps
(reference loop semantics: Module2/train.py:19-63).

Usage:  python tools/overfit_convergence.py [workdir] [--steps N]
        (run on the TPU chip; CPU works but is ~50x slower)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _face_landmarks(rng, size, mouth_open):
    """A coherent 68-pt face: jaw arc, brows, nose, eyes, mouth whose
    inner-lip gap follows ``mouth_open`` (the learnable motion)."""
    cx, cy = size / 2 + rng.uniform(-8, 8), size / 2 + rng.uniform(-8, 8)
    w, h = size * 0.30, size * 0.38
    t = np.linspace(0, np.pi, 17)
    jaw = np.stack([cx - w * np.cos(t), cy - h * 0.15 + h * np.sin(t)], 1)
    brow_l = np.stack([np.linspace(cx - w * .7, cx - w * .2, 5),
                       np.full(5, cy - h * .45)], 1)
    brow_r = np.stack([np.linspace(cx + w * .2, cx + w * .7, 5),
                       np.full(5, cy - h * .45)], 1)
    nose_v = np.stack([np.full(4, cx), np.linspace(cy - h * .3, cy, 4)], 1)
    nose_b = np.stack([np.linspace(cx - w * .15, cx + w * .15, 5),
                       np.full(5, cy + h * .08)], 1)
    a6 = np.linspace(0, 2 * np.pi, 7)[:6]
    eye_l = np.stack([cx - w * .45 + w * .12 * np.cos(a6),
                      cy - h * .28 + h * .04 * np.sin(a6)], 1)
    eye_r = np.stack([cx + w * .45 + w * .12 * np.cos(a6),
                      cy - h * .28 + h * .04 * np.sin(a6)], 1)
    a12 = np.linspace(0, 2 * np.pi, 13)[:12]
    my = cy + h * .45
    mouth_o = np.stack([cx + w * .32 * np.cos(a12),
                        my + (h * .06 + mouth_open) * np.sin(a12)], 1)
    a8 = np.linspace(0, 2 * np.pi, 9)[:8]
    mouth_i = np.stack([cx + w * .18 * np.cos(a8),
                        my + mouth_open * np.sin(a8)], 1)
    lm = np.concatenate([jaw, brow_l, brow_r, nose_v, nose_b,
                         eye_l, eye_r, mouth_o, mouth_i], 0)
    return lm.astype(np.float64)


def _render_drawing(lm, size):
    """Line-drawing style: white bg, black strokes along landmark loops."""
    import cv2

    img = np.full((size, size), 255, np.uint8)

    def poly(idx, closed=False):
        pts = lm[idx].round().astype(np.int32).reshape(-1, 1, 2)
        cv2.polylines(img, [pts], closed, 0, 2, cv2.LINE_AA)

    poly(range(0, 17))
    poly(range(17, 22)); poly(range(22, 27))           # noqa: E702
    poly(range(27, 31)); poly(range(31, 36))           # noqa: E702
    poly(range(36, 42), True); poly(range(42, 48), True)  # noqa: E702
    poly(range(48, 60), True); poly(range(60, 68), True)  # noqa: E702
    return img


def _render_photo(lm, size, rng):
    """Shaded 'photo': gradient bg + filled face hull + dark features."""
    import cv2

    gy = np.linspace(90, 170, size, dtype=np.float32)
    img = np.repeat(gy[:, None], size, 1)
    img = np.stack([img, img * 0.9, img * 0.8], -1).astype(np.uint8)
    hull = cv2.convexHull(lm.round().astype(np.int32))
    cv2.fillConvexPoly(img, hull, (205, 185, 165), cv2.LINE_AA)
    for a, b in ((36, 42), (42, 48), (48, 60)):
        pts = lm[a:b].round().astype(np.int32).reshape(-1, 1, 2)
        cv2.fillPoly(img, [pts], (70, 50, 40), cv2.LINE_AA)
    return img


def build_dataset(root, n_a=6, n_b=6, n_clip=6, size=300, seed=0):
    import cv2

    rng = np.random.default_rng(seed)

    def put(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cv2.imwrite(path, arr)

    def lm_files(prefix, name, lm):
        txt = f"{root}/{prefix}_txt/MTCNN/{name}.txt"
        os.makedirs(os.path.dirname(txt), exist_ok=True)
        with open(txt, "w") as f:
            for (x, y) in lm:
                print(x, y, file=f)
        dots = np.full((size, size), 255, np.uint8)
        for (x, y) in lm.round().astype(int):
            cv2.circle(dots, (x, y), 2, 0, -1)
        put(f"{root}/{prefix}/MTCNN/{name}.png", dots)

    def masks(side, name, lm):
        for part, idx in (("nose", range(27, 36)), ("eyes", range(36, 48)),
                          ("lips", range(48, 68))):
            m = np.zeros((size, size), np.uint8)
            hull = cv2.convexHull(lm[list(idx)].round().astype(np.int32))
            cv2.fillConvexPoly(m, hull, 255)
            m = cv2.dilate(m, np.ones((9, 9), np.uint8))
            put(f"{root}/{side}mask/{part}/{name}.png", m)

    for i in range(n_a):
        lm = _face_landmarks(rng, size, mouth_open=rng.uniform(1, 10))
        put(f"{root}/Photo/a{i}.png", _render_photo(lm, size, rng))
        lm_files("Alm", f"a{i}", lm)
        masks("A", f"a{i}", lm)
        put(f"{root}/fakeB_static/a{i}.png", _render_drawing(lm, size))
    for i in range(n_b):
        lm = _face_landmarks(rng, size, mouth_open=rng.uniform(1, 10))
        put(f"{root}/Drawing/b{i}.png", _render_drawing(lm, size))
        lm_files("Blm", f"b{i}", lm)
        masks("B", f"b{i}", lm)
    # one film clip: a mouth-opening sequence (consecutive-frame pairs
    # for the coherence D)
    base = _face_landmarks(rng, size, mouth_open=1.0)
    for i in range(n_clip):
        lm = base.copy()
        lm[60:68, 1] += np.sin(i / (n_clip - 1) * np.pi) * 8 * np.sign(
            lm[60:68, 1] - lm[60:68, 1].mean())
        name = f"scanner_frag_0_MTCNN/f{i}"
        put(f"{root}/Drawing/{name}.png", _render_drawing(lm, size))
        lm_files("Blm", name, lm)
        with open(f"{root}/Blm_txt/MTCNN/{name}_win.txt", "w") as f:
            mn, mx = lm.min(0), lm.max(0)
            print(mn[0], mx[0], mn[1], mx[1], file=f)
        masks("B", name, lm)


def run_training(root, ckpt_dir, crop, steps_phase1, steps_total,
                 steps_per_epoch, ngf, print_freq=10, frozen_dir=None):
    env = dict(os.environ)
    common = [
        sys.executable, "-m", "animateportrait_tpu.train_cli",
        "--dataroot", root, "--name", "overfit", "--model",
        "geomgm_ifw_fore", "--netG", "resnet_9blocks_rcatland32_full_ifw",
        "--netg_resb_div", "3", "--netg_resb_disp", "3",
        "--output_nc", "1", "--lr", "0.00005",
        "--lambda_geom", "50", "--lambda_geom_lipline", "50",
        "--more_weight_for_lip", "2", "--lambda_face", "3.0",
        "--lambda_warp_inter", "10", "--blendbg", "1",
        "--select_target12_thre", "0.3", "--niter", "100",
        "--niter_decay", "0",
        "--crop_size", str(crop), "--load_size", str(int(crop * 286 / 256)),
        "--ngf", str(ngf), "--ndf", str(ngf),
        "--checkpoints_dir", ckpt_dir,
        "--steps_per_epoch", str(steps_per_epoch),
        "--print_freq", str(print_freq),
        "--display_freq", str(steps_per_epoch),
        "--save_latest_freq", str(steps_per_epoch),
        # default: a nonexistent dir -> random frozen nets; pass
        # --frozen_dir with tools/train_standin_frozen.py output to give
        # geom_B/iden_B a meaningful frozen signal
        "--frozen_dir", frozen_dir or os.path.join(ckpt_dir,
                                                   "frozen-none"),
    ]
    print(f"[overfit] phase 1: {steps_phase1} steps")
    subprocess.run(common + ["--max_steps", str(steps_phase1)],
                   check=True, env=env, cwd=REPO)
    print(f"[overfit] phase 2 (resume): -> {steps_total} steps")
    subprocess.run(common + ["--max_steps", str(steps_total),
                             "--continue_train", "--epoch", "latest"],
                   check=True, env=env, cwd=REPO)


def summarize(ckpt_dir, out_md, window=8):
    log = os.path.join(ckpt_dir, "overfit", "metrics.jsonl")
    rows = [json.loads(line) for line in open(log)]
    keys = [k for k in rows[0] if k not in ("epoch", "iters")]
    first = {k: float(np.mean([r[k] for r in rows[:window]])) for k in keys}
    last = {k: float(np.mean([r[k] for r in rows[-window:]])) for k in keys}
    lines = [
        "# Module2 GAN convergence run (constructed dataset)",
        "",
        f"Full `train_cli` 5-discriminator step, {rows[-1]['iters']} steps"
        f" (resume exercised mid-run), reduced resolution.",
        "Loss means over the first vs last "
        f"{window} log windows (`metrics.jsonl`):",
        "",
        "| loss | first | last | delta |",
        "|---|---|---|---|",
    ]
    for k in sorted(keys):
        d = last[k] - first[k]
        lines.append(f"| {k} | {first[k]:.4f} | {last[k]:.4f} | "
                     f"{d:+.4f} |")
    verdicts = []
    for k in ("warp_B", "iden_B", "geom_B"):
        if k in first:
            ok = last[k] < first[k]
            verdicts.append(f"- `{k}` {'DECREASED' if ok else 'did NOT decrease'}"
                            f" ({first[k]:.4f} -> {last[k]:.4f})")
    ga = [r.get("G_A") for r in rows if "G_A" in r]
    da = [r.get("D_A") for r in rows if "D_A" in r]
    if da:
        verdicts.append(
            f"- adversarial pair stayed finite and in the lsgan band: "
            f"D_A in [{min(da):.3f}, {max(da):.3f}], "
            f"G_A in [{min(ga):.3f}, {max(ga):.3f}]")
    lines += ["", *verdicts, "",
              "Landmark-overlay visuals (`fake_B_lm_68_vis*`) are under "
              f"`{os.path.join(ckpt_dir, 'overfit', 'web', 'images')}`."]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    # hard assertions: the run is evidence only if these hold
    assert all(np.isfinite(list(r[k] for k in keys)).all() for r in rows)
    assert last.get("warp_B", 0) < first.get("warp_B", 1), "warp_B rose"
    return first, last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/overfit_run")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--ngf", type=int, default=32)
    ap.add_argument("--steps_per_epoch", type=int, default=50)
    ap.add_argument("--out", default=os.path.join(REPO, "CONVERGENCE.md"))
    ap.add_argument("--frozen_dir", default=None,
                    help="trained stand-in frozen nets "
                         "(tools/train_standin_frozen.py output)")
    args = ap.parse_args()

    root = os.path.join(args.workdir, "drawing")
    ckpt = os.path.join(args.workdir, "ckpt")
    if not os.path.isdir(root):
        print("[overfit] building constructed dataset")
        build_dataset(root)
    run_training(root, ckpt, args.crop, args.steps // 2, args.steps,
                 args.steps_per_epoch, args.ngf,
                 frozen_dir=args.frozen_dir)
    summarize(ckpt, args.out)


if __name__ == "__main__":
    main()
