"""Quick-test fidelity harness: PSNR between our frames and reference frames.

BASELINE's north star is frame-for-frame PSNR >= 40 dB on the
hermione2+female12 quick test (reference readme.md:41-53). The shipped
reference checkpoints were never in the mount (they download from Drive,
readme.md:26-38), so this tool is the ONE command that stands between
"the blobs land" and the north-star number:

    # compare an existing render
    python tools/quicktest_psnr.py --ours out.avi --ref <dir of pngs|avi>

    # one-shot: convert every checkpoint in --src, run hermione2+female12
    # through cli.main for BOTH styles, and report per-stage (landmark
    # RMSE) + final-frame PSNR against whatever reference artifacts are
    # supplied (missing ones are reported, not fatal)
    python tools/quicktest_psnr.py --all --src <dir with reference ckpts> \
        [--ref_drawing <frames dir|video>] [--ref_cartoon <...>] \
        [--ref_fls <pred_fls_*.txt>] [--work /tmp/quicktest]

    # machinery self-test with tiny random-init nets (no checkpoints):
    python tools/quicktest_psnr.py --all --selftest
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_frames(path: str) -> np.ndarray:
    import cv2

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.png"))
                       + glob.glob(os.path.join(path, "*.jpg")))
        return np.stack([cv2.imread(f) for f in files])
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    return np.stack(frames)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def compare(ours_path: str, ref_path: str, threshold: float,
            label: str) -> bool:
    ours = load_frames(ours_path)
    ref = load_frames(ref_path)
    n = min(len(ours), len(ref))
    count_ok = abs(len(ours) - len(ref)) <= 1
    if len(ours) != len(ref):
        # off-by-one is mux rounding; anything more means frames are
        # MISSING and a high PSNR over the overlap must not pass the
        # fidelity gate
        print(f"[{label}] frame count mismatch: ours {len(ours)} vs "
              f"ref {len(ref)}; comparing first {n}"
              + ("" if count_ok else " — FAIL (beyond mux rounding)"))
    per_frame = [psnr(ours[i], ref[i]) for i in range(n)]
    mean = float(np.mean(per_frame))
    worst = float(np.min(per_frame))
    ok = mean >= threshold and count_ok
    print(f"[{label}] frames={n} mean_psnr={mean:.2f}dB "
          f"worst={worst:.2f}dB threshold={threshold}dB "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


JPG = "/root/reference/examples/hermione2.jpeg"
WAV = "/root/reference/examples/female12.wav"


def run_all(args) -> int:
    """One-shot: convert -> render both styles -> compare what we can."""
    work = args.work
    os.makedirs(work, exist_ok=True)

    # 1. convert every reference checkpoint present (validates the
    # converters and produces the Orbax trees; skips missing files)
    if args.src:
        import convert_checkpoints
        print(f"[all] converting checkpoints {args.src} -> "
              f"{work}/converted")
        convert_checkpoints.main(["--src", args.src,
                                  "--dst", os.path.join(work, "converted")])
        ckpt_dir = args.src  # cli.main consumes the torch files directly
    else:
        ckpt_dir = os.path.join(work, "no-ckpts")

    wav = WAV
    extra = []
    if args.selftest:
        # tiny random-init nets + a trimmed clip: proves the whole
        # convert->render->compare machinery runs without the blobs
        import wave as wavmod
        with wavmod.open(WAV, "rb") as r:
            sr, width, ch = (r.getframerate(), r.getsampwidth(),
                             r.getnchannels())
            raw = r.readframes(int(sr * 0.45))
        wav = os.path.join(work, "clip.wav")
        with wavmod.open(wav, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(width)
            w.setframerate(sr)
            w.writeframes(raw)
        extra = ["--ngf", "8", "--flow_nf", "4", "--static_ngf", "8",
                 "--cartoon_ngf", "8", "--frame_batch", "4"]

    from animateportrait_tpu.cli import main as cli_main

    outputs = {}
    for exp in ("formal/drawing", "formal/cartoon"):
        style = exp.split("/")[1]
        m1_dir = os.path.join(work, f"m1_{style}")
        print(f"[all] rendering {exp} ...", flush=True)
        path = cli_main([
            "--jpg", JPG, "--audio", wav, "--exp", exp,
            "--output", os.path.join(work, "out"),
            "--output_folder", m1_dir,
            "--dump_dir", os.path.join(work, "dump"),
            "--ckpt_dir", ckpt_dir, *extra])
        outputs[style] = (path, m1_dir)
        print(f"[all] {exp} -> {path}")

    # 2. per-stage: predicted-landmark RMSE vs a reference pred_fls txt
    ok = True
    if args.ref_fls:
        name = os.path.splitext(os.path.basename(wav))[0]
        ours_fls = np.loadtxt(os.path.join(
            outputs["drawing"][1], f"pred_fls_{name}_audio_embed.txt"))
        ref_fls = np.loadtxt(args.ref_fls)
        n = min(len(ours_fls), len(ref_fls))
        rmse = float(np.sqrt(np.mean(
            (ours_fls[:n] - ref_fls[:n]) ** 2)))
        print(f"[stage:landmarks] frames={n} rmse={rmse:.5f} "
              "(normalized face units)")
    else:
        print("[stage:landmarks] no --ref_fls supplied — skipped")

    # 3. final frames per style
    for style, ref_path in (("drawing", args.ref_drawing),
                            ("cartoon", args.ref_cartoon)):
        if ref_path:
            ok &= compare(outputs[style][0], ref_path, args.threshold,
                          f"stage:frames/{style}")
        else:
            print(f"[stage:frames/{style}] no --ref_{style} supplied — "
                  "rendered "
                  f"{outputs[style][0]} awaits reference frames")
    if args.selftest:
        # ours-vs-ours must be a perfect match: locks the comparator
        ok &= compare(outputs["drawing"][0], outputs["drawing"][0],
                      args.threshold, "selftest/identity")
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ours")
    p.add_argument("--ref")
    p.add_argument("--threshold", type=float, default=40.0)
    p.add_argument("--all", action="store_true",
                   help="one-shot convert+render+compare on the "
                        "hermione2+female12 quick test")
    p.add_argument("--src", default="",
                   help="dir with the reference checkpoint bundle")
    p.add_argument("--work", default="/tmp/quicktest")
    p.add_argument("--ref_drawing", default="")
    p.add_argument("--ref_cartoon", default="")
    p.add_argument("--ref_fls", default="")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args(argv)

    if args.all:
        return run_all(args)
    if not (args.ours and args.ref):
        p.error("--ours/--ref required unless --all")
    ok = compare(args.ours, args.ref, args.threshold, "frames")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
