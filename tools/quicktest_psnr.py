"""Quick-test fidelity harness: PSNR between our frames and reference frames.

BASELINE's north star is frame-for-frame PSNR >= 40 dB on the
hermione2+female12 quick test. This tool compares a directory (or video) of
our frames against the reference's rendered frames once its trained
checkpoints are available.

Usage:
    python tools/quicktest_psnr.py --ours out.avi --ref <dir of pngs|avi>
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ours", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--threshold", type=float, default=40.0)
    args = p.parse_args(argv)

    ours = load_frames(args.ours)
    ref = load_frames(args.ref)
    n = min(len(ours), len(ref))
    if len(ours) != len(ref):
        print(f"frame count mismatch: ours {len(ours)} vs ref {len(ref)}; "
              f"comparing first {n}")
    per_frame = [psnr(ours[i], ref[i]) for i in range(n)]
    mean = float(np.mean(per_frame))
    worst = float(np.min(per_frame))
    print(f"frames={n} mean_psnr={mean:.2f}dB worst={worst:.2f}dB "
          f"threshold={args.threshold}dB "
          f"{'PASS' if mean >= args.threshold else 'FAIL'}")
    return 0 if mean >= args.threshold else 1


if __name__ == "__main__":
    raise SystemExit(main())
