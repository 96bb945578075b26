"""Unit contracts for tools/quicktest_psnr.py's comparator (the PSNR
north-star harness; its --all convert+render+compare path is exercised
end-to-end by `--all --selftest`, see docs/perf + round-5 log)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))

import quicktest_psnr as qt  # noqa: E402

pytestmark = pytest.mark.fast


def test_psnr_basics():
    a = np.zeros((4, 4, 3), np.uint8)
    assert qt.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 16
    expect = 10 * np.log10(255.0 ** 2 / (16.0 ** 2 / 48))
    np.testing.assert_allclose(qt.psnr(a, b), expect, rtol=1e-6)


def test_compare_directories(tmp_path, capsys):
    import cv2

    rng = np.random.default_rng(0)
    ours, ref = tmp_path / "ours", tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    for i in range(3):
        f = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        cv2.imwrite(str(ours / f"{i:03d}.png"), f)
        noisy = np.clip(f.astype(np.int16)
                        + rng.integers(-2, 3, f.shape), 0, 255)
        cv2.imwrite(str(ref / f"{i:03d}.png"), noisy.astype(np.uint8))
    ok = qt.compare(str(ours), str(ref), threshold=30.0, label="t")
    out = capsys.readouterr().out
    assert ok and "PASS" in out and "frames=3" in out
    # ~2-intensity noise on uint8 is ~40 dB; a 50 dB bar must fail
    assert not qt.compare(str(ours), str(ref), threshold=50.0, label="t2")


def test_compare_frame_count_mismatch(tmp_path, capsys):
    import cv2

    a = np.zeros((8, 8, 3), np.uint8)
    ours, ref = tmp_path / "o", tmp_path / "r"
    ours.mkdir(), ref.mkdir()
    cv2.imwrite(str(ours / "0.png"), a)
    cv2.imwrite(str(ref / "0.png"), a)
    cv2.imwrite(str(ref / "1.png"), a)
    assert qt.compare(str(ours), str(ref), 40.0, "m")
    assert "mismatch" in capsys.readouterr().out


def test_compare_fails_on_large_frame_count_mismatch(tmp_path, capsys):
    """A >1 frame-count gap means frames are MISSING: high PSNR over
    the overlap must not pass the fidelity gate."""
    import cv2

    a = np.zeros((8, 8, 3), np.uint8)
    ours, ref = tmp_path / "o", tmp_path / "r"
    ours.mkdir(), ref.mkdir()
    cv2.imwrite(str(ours / "0.png"), a)
    for i in range(5):
        cv2.imwrite(str(ref / f"{i}.png"), a)
    assert not qt.compare(str(ours), str(ref), 40.0, "gap")
    assert "FAIL" in capsys.readouterr().out
