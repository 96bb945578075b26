"""Automated end-to-end test of the flagship driver ``cli.main()``.

The in-process equivalent of the reference Quick Test (readme.md:41-53):
argparse -> pipeline build -> MTCNN align -> audio -> landmarks -> render
-> artifact tree -> video mux, driven through the real entry point users
run (ref surface: main_end2end_module2.py:130-159,184-342). Uses the
reference example inputs (examples/hermione2.jpeg + female12.wav, trimmed)
with tiny random-init nets via the CLI's --ngf/--flow_nf/... debug knobs.
"""
import os
import wave

import numpy as np
import pytest

REF = "/root/reference"
JPG = os.path.join(REF, "examples", "hermione2.jpeg")
WAV = os.path.join(REF, "examples", "female12.wav")
MTCNN_W = os.path.join(REF, "MTCNN", "weights", "pnet.npy")

needs_examples = pytest.mark.skipif(
    not (os.path.exists(JPG) and os.path.exists(WAV)
         and os.path.exists(MTCNN_W)),
    reason="reference example inputs / MTCNN weights missing")


def _trimmed_wav(tmp_path, seconds=0.45):
    """First `seconds` of the example wav, rewritten as 16-bit PCM."""
    with wave.open(WAV, "rb") as r:
        sr = r.getframerate()
        width = r.getsampwidth()
        ch = r.getnchannels()
        raw = r.readframes(int(sr * seconds))
    dst = str(tmp_path / "clip.wav")
    with wave.open(dst, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(raw)
    return dst


def _run_main(tmp_path, wav_path, exp, warp_mode, extra=()):
    from animateportrait_tpu.cli import main

    out_dir = str(tmp_path / "out")
    m1_dir = str(tmp_path / "m1")
    dump_dir = str(tmp_path / "dump")
    path = main([
        "--jpg", JPG, "--audio", wav_path, "--exp", exp,
        "--output", out_dir, "--output_folder", m1_dir,
        "--dump_dir", dump_dir, "--ckpt_dir", str(tmp_path / "ckpt"),
        "--warp_mode", warp_mode, "--frame_batch", "4",
        "--ngf", "8", "--flow_nf", "4", "--static_ngf", "8",
        "--cartoon_ngf", "8", *extra])
    return path, m1_dir, dump_dir


def _check_artifacts(path, m1_dir, dump_dir, exp):
    import cv2

    # video written under output/<jpg>-<wav>/output_<exp>.avi
    assert path is not None and os.path.exists(path)
    assert os.path.basename(path) == (
        f"output_{exp.replace('/', '_')}.avi")
    assert "hermione2-clip" in path

    # reference step-5 artifact: pred_fls txt (train_audio2landmark.py:342)
    fls = np.loadtxt(os.path.join(m1_dir, "pred_fls_clip_audio_embed.txt"))
    T = fls.shape[0]
    assert T >= 10 and fls.shape[1] == 204 and np.isfinite(fls).all()

    # stage dumps round-trip through the Module1 trainer dataset
    # (main_end2end_module2.py:230-251 format)
    from animateportrait_tpu.data.audio2landmark import Audio2landmarkDataset

    ds = Audio2landmarkDataset(dump_dir, dump_name="random", status="val")
    (fl_arr, _), (au_arr, info) = ds[0]
    assert au_arr.shape[-1] == 80 and fl_arr.shape[-1] == 204
    assert info[1] == "clip" and np.asarray(info[2]).shape == (256,)

    # muxed AVI decodes frame-for-frame at the reference 62.5 fps
    # (main_end2end_module2.py:306,342) and carries an audio stream
    cap = cv2.VideoCapture(path)
    n = 0
    shape = None
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        shape = fr.shape
        n += 1
    assert n == T, (n, T)
    assert shape == (256, 256, 3)
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 62.5) < 0.1
    with open(path, "rb") as fp:
        blob = fp.read()
    assert b"auds" in blob, "muxed AVI has no audio stream"
    return T


@needs_examples
@pytest.mark.slow
def test_cli_main_drawing_linear(tmp_path):
    """formal/drawing + the default exact-griddata warp path."""
    wav = _trimmed_wav(tmp_path)
    path, m1, dump = _run_main(tmp_path, wav, "formal/drawing", "linear")
    _check_artifacts(path, m1, dump, "formal/drawing")


@needs_examples
@pytest.mark.slow
def test_cli_main_cartoon_tps(tmp_path):
    """formal/cartoon dispatch (photo2cartoon static path, 3-ch output)
    + the fully-on-device TPS warp path."""
    wav = _trimmed_wav(tmp_path)
    path, m1, dump = _run_main(tmp_path, wav, "formal/cartoon", "tps")
    _check_artifacts(path, m1, dump, "formal/cartoon")
