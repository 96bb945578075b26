"""Full-pipeline smoke test (photo + wav -> frames) with a stub detector and
randomly initialized nets, plus video muxer round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class StubDetector:
    """Returns one fixed face box + 5-pt landmarks for any image."""

    def __call__(self, img_rgb):
        h, w = img_rgb.shape[:2]
        box = np.array([[w * 0.25, h * 0.25, w * 0.75, h * 0.80, 0.99]])
        cx, cy = w * 0.5, h * 0.5
        xs = [cx - w * 0.12, cx + w * 0.12, cx, cx - w * 0.08,
              cx + w * 0.08]
        ys = [cy - h * 0.08, cy - h * 0.08, cy, cy + h * 0.12, cy + h * 0.12]
        return box, np.array([xs + ys])


def _small_pipeline():
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkContent, Audio2landmarkPos)
    from animateportrait_tpu.models.autovc import AutoVCGenerator
    from animateportrait_tpu.models.flowunet import FlowUnet
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, TridentGeneratorFullIFW)
    from animateportrait_tpu.models.modnet import MODNet
    from animateportrait_tpu.pipeline.audio import AudioPipeline
    from animateportrait_tpu.pipeline.end2end import TalkingPortraitPipeline
    from animateportrait_tpu.pipeline.landmark import LandmarkPredictor
    from animateportrait_tpu.pipeline.render import (
        Module2Renderer, RendererVariables)

    k = jax.random.key(0)
    cs = 256
    autovc_v = AutoVCGenerator().init(
        k, jnp.zeros((1, 32, 80)), jnp.zeros((1, 256)),
        jnp.zeros((1, 256)), jnp.zeros((1, 32, 257)))
    audio = AudioPipeline(autovc_v, chunk=512)

    pos_v = Audio2landmarkPos().init(
        k, jnp.zeros((4, 18, 80)), jnp.zeros((4, 256)),
        jnp.zeros((1, 204)), jnp.zeros((4, 128)))
    cont_v = Audio2landmarkContent().init(
        k, jnp.zeros((4, 18, 80)), jnp.zeros((1, 204)))
    predictor = LandmarkPredictor(pos_v, cont_v)

    gen_v = TridentGeneratorFullIFW(output_nc=1, ngf=8, div=3, disp=3).init(
        k, jnp.zeros((1, cs, cs, 3)), jnp.zeros((1, cs, cs, 1)),
        jnp.zeros((1, cs, cs, 1)), jnp.zeros((1, cs, cs, 2)),
        jnp.zeros((1, cs, cs, 2)), jnp.zeros((1, cs, cs, 1)))
    flow_small = FlowUnet(nf=4, max_nf=64)
    flow_v = flow_small.init(k, jnp.zeros((1, 224, 224, 136)))
    modnet_v = MODNet().init(k, jnp.zeros((1, cs, cs, 3)))
    style_small = ResnetStyle2Generator(ngf=8)
    static_v = style_small.init(k, jnp.zeros((1, 512, 512, 3)),
                                jnp.zeros((1, 128, 128, 3)))
    renderer = Module2Renderer(
        RendererVariables(generator=gen_v, flowunet=flow_v,
                          modnet=modnet_v, static_drawing=static_v),
        style="drawing", ngf=8, frame_batch=4,
        flowunet=flow_small, static_g=style_small)
    return TalkingPortraitPipeline(StubDetector(), predictor, audio,
                                   renderer)


@pytest.mark.slow
def test_end_to_end_smoke(rng, tmp_path):
    from animateportrait_tpu.utils.video import write_video_with_audio

    pipe = _small_pipeline()
    img = (rng.uniform(0, 255, (300, 280, 3))).astype(np.uint8)
    wav = rng.uniform(-0.3, 0.3, 16000 // 2).astype(np.float64)  # 0.5 s

    out = pipe(img, wav, output_folder=str(tmp_path / "m1"),
               dump_dir=str(tmp_path / "dump"), audio_name="clip")
    T = out.frames.shape[0]
    assert T > 5
    assert out.frames.shape[1:] == (256, 256, 1)
    assert np.isfinite(out.frames).all()
    assert out.landmarks.shape == (T, 68, 3)

    # reference step-5 artifact (train_audio2landmark.py:340-342)
    fls = np.loadtxt(tmp_path / "m1" / "pred_fls_clip_audio_embed.txt")
    assert fls.shape == (T, 204) and np.isfinite(fls).all()
    # stage dumps round-trip through the Module1 trainer dataset
    # (main_end2end_module2.py:230-251 format)
    from animateportrait_tpu.data.audio2landmark import (
        Audio2landmarkDataset)

    ds = Audio2landmarkDataset(str(tmp_path / "dump"), dump_name="random",
                               status="val")
    (fl_arr, _), (au_arr, info) = ds[0]
    assert au_arr.shape[-1] == 80 and fl_arr.shape[-1] == 204
    assert info[1] == "clip" and np.asarray(info[2]).shape == (256,)

    path = write_video_with_audio(str(tmp_path / "out.avi"), out.frames,
                                  wav, fps=out.fps)
    import cv2

    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == T
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 62.5) < 0.1


def test_cli_flag_surface():
    """The reference driver's flags are accepted
    (main_end2end_module2.py:130-159)."""
    from animateportrait_tpu.cli import build_argparser

    args = build_argparser().parse_args([
        "--jpg", "x.jpg", "--audio", "y.wav", "--exp", "formal/cartoon",
        "--rerun", "1", "--epoch", "35",
        "--load_AUTOVC_name", "a.pth", "--load_a2l_G_name", "g.pth",
        "--load_a2l_C_name", "c.pth", "--amp_lip_x", "1.5",
        "--amp_lip_y", "1.5", "--amp_pos", "0.3", "--emb_coef", "2.0",
        "--reuse_train_emb_list", "spk1", "spk2",
        "--output_folder", "/tmp/m1", "--dump_dir", "/tmp/dump",
        "--pos_dim", "7", "--transformer_d_model", "32",
        "--transformer_N", "2", "--transformer_heads", "2",
        "--spk_emb_enc_size", "16", "--init_content_encoder", "",
        "--lr", "1e-3", "--reg_lr", "1e-6", "--segment_batch_size", "1",
        "--lambda_laplacian_smooth_loss", "1.0"])
    assert args.epoch == "35" and args.output == "output"
    # --output_folder is the reference's pred_fls artifact dir
    # (train_audio2landmark.py:342), distinct from the video --output
    assert args.output_folder == "/tmp/m1" and args.dump_dir == "/tmp/dump"
    assert args.reuse_train_emb_list == ["spk1", "spk2"]
    assert args.load_AUTOVC_name == "a.pth"
    assert args.transformer_d_model == 32 and args.pos_dim == 7


def test_load_train_embs(tmp_path):
    """--reuse_train_emb_list loads emb.pickle {key: 256-d}
    (train_audio2landmark.py:89-94)."""
    import pickle

    from animateportrait_tpu.cli import load_train_embs

    embs = {"spk1": np.arange(256, dtype=np.float32) / 256.0,
            "spk2": np.ones((1, 256), np.float64)}
    with open(tmp_path / "emb.pickle", "wb") as fp:
        pickle.dump(embs, fp)
    loaded = load_train_embs(str(tmp_path))
    assert set(loaded) == {"spk1", "spk2"}
    assert loaded["spk2"].shape == (256,)  # reshaped flat
    assert loaded["spk1"].dtype == np.float32
    np.testing.assert_allclose(loaded["spk1"], embs["spk1"])
    with pytest.raises(SystemExit):
        load_train_embs(str(tmp_path / "nowhere"))


def test_uint8_gray_frames_expand_to_3ch(tmp_path):
    """uint8 (T,H,W,1) frames must not be dropped by cv2.VideoWriter nor
    muxed as 1-ch JPEG under a 24-bit strf header (ADVICE r1)."""
    import cv2

    from animateportrait_tpu.utils.video import (
        write_video, write_video_with_audio)

    frames = np.random.default_rng(0).integers(
        0, 255, (4, 64, 64, 1), dtype=np.uint8)
    wav = np.zeros(int(4 / 62.5 * 16000), np.float32)
    p1 = write_video(str(tmp_path / "v.avi"), frames)
    cap = cv2.VideoCapture(p1)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 4  # 1-ch input used to produce an empty video
    p2 = write_video_with_audio(str(tmp_path / "m.avi"), frames, wav)
    cap = cv2.VideoCapture(p2)
    ok, fr = cap.read()
    assert ok and fr.shape == (64, 64, 3)


def test_spk_emb_override_changes_prediction(rng):
    """spk_emb_override reaches the landmark branch in place of the
    computed embedding (reuse_train_emb_list semantics)."""
    from animateportrait_tpu.pipeline.end2end import TalkingPortraitPipeline

    calls = []

    class SpyPredictor:
        def __call__(self, windows, spk, face_id):
            calls.append(np.asarray(spk).copy())
            return np.zeros((windows.shape[0], 204), np.float32)

    class StubAudio:
        def __call__(self, wav, gender):
            import types
            return types.SimpleNamespace(
                mel_autovc=np.zeros((30, 80), np.float32),
                spk_emb=np.zeros(256, np.float32))

    class StubRenderer:
        frame_batch = 4

        def __call__(self, photo, a68, tb68, progress=None):
            return np.zeros((tb68.shape[0], 256, 256, 1), np.float32)

    pipe = TalkingPortraitPipeline(StubDetector(), SpyPredictor(),
                                   StubAudio(), StubRenderer())
    img = (rng.uniform(0, 255, (300, 280, 3))).astype(np.uint8)
    wav = rng.uniform(-0.1, 0.1, 8000).astype(np.float64)
    pipe(img, wav)
    override = np.full(256, 0.5, np.float32)
    pipe(img, wav, spk_emb_override=override)
    assert np.allclose(calls[0], 0.0)
    assert np.allclose(calls[1], 0.5)


def test_cli_video_requires_audio_without_ffmpeg(tmp_path, monkeypatch):
    import shutil

    import cv2

    from animateportrait_tpu.cli import _split_video

    vid = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 25,
                        (32, 32))
    for _ in range(3):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    jpg, wav = _split_video(vid, "given.wav")
    assert jpg.endswith("frame.jpg") and wav == "given.wav"
    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(SystemExit):
        _split_video(vid, None)
