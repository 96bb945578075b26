"""Visualization + dataset-builder tests."""
import numpy as np


def _circle_lm(size=512):
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    return np.stack([size / 2 + size / 5 * np.cos(theta),
                     size / 2 + size / 5 * np.sin(theta),
                     np.zeros(68)], -1)


def test_vis_landmark(rng):
    from animateportrait_tpu.utils.vis import vis_landmark

    img = vis_landmark(512, 512, _circle_lm()[:, :2])
    assert img.shape == (512, 512, 3)
    assert (img != 255).any()  # something was drawn


def test_landmark_sequence_video(tmp_path, rng):
    import cv2
    from animateportrait_tpu.utils.vis import landmark_sequence_video

    fls = np.stack([_circle_lm() + i for i in range(5)])
    wav = rng.uniform(-0.2, 0.2, 16000 // 10).astype(np.float64)
    p = landmark_sequence_video(str(tmp_path / "lm.avi"), fls, wav,
                                fps=62.5)
    cap = cv2.VideoCapture(p)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5


def test_av2flau_converter(tmp_path, rng):
    import cv2
    from animateportrait_tpu.data.av2flau import Av2FlauConverter

    # synthesize a tiny video
    vp = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 25,
                         (64, 64))
    for _ in range(12):
        vw.write(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    vw.release()

    lm = _circle_lm(64)
    conv = Av2FlauConverter(landmark_fn=lambda frame: lm)
    fl3d, feats, fps = conv.convert(vp, out_dir=str(tmp_path),
                                    register=True)
    assert fl3d.shape == (12, 205)
    assert abs(fps - 25) < 0.1
    assert (tmp_path / "raw_fl3d" / "fan_clip_3d.txt").exists()
    # registered anchors should be near the canonical T-shape
    from animateportrait_tpu.utils import assets

    anchor = assets.std_face_landmarks()[list(assets.T_SHAPE_IDX)]
    reg = fl3d[0, 1:].reshape(68, 3)[list(assets.T_SHAPE_IDX)]
    # same rigid-registration residual for every frame (same input lm)
    assert np.abs(reg - anchor).mean() < np.abs(
        lm[list(assets.T_SHAPE_IDX)] - anchor).mean()


def test_get_puppet_info(tmp_path):
    import cv2
    from animateportrait_tpu.utils.puppet import get_puppet_info

    bound, scale, shift = get_puppet_info("cat", str(tmp_path))
    assert bound.shape == (1, 16) and scale < 0 and shift.shape == (2,)

    # generic branch
    img = np.zeros((100, 120, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "mypuppet.png"), img)
    np.savetxt(str(tmp_path / "mypuppet_scale_shift.txt"),
               [-0.01, -10.0, -20.0])
    bound, scale, shift = get_puppet_info("mypuppet", str(tmp_path))
    assert bound.shape == (1, 24)
    assert scale == -0.01 and tuple(shift) == (-10.0, -20.0)


def test_show_bboxes(rng):
    from animateportrait_tpu.utils.vis import show_bboxes

    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 50, 50, 0.9]])
    lms = np.array([[20, 40, 30, 25, 35, 20, 20, 30, 45, 45]])
    out = show_bboxes(img, boxes, lms)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)
