"""test_cli: the Module2/test.py-equivalent results-tree renderer."""
import os

import numpy as np
import pytest


def _make_driver_layout(tmp, db="hermione2_MTCNN", n_frames=2):
    """The on-disk layout the reference driver leaves behind before
    invoking test.py (main_end2end_module2.py:71-87 getTestList +
    Data/ dirs)."""
    import cv2

    rng = np.random.default_rng(0)
    photo_dir = tmp / "Data" / "Photo" / db
    alm_dir = tmp / "Data" / "Alm" / "MTCNN" / db
    txt_dir = tmp / "Data" / "Alm_txt" / "MTCNN" / db
    for d in (photo_dir, alm_dir, txt_dir):
        os.makedirs(d, exist_ok=True)

    def lm():
        theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
        return np.stack([128 + 50 * np.cos(theta),
                         128 + 50 * np.sin(theta)], -1)

    def write_lm(path, pts):
        with open(path, "w") as f:
            for (x, y) in pts:
                print(x, y, file=f)

    photo = str(photo_dir / "ori.png")
    cv2.imwrite(photo, rng.integers(0, 255, (256, 256, 3), np.uint8))
    write_lm(txt_dir / "ori.txt", lm())
    frames = []
    for i in range(n_frames):
        p = str(alm_dir / f"{i:05d}.png")
        cv2.imwrite(p, rng.integers(0, 255, (256, 256), np.uint8))
        write_lm(txt_dir / f"{i:05d}.txt", lm() + i)
        frames.append(p)

    os.makedirs(tmp / "datasets" / "list" / "testA", exist_ok=True)
    os.makedirs(tmp / "datasets" / "list" / "testB", exist_ok=True)
    with open(tmp / "datasets" / "list" / "testA" / f"{db}.txt", "w") as f:
        for _ in frames:
            print(photo, file=f)
    with open(tmp / "datasets" / "list" / "testB" / f"{db}.txt", "w") as f:
        for p in frames:
            print(p, file=f)
    return db


@pytest.mark.slow
def test_test_cli_results_tree(tmp_path, monkeypatch):
    """Runs the full test_cli (random weights) and checks the reference
    results layout: <results>/<name>/test_<epoch>/<db>/ori->NNNNN_<label>
    .png x9 visuals + index<db>.html (test.py:50-67, html.py:71-78)."""
    from animateportrait_tpu import test_cli

    db = _make_driver_layout(tmp_path)
    monkeypatch.chdir(tmp_path)
    test_cli.main(
        ("--dataroot %s --name formal/drawing --model geomcgt_ifw_test "
         "--netG resnet_9blocks_rcatland32_full_ifw --netg_resb_div 3 "
         "--netg_resb_disp 3 --output_nc 1 --ngf 4 --load_size 256 "
         "--crop_size 256 --epoch 70 --num_test 2 --serial_batches "
         "--imagefolder %s --frame_batch 2 --draw_op 0 --blendbg 1 "
         "--checkpoints_dir %s --results_dir %s"
         % (db, db, tmp_path / "ckpt", tmp_path / "results")).split())

    out = tmp_path / "results" / "formal/drawing" / "test_70"
    labels = ["real_A", "real_A_lm", "target_B_lm", "fake_B",
              "fake_B_vis", "fg_mask", "fakeB_static", "fake_B_fore",
              "fg_mask1"]
    for i in range(2):
        for label in labels:
            p = out / db / f"ori->{i:05d}_{label}.png"
            assert p.exists(), p
    idx = out / f"index{db}.html"
    assert idx.exists()
    html = idx.read_text()
    assert "ori->00000" in html and "fake_B" in html

    import cv2

    im = cv2.imread(str(out / db / "ori->00000_fake_B.png"))
    assert im.shape == (256, 256, 3)
    # the blended output must not be a constant image
    assert im.std() > 1.0
