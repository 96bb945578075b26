"""UMLVD-IFW dataset tests over a synthetic on-disk fixture tree."""
import os

import numpy as np
import pytest


def _make_fixture(root, n_a=3, n_b=3, n_clip_frames=3, size=300):
    import cv2

    rng = np.random.default_rng(0)

    def put(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cv2.imwrite(path, arr)

    def lm_txt(path, lm):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for (x, y) in lm:
                print(x, y, file=f)

    def rand_img():
        return rng.integers(0, 255, (size, size, 3)).astype(np.uint8)

    def rand_lm():
        theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
        return np.stack([size / 2 + size / 5 * np.cos(theta),
                         size / 2 + size / 5 * np.sin(theta)], -1)

    for i in range(n_a):
        p = f"{root}/Photo/a{i}.png"
        put(p, rand_img())
        put(f"{root}/Alm/MTCNN/a{i}.png", rand_img()[:, :, 0])
        lm_txt(f"{root}/Alm_txt/MTCNN/a{i}.txt", rand_lm())
        for part in ("nose", "eyes", "lips"):
            put(f"{root}/Amask/{part}/a{i}.png",
                (rng.random((size, size)) > 0.5).astype(np.uint8) * 255)
        put(f"{root}/fakeB_static/a{i}.png", rand_img())
    for i in range(n_b):
        put(f"{root}/Drawing/b{i}.png", rand_img())
        put(f"{root}/Blm/MTCNN/b{i}.png", rand_img()[:, :, 0])
        lm_txt(f"{root}/Blm_txt/MTCNN/b{i}.txt", rand_lm())
        for part in ("nose", "eyes", "lips"):
            put(f"{root}/Bmask/{part}/b{i}.png",
                (rng.random((size, size)) > 0.5).astype(np.uint8) * 255)
    # one film clip
    for i in range(n_clip_frames):
        p = f"{root}/Drawing/scanner_frag_0_MTCNN/f{i}.png"
        put(p, rand_img())
        put(f"{root}/Blm/MTCNN/scanner_frag_0_MTCNN/f{i}.png",
            rand_img()[:, :, 0])
        lm_txt(f"{root}/Blm_txt/MTCNN/scanner_frag_0_MTCNN/f{i}.txt",
               rand_lm())
        with open(f"{root}/Blm_txt/MTCNN/scanner_frag_0_MTCNN/"
                  f"f{i}_win.txt", "w") as f:
            print(60.0, 240.0, 60.0, 240.0, file=f)
        for part in ("nose", "eyes", "lips"):
            put(f"{root}/Bmask/{part}/scanner_frag_0_MTCNN/f{i}.png",
                (rng.random((size, size)) > 0.5).astype(np.uint8) * 255)


def test_dataset_sample_shapes(tmp_path):
    from animateportrait_tpu.data.umlvd_ifw import (
        DataConfig, UMLVDIFWDataset)

    root = str(tmp_path / "drawing")
    _make_fixture(root)
    cfg = DataConfig(root=root, output_nc=1)
    ds = UMLVDIFWDataset(cfg)
    assert len(ds) == 3

    rng = np.random.default_rng(1)
    batch = ds.batch([0, 1], rng)
    cs = cfg.crop_size
    assert batch["real_A"].shape == (2, cs, cs, 3)
    assert batch["real_B"].shape == (2, cs, cs, 1)
    assert batch["A_lm_68"].shape == (2, 68, 2)
    assert batch["tB2_lm_68"].shape == (2, 68, 2)
    assert batch["B_mask"].shape == (2, cs, cs, 1)
    assert batch["fakeB_static"].shape == (2, cs, cs, 1)
    assert batch["B1_img"].shape == (2, cs, cs, 1)
    assert batch["winB"].shape == (2, 4)
    # masks are 0/1, images are [-1, 1]
    assert batch["B_mask"].min() >= 0 and batch["B_mask"].max() <= 1
    assert batch["real_A"].min() >= -1 and batch["real_A"].max() <= 1
    # deterministic under the same RNG seed
    b2 = ds.batch([0, 1], np.random.default_rng(1))
    np.testing.assert_array_equal(batch["real_A"], b2["real_A"])


@pytest.mark.slow
def test_dataset_feeds_train_step(tmp_path):
    """The dataset's batches run through the real train step with
    on-device warp-grid derivation (no precomputed warp_motion)."""
    import jax
    from animateportrait_tpu.data.umlvd_ifw import (
        DataConfig, UMLVDIFWDataset)
    from animateportrait_tpu.train.module2 import (
        Module2Config, build_train_step, init_frozen_random, init_state,
        make_example_batch)

    root = str(tmp_path / "drawing")
    _make_fixture(root)
    ds = UMLVDIFWDataset(DataConfig(root=root, output_nc=1))
    batch = ds.batch([0], np.random.default_rng(2))
    batch = {k: v for k, v in batch.items()
             if not isinstance(v.flat[0] if hasattr(v, "flat") else v, str)}

    cfg = Module2Config(crop_size=256, output_nc=1, ngf=8, ndf=8,
                        pool_size=4, steps_per_epoch=2)
    rng = jax.random.key(0)
    init_batch = make_example_batch(cfg, batch_size=1)
    state = init_state(cfg, rng, init_batch)
    frozen = init_frozen_random(rng, cfg.crop_size)
    step = jax.jit(build_train_step(cfg))
    state1, metrics = step(state, batch, frozen, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_options_to_configs():
    from animateportrait_tpu.utils.options import (
        build_train_argparser, to_configs)

    # the readme's drawing training command (readme.md:65)
    argv = ("--dataroot drawing --name training/drawing1 --model "
            "geomgm_ifw_fore --netG resnet_9blocks_rcatland32_full_ifw "
            "--netg_resb_div 3 --netg_resb_disp 3 --output_nc 1 "
            "--lr 0.00005 --lambda_geom 50 --lambda_geom_lipline 50 "
            "--more_weight_for_lip 2 --lambda_face 3.0 "
            "--lambda_warp_inter 10 --blendbg 1 "
            "--select_target12_thre 0.0 --niter 70 "
            "--niter_decay 0").split()
    args = build_train_argparser().parse_args(argv)
    cfg, data = to_configs(args)
    assert cfg.output_nc == 1 and cfg.lr == 5e-5
    assert cfg.lambda_geom == 50 and cfg.lambda_geom_lipline == 50
    assert cfg.blendbg == 1 and cfg.coherent == 1
    assert cfg.netg_resb_disp == 3 and cfg.niter == 70
    assert data.style_dir == "Drawing" and data.use_clips

    # cartoon twin disables coherence and clips
    argv2 = [a for a in argv]
    argv2[argv2.index("geomgm_ifw_fore")] = "geomgm_ifw_cartoon_fore"
    args2 = build_train_argparser().parse_args(
        argv2 + ["--dataset_mode", "umlvd_ifw_cartoon", "--output_nc", "3"])
    cfg2, data2 = to_configs(args2)
    assert cfg2.coherent == 0 and cfg2.output_nc == 3
    assert data2.style_dir == "Cartoon" and not data2.use_clips


def test_options_base_flag_semantics():
    """base_options flags: suffix name formatting (:119-122), BtoA
    channel swap (umlvd:145-147), preprocess guard, dataset caps."""
    import pytest

    from animateportrait_tpu.utils.options import (
        build_train_argparser, to_configs)

    base = "--dataroot d --output_nc 1".split()
    args = build_train_argparser().parse_args(
        base + ["--name", "exp", "--suffix", "{netG}_size{load_size}"])
    to_configs(args)
    assert args.name == "exp_resnet_9blocks_rcatland32_full_ifw_size286"

    args = build_train_argparser().parse_args(
        base + ["--direction", "BtoA"])
    _, data = to_configs(args)
    assert data.input_nc == 1 and data.output_nc == 3  # swapped

    args = build_train_argparser().parse_args(
        base + ["--serial_batches", "--max_dataset_size", "2",
                "--epoch_count", "5", "--load_iter", "7"])
    _, data = to_configs(args)
    assert data.serial_batches and data.max_dataset_size == 2
    assert args.epoch_count == 5 and args.load_iter == 7

    args = build_train_argparser().parse_args(
        base + ["--preprocess", "scale_width"])
    with pytest.raises(SystemExit):
        to_configs(args)


def test_options_face_recog_and_crop_window_flags():
    """--face_recog_model senet dispatch (networks.py:2862-2876) and the
    rx/ry/rs crop-window flags (geomgm_ifw_fore_model.py:203-205)."""
    from animateportrait_tpu.utils.options import (
        build_train_argparser, to_configs)

    base = "--dataroot d --output_nc 1".split()
    cfg, data = to_configs(build_train_argparser().parse_args(base))
    assert not cfg.use_senet and cfg.face_crop_hw == (112, 96)
    assert (data.rx, data.ry, data.rs) == (0.15, 0.2, 0.7)

    cfg, data = to_configs(build_train_argparser().parse_args(
        base + ["--face_recog_model", "./checkpoints/senet50_ft.pkl",
                "--rx", "0.1", "--ry", "0.25", "--rs", "0.6"]))
    assert cfg.use_senet and cfg.face_crop_hw == (224, 224)
    assert (data.rx, data.ry, data.rs) == (0.1, 0.25, 0.6)


@pytest.mark.slow
def test_train_step_senet_identity_loss():
    """The senet FaceLoss branch compiles and yields a finite iden_B on a
    tiny config (crop 64, 224-crop heads)."""
    import jax

    from animateportrait_tpu.train.module2 import (
        Module2Config, build_train_step, init_frozen_random, init_state,
        make_example_batch)

    cfg = Module2Config(crop_size=64, output_nc=1, ngf=4, ndf=4,
                        pool_size=2, steps_per_epoch=2,
                        face_recog_model="checkpoints/senet50_ft.pkl")
    rng = jax.random.PRNGKey(0)
    batch = make_example_batch(cfg, batch_size=1)
    state = init_state(cfg, rng, batch)
    frozen = init_frozen_random(rng, cfg.crop_size, cfg.face_recog_model)
    step = jax.jit(build_train_step(cfg))
    state, metrics = step(state, batch, frozen, rng)
    assert np.isfinite(float(metrics["iden_B"]))


def test_dataset_serial_batches_and_cap(tmp_path):
    from animateportrait_tpu.data.umlvd_ifw import (
        DataConfig, UMLVDIFWDataset)

    root = str(tmp_path / "drawing")
    _make_fixture(root)
    ds = UMLVDIFWDataset(DataConfig(root=root, output_nc=1,
                                    serial_batches=True))
    # serial pairing is index-deterministic regardless of the RNG
    assert ds.b_index(1, np.random.default_rng(0)) == 1
    assert ds.b_index(4, np.random.default_rng(99)) == 1  # 4 % 3
    rnd = UMLVDIFWDataset(DataConfig(root=root, output_nc=1))
    picks = {rnd.b_index(0, np.random.default_rng(s)) for s in range(16)}
    assert len(picks) > 1  # randomized pairing without the flag
    # serial sampling still produces a well-formed item
    item = ds.sample(1, np.random.default_rng(0))
    assert item["real_B"].shape[-1] == 1

    capped = UMLVDIFWDataset(DataConfig(root=root, output_nc=1,
                                        max_dataset_size=2))
    assert len(capped.A_paths) == 2 and len(capped.B_paths) == 2
