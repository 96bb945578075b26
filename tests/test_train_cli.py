"""train_cli smoke: one real optimization step through the full CLI path
(options shim -> dataset -> SPMD step -> checkpoint/loss log) over the
synthetic on-disk fixture."""
import json
import os

import numpy as np
import pytest

from tests.test_dataset import _make_fixture


@pytest.mark.slow
def test_train_cli_one_step(tmp_path):
    from animateportrait_tpu.train_cli import main

    root = str(tmp_path / "data")
    _make_fixture(root, size=128)
    ckpt_dir = str(tmp_path / "ckpts")
    main([
        "--dataroot", root,
        "--checkpoints_dir", ckpt_dir,
        "--name", "smoke",
        "--model", "geomgm_ifw_fore",
        "--netG", "resnet_9blocks_rcatland32_full_ifw",
        "--netg_resb_div", "3", "--netg_resb_disp", "3",
        "--output_nc", "1",
        "--ngf", "8", "--ndf", "8",
        "--load_size", "72", "--crop_size", "64",
        "--lr", "0.00005",
        "--lambda_geom", "50", "--lambda_geom_lipline", "50",
        "--niter", "1", "--niter_decay", "0",
        "--max_steps", "1", "--print_freq", "1",
        "--frozen_dir", str(tmp_path / "nonexistent"),
    ])
    # options archive, loss log and the step-1 checkpoint all exist
    exp_dir = os.path.join(ckpt_dir, "smoke")
    opt_txt = [f for f in os.listdir(exp_dir) if f.endswith("_opt.txt")]
    assert opt_txt, os.listdir(exp_dir)
    text = open(os.path.join(exp_dir, "loss_log.txt")).read()
    assert "epoch: 1" in text and "iters: 1" in text
    assert os.path.isdir(os.path.join(exp_dir, "orbax"))
