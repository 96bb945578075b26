"""Train-loop observability: visual snapshots, HTML gallery, landmark
overlays, latest/by-iter checkpoint cadence (reference visualizer +
train_options parity)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train_module2 import _setup, _small_cfg


def test_draw_lm_overlay_reference_semantics():
    from animateportrait_tpu.utils.observe import draw_lm_overlay

    img = np.zeros((64, 64, 1), np.float32)
    lm = np.array([[10.0, 20.0], [62.9, 2.0], [-5.0, -5.0]])
    win = np.array([8, 56, 12, 50])
    out = draw_lm_overlay(img, lm, win, hradius=2)
    assert out.shape == (64, 64, 3)
    # red square at (x=10, y=20): ch0 = 1, others = -1
    assert out[20, 10, 0] == 1.0 and out[20, 10, 1] == -1.0
    assert out[19, 9, 0] == 1.0
    # window edge at y=12 between x=8..56
    assert out[12, 30, 0] == 1.0
    # untouched background stays
    assert out[40, 40, 0] == 0.0
    # out-of-range landmark clipped, no crash; batch/4-dim inputs accepted
    out2 = draw_lm_overlay(img[None], lm[None], win[None])
    np.testing.assert_allclose(out2, draw_lm_overlay(img, lm, win))


def test_save_visuals_gallery(tmp_path):
    from animateportrait_tpu.utils.observe import LossLogger

    lg = LossLogger(str(tmp_path), "exp")
    v = {"fake_B": np.zeros((8, 8, 1), np.float32),
         "real_A": np.zeros((1, 8, 8, 3), np.float32)}
    lg.save_visuals(v, epoch=1, iters=400, update_html=False)
    assert not os.path.exists(tmp_path / "exp" / "web" / "index.html")
    lg.save_visuals(v, epoch=1, iters=800, update_html=True)
    idx = (tmp_path / "exp" / "web" / "index.html").read_text()
    # both snapshots listed, newest first
    assert idx.index("iters [800]") < idx.index("iters [400]")
    imgs = os.listdir(tmp_path / "exp" / "web" / "images")
    assert len(imgs) == 4
    assert any("epoch001_iter0000400_fake_B" in f for f in imgs)


def test_checkpoint_force_and_keep(tmp_path):
    from animateportrait_tpu.io.checkpoint import CheckpointManager

    state = {"w": np.arange(4, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "orbax"), max_to_keep=2,
                            save_interval_steps=10)
    assert mgr.save(10, state)
    # off-cadence save rejected without force, accepted with force
    assert not mgr.save(13, state)
    assert mgr.save(13, state, force=True)
    # by-iter save lands under iters/ and is never pruned
    mgr.save(14, state, force=True, keep=True)
    assert os.path.isdir(tmp_path / "orbax" / "iters" / "14")
    r = mgr.restore(None, {"w": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(r["w"], state["w"])
    mgr.close()


def test_latest_slot_does_not_evict_epoch_saves(tmp_path):
    """save_latest_freq checkpoints are a single rolling slot (reference
    latest_net_*, base_model.py:152-156) — they must not count against
    the epoch namespace's max_to_keep."""
    from animateportrait_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "orbax"), max_to_keep=3,
                            save_interval_steps=10)
    mgr.save(10, {"w": np.full(2, 10, np.float32)})
    for s in (11, 12, 13, 14):
        mgr.save(s, {"w": np.full(2, s, np.float32)}, latest=True)
    # the epoch save survives all latest-cadence saves
    assert os.path.isdir(tmp_path / "orbax" / "10")
    # latest/ holds only the newest slot
    assert os.path.isdir(tmp_path / "orbax" / "latest" / "14")
    assert not os.path.isdir(tmp_path / "orbax" / "latest" / "13")
    # resume picks the rolling slot when it is newest
    assert mgr.latest_step() == 14
    r = mgr.restore(None, {"w": np.zeros(2, np.float32)})
    assert float(r["w"][0]) == 14.0
    # explicit epoch restore still hits the epoch namespace
    r = mgr.restore(10, {"w": np.zeros(2, np.float32)})
    assert float(r["w"][0]) == 10.0
    mgr.close()


def test_html_index_survives_logger_restart(tmp_path):
    """The gallery index is rebuilt from the images on disk, so a resumed
    run (fresh LossLogger) keeps every older snapshot reachable (the
    reference's util/html.py gallery accumulates for the experiment's
    life)."""
    from animateportrait_tpu.utils.observe import LossLogger

    v = {"fake_B": np.zeros((8, 8, 1), np.float32)}
    lg1 = LossLogger(str(tmp_path), "exp")
    lg1.save_visuals(v, epoch=1, iters=100)
    lg2 = LossLogger(str(tmp_path), "exp")   # resume: new process
    lg2.save_visuals(v, epoch=2, iters=50)
    idx = (tmp_path / "exp" / "web" / "index.html").read_text()
    assert "iters [100]" in idx and "iters [50]" in idx
    assert idx.index("epoch [2]") < idx.index("epoch [1]")


@pytest.mark.slow
def test_visuals_fn_outputs():
    """build_train_step's attached visuals_fn returns dashboard images +
    detected/target landmark aux of the right shapes."""
    cfg = _small_cfg()
    state, batch, frozen, step = _setup(cfg)
    vis, aux = jax.jit(step.visuals_fn)(state, batch, frozen)
    H = cfg.crop_size
    assert vis["fake_B"].shape == (1, H, H, cfg.output_nc)
    assert vis["fake_B2"].shape == (1, H, H, cfg.output_nc)
    assert vis["real_A"].shape == (1, H, H, 3)
    assert aux["fb_lm"].shape == (1, 68, 2)
    assert aux["tb_lm"].shape == (1, 68, 2)
    assert aux["winB"].shape == (1, 4)
    for v in list(vis.values()) + [aux["fb_lm"], aux["fb2_lm"]]:
        assert np.isfinite(np.asarray(v)).all()
