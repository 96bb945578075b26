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
