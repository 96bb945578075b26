"""Orbax checkpoint round trips for the Module2 train state."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_trainstate_roundtrip(tmp_path):
    from animateportrait_tpu.io.checkpoint import restore, save
    from animateportrait_tpu.train.module2 import (
        Module2Config, init_state, make_example_batch)

    cfg = Module2Config(crop_size=64, output_nc=1, ngf=8, ndf=8,
                        pool_size=2, steps_per_epoch=2)
    state = init_state(cfg, jax.random.key(0),
                       make_example_batch(cfg, 1))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ckpt")
    save(path, state)
    restored = restore(path, state)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.g_params)
    b = jax.tree_util.tree_leaves(restored.g_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_checkpoint_manager(tmp_path):
    from animateportrait_tpu.io.checkpoint import CheckpointManager
    from animateportrait_tpu.train.module2 import (
        Module2Config, init_state, make_example_batch)

    cfg = Module2Config(crop_size=64, output_nc=1, ngf=8, ndf=8,
                        pool_size=2, steps_per_epoch=2)
    state = init_state(cfg, jax.random.key(0),
                       make_example_batch(cfg, 1))
    mgr = CheckpointManager(str(tmp_path / "mgr"), save_interval_steps=1)
    assert mgr.latest_step() is None
    mgr.save(1, state)
    mgr.save(2, state.replace(step=jnp.asarray(2, jnp.int32)))
    assert mgr.latest_step() == 2
    restored = mgr.restore(None, state)
    assert int(restored.step) == 2
    mgr.close()


def test_grad_norms():
    from animateportrait_tpu.utils.observe import grad_norms

    g = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.zeros((2, 2))}
    out = grad_norms(g)
    np.testing.assert_allclose(float(out["global_norm"]), 5.0, atol=1e-6)
    np.testing.assert_allclose(float(out["mean_abs"]), 7.0 / 6.0, atol=1e-6)


def test_flax_npz_roundtrip(tmp_path):
    """Native <name>.flax.npz frozen checkpoints (the format
    train_cli --frozen_dir prefers over converted torch files)."""
    from animateportrait_tpu.io.checkpoint import (load_flax_npz,
                                                   save_flax_npz)

    variables = {
        "params": {"conv1": {"kernel": np.arange(12.0).reshape(2, 2, 3),
                             "bias": np.zeros(3)},
                   "block": {"bn": {"scale": np.ones(4)}}},
        "batch_stats": {"block": {"bn": {"mean": np.full(4, 0.5),
                                         "var": np.full(4, 2.0)}}},
    }
    path = str(tmp_path / "net.flax.npz")
    save_flax_npz(path, variables)
    got = load_flax_npz(path)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(got)
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_choice_validation(monkeypatch):
    from animateportrait_tpu.nn import env_choice

    monkeypatch.delenv("AP_TEST_KNOB", raising=False)
    assert env_choice("AP_TEST_KNOB", "a", ("a", "b")) == "a"
    monkeypatch.setenv("AP_TEST_KNOB", "b")
    assert env_choice("AP_TEST_KNOB", "a", ("a", "b")) == "b"
    monkeypatch.setenv("AP_TEST_KNOB", "oops")
    with pytest.raises(ValueError, match="AP_TEST_KNOB"):
        env_choice("AP_TEST_KNOB", "a", ("a", "b"))
