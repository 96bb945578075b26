"""Module1 trainer smoke tests: losses finite and parameters move."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_content_train_step(rng):
    from animateportrait_tpu.train.module1 import (
        ContentConfig, build_content_train_step, init_content_state)

    cfg = ContentConfig()
    state = init_content_state(cfg, jax.random.key(0))
    step = jax.jit(build_content_train_step(cfg))
    N, W = 6, 18
    fls = jnp.asarray(rng.standard_normal((N, W, 204)), jnp.float32)
    aus = jnp.asarray(rng.standard_normal((N, W, 80)), jnp.float32)
    fid = jnp.asarray(rng.standard_normal((1, 204)), jnp.float32)
    s1, m = step(state, fls, aus, fid)
    assert np.isfinite(float(m["loss"]))
    p0 = jax.tree_util.tree_leaves(state.variables["params"])[0]
    p1 = jax.tree_util.tree_leaves(s1.variables["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # BN stats update in train mode
    b0 = jax.tree_util.tree_leaves(state.variables["batch_stats"])[0]
    b1 = jax.tree_util.tree_leaves(s1.variables["batch_stats"])[0]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))


@pytest.mark.slow
def test_speaker_aware_train_step(rng):
    from animateportrait_tpu.train.module1 import (
        SpeakerAwareConfig, build_speaker_aware_train_step,
        init_speaker_aware_state)

    cfg = SpeakerAwareConfig()
    state = init_speaker_aware_state(cfg, jax.random.key(0))
    step = jax.jit(build_speaker_aware_train_step(cfg))
    T, W = 6, 18
    aus = jnp.asarray(rng.standard_normal((T, W, 80)), jnp.float32)
    embs = jnp.asarray(rng.standard_normal((T, 256)), jnp.float32)
    fid = jnp.asarray(rng.standard_normal((1, 204)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((T, 204)), jnp.float32)
    quat = jnp.asarray(rng.standard_normal((T, 4)), jnp.float32)
    trans = jnp.asarray(rng.standard_normal((T, 3, 4)), jnp.float32)
    s1, m = step(state, aus, embs, fid, gt, quat, trans,
                 jax.random.key(1))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
