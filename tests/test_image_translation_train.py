"""Image-translation trainer + dataset smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_dataset_and_train_step(rng):
    from animateportrait_tpu.data.image_translation import (
        ImageTranslationDataset)
    from animateportrait_tpu.train.image_translation import (
        ImageTranslationConfig, build_image_translation_train_step,
        init_image_translation_state)

    T, H = 6, 128
    frames = rng.integers(0, 255, (T, H, H, 3)).astype(np.uint8)
    theta = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    lm = np.stack([H / 2 + 30 * np.cos(theta),
                   H / 2 + 30 * np.sin(theta)], -1)
    lms = np.stack([lm + i for i in range(T)])
    ds = ImageTranslationDataset(frames, lms)
    batch = ds.batch([0, 1], np.random.default_rng(0))
    assert batch["image_in"].shape == (2, H, H, 6)
    assert batch["image_out"].shape == (2, H, H, 3)

    cfg = ImageTranslationConfig(ngf=8, num_downs=6, use_vgg=False)
    state = init_image_translation_state(cfg, jax.random.key(0), size=H)
    step = jax.jit(build_image_translation_train_step(cfg))
    s1, m = step(state, jnp.asarray(batch["image_in"]),
                 jnp.asarray(batch["image_out"]))
    assert np.isfinite(float(m["loss"]))
    p0 = jax.tree_util.tree_leaves(state.variables["params"])[0]
    p1 = jax.tree_util.tree_leaves(s1.variables["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
