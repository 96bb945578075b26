"""Every module in the package imports cleanly."""
import importlib
import pkgutil

import animateportrait_tpu


def test_all_modules_import():
    pkg = animateportrait_tpu
    failures = []
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{mod.name}: {e!r}")
    assert not failures, "\n".join(failures)


def test_smoke_random_variables_match_init_structure():
    """eval_shape-based random variables (utils/smoke.py) must mirror a
    real flax init: same tree structure, shapes, dtypes, stable stats
    (norm scale/var = 1, bias/mean = 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from animateportrait_tpu.models.flowunet import FlowUnet
    from animateportrait_tpu.utils.smoke import random_variables

    model = FlowUnet(nf=4, max_nf=16, num_scale=2)
    init_fn = lambda: model.init(  # noqa: E731
        jax.random.key(0), jnp.zeros((1, 32, 32, 8)))
    real = init_fn()
    fake = random_variables(init_fn)
    rl = jax.tree_util.tree_leaves_with_path(real)
    fl = jax.tree_util.tree_leaves_with_path(fake)
    assert len(rl) == len(fl)
    for (pr, vr), (pf, vf) in zip(rl, fl):
        assert pr == pf
        assert vr.shape == vf.shape and vr.dtype == vf.dtype
        p = "/".join(str(getattr(q, "key", q)) for q in pf).lower()
        if p.endswith("scale") or p.endswith("var"):
            np.testing.assert_array_equal(np.asarray(vf), 1.0)
        if p.endswith("mean"):
            np.testing.assert_array_equal(np.asarray(vf), 0.0)
    # and the filled variables actually run
    out = model.apply(fake, jnp.ones((1, 32, 32, 8)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out[:2])
