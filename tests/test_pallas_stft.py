"""Pallas fused STFT kernel parity vs the XLA framing+matmul path."""
import numpy as np

import jax.numpy as jnp


def test_pallas_stft_matches_xla(rng):
    from animateportrait_tpu.ops.pallas_stft import stft_magnitude_pallas
    from animateportrait_tpu.ops.spectral import stft_magnitude

    x = rng.standard_normal(16000 + 37).astype(np.float32) * 0.3
    ref = np.asarray(stft_magnitude(jnp.asarray(x)))
    got = np.asarray(stft_magnitude_pallas(jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)
