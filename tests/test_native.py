"""Native batch assembler: parity with the numpy fallback + roundtrip."""
import numpy as np


def test_assemble_batch_matches_fallback(rng):
    from animateportrait_tpu.utils import native

    imgs = [rng.integers(0, 255, (70, 80, 3)).astype(np.uint8)
            for _ in range(5)]
    crop_xy = rng.integers(0, 10, (5, 2)).astype(np.int32)
    flips = rng.integers(0, 2, 5).astype(bool)

    got = native.assemble_batch(imgs, crop_xy, flips, 64)
    # oracle
    ref = np.empty((5, 64, 64, 3), np.float32)
    for i, im in enumerate(imgs):
        x, y = crop_xy[i]
        w = im[y: y + 64, x: x + 64]
        if flips[i]:
            w = w[:, ::-1]
        ref[i] = w.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # grayscale, no normalize
    g = [rng.integers(0, 255, (70, 80)).astype(np.uint8) for _ in range(3)]
    got = native.assemble_batch(g, crop_xy[:3], flips[:3], 64,
                                normalize=False)
    assert got.shape == (3, 64, 64, 1)
    assert got.min() >= 0 and got.max() <= 1


def test_float_to_pcm16(rng):
    from animateportrait_tpu.utils import native

    x = rng.uniform(-1.2, 1.2, 1000).astype(np.float32)
    got = native.float_to_pcm16(x)
    ref = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, ref)


def test_native_lib_available():
    from animateportrait_tpu.utils import native

    # the shared library should be built in this repo
    assert native.available(), "run `make -C native`"
