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


def test_native_decode_image_matches_pil():
    import numpy as np
    import pytest
    from PIL import Image

    from animateportrait_tpu.utils import native

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (41, 33, 3), dtype=np.uint8)
    import tempfile, os
    d = tempfile.mkdtemp()
    png = os.path.join(d, "t.png")
    jpg = os.path.join(d, "t.jpg")
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=90)
    out = native.decode_image(png)
    if not native.available() or out is None:
        pytest.skip("native decode unavailable (lib missing or stale)")
    assert np.array_equal(out, arr)
    outg = native.decode_image(png, grayscale=True)
    assert np.array_equal(outg, np.asarray(Image.fromarray(arr).convert("L")))
    outj = native.decode_image(jpg)
    pil_j = np.asarray(Image.open(jpg).convert("RGB"))
    assert np.abs(outj.astype(int) - pil_j.astype(int)).max() <= 1
    # grayscale png path (single channel source)
    gpng = os.path.join(d, "g.png")
    Image.fromarray(arr[..., 0]).save(gpng)
    outg2 = native.decode_image(gpng, grayscale=True)
    assert np.array_equal(outg2, arr[..., 0])


def test_native_decode_alpha_and_16bit():
    import numpy as np
    import pytest
    from PIL import Image

    from animateportrait_tpu.utils import native

    import tempfile, os
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (21, 19, 4), dtype=np.uint8)
    p_rgba = os.path.join(d, "a.png")
    Image.fromarray(rgba, "RGBA").save(p_rgba)
    out = native.decode_image(p_rgba)
    if out is None:
        pytest.skip("native decode unavailable")
    # PIL convert("RGB") drops alpha; decode must match and be
    # deterministic across calls
    pil = np.asarray(Image.open(p_rgba).convert("RGB"))
    assert np.array_equal(out, pil)
    assert np.array_equal(native.decode_image(p_rgba), out)
    # 16-bit PNG: native refuses (returns None) -> PIL fallback path
    p16 = os.path.join(d, "g16.png")
    arr16 = rng.integers(0, 65536, (9, 11), dtype=np.uint16)
    Image.fromarray(arr16.astype(np.int32), "I").save(p16)
    assert native.decode_image(p16) is None
