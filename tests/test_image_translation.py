"""Image-translation renderer: ResUnet parity vs a torch replica; VGG19
slice shapes; gram/style loss parity."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_resunet_smoke(rng):
    from animateportrait_tpu.models.image_translation import (
        ResUnetGenerator)

    g = ResUnetGenerator(output_nc=3, num_downs=6, ngf=8)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 6)), jnp.float32)
    v = g.init(jax.random.key(0), x)
    out = g.apply(v, x)
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vgg19_slices_and_losses(rng):
    from animateportrait_tpu.models.image_translation import (
        Vgg19Features, gram_matrix, vgg_loss)

    m = Vgg19Features()
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [64, 128, 256, 512, 512]
    assert outs[0].shape[1] == 64 and outs[-1].shape[1] == 4

    # gram matrix parity vs torch formulation
    f = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(f)))
    ft = torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
    a, b, c, d = ft.shape
    feats = ft.reshape(a * b, c * d)
    ref = (feats @ feats.t() / (a * b * c * d)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    y = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    l, sl = vgg_loss(v, x, y, style=True)
    assert np.isfinite(float(l)) and np.isfinite(float(sl))


def test_with_audio_dataset_windows():
    from animateportrait_tpu.data.image_translation import (
        ImageTranslationWithAudioDataset, audio_stft_map)

    rng = np.random.default_rng(0)
    t, size = 30, 64
    frames = rng.integers(0, 255, (t, size, size, 3)).astype(np.uint8)
    lms = rng.uniform(0, size, (t, 68, 2)).astype(np.float32)
    wav = rng.standard_normal(int(16000 * t / 25.0)).astype(np.float32)
    m = audio_stft_map(wav)
    # 640-pt nperseg -> 321 freq bins; /max preserves the reference's
    # sign quirk when the log-power max is negative, so only finiteness
    # and shape are guaranteed
    assert m.shape[0] == 321 and np.all(np.isfinite(m))
    ds = ImageTranslationWithAudioDataset(frames, lms, wav, num_frames=2)
    out = ds.sample_with_audio(np.random.default_rng(1))
    assert out["image_in"].shape == (2, size, size, 3)
    assert out["image_out"].shape == (2, size, size, 3)
    assert out["audio_in"].shape == (2, size, size, 1)


def test_record_tracker():
    from animateportrait_tpu.utils.observe import Record

    r = Record(["loss"])
    r.add(2.0)
    r.add(4.0)
    assert abs(r.per("loss") - 3.0) < 1e-9
    assert r.is_better("loss", greater=False)  # first call is True
    r.clean("loss")
    r.add(1.0)
    assert r.is_better("loss", greater=False)
    r.add(100.0)
    assert not r.is_better("loss", greater=False)
