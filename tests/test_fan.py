"""FAN landmark net: parity of the heatmap decoder vs the reference loop and
a forward smoke test."""
import numpy as np
import torch

import jax
import jax.numpy as jnp


def _ref_get_preds(hm_t):
    """Direct transcription of get_preds_fromhm (utils.py:259-279)."""
    mx, idx = torch.max(
        hm_t.view(hm_t.size(0), hm_t.size(1), hm_t.size(2) * hm_t.size(3)),
        2)
    idx += 1
    preds = idx.view(idx.size(0), idx.size(1), 1).repeat(1, 1, 2).float()
    preds[..., 0].apply_(lambda x: (x - 1) % hm_t.size(3) + 1)
    preds[..., 1].add_(-1).div_(hm_t.size(2)).floor_().add_(1)
    for i in range(preds.size(0)):
        for j in range(preds.size(1)):
            hm_ = hm_t[i, j, :]
            pX, pY = int(preds[i, j, 0]) - 1, int(preds[i, j, 1]) - 1
            if 0 < pX < hm_t.size(3) - 1 and 0 < pY < hm_t.size(2) - 1:
                diff = torch.FloatTensor(
                    [hm_[pY, pX + 1] - hm_[pY, pX - 1],
                     hm_[pY + 1, pX] - hm_[pY - 1, pX]])
                preds[i, j].add_(diff.sign_().mul_(.25))
    preds.add_(-0.5)
    return preds


def test_heatmap_decoding_parity(rng):
    from animateportrait_tpu.models.fan import heatmaps_to_landmarks

    hm = rng.standard_normal((2, 64, 64, 5)).astype(np.float32)
    ours = np.asarray(heatmaps_to_landmarks(jnp.asarray(hm)))
    ref = _ref_get_preds(
        torch.from_numpy(np.transpose(hm, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fan_forward_smoke(rng):
    from animateportrait_tpu.models.fan import FAN

    fan = FAN(num_modules=2, num_landmarks=68)
    x = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)), jnp.float32)
    v = fan.init(jax.random.key(0), x)
    outs, bnds = fan.apply(v, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 64, 64, 69)
    assert bnds[0].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(outs[-1])).all()
