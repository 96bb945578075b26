"""FAN landmark net: parity of the heatmap decoder vs the reference loop and
a forward smoke test."""
import numpy as np
import pytest
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


@pytest.mark.slow
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


def _ref_gaussian_patch(size=3, sigma=0.25):
    """utils.py:_gaussian (:17-40), direct numpy port."""
    import math
    cx = 0.5 * size + 0.5
    cy = 0.5 * size + 0.5
    g = np.empty((size, size), np.float32)
    for i in range(size):
        for j in range(size):
            g[i][j] = math.exp(-(((j + 1 - cx) / (sigma * size)) ** 2 / 2.0
                                 + ((i + 1 - cy) / (sigma * size)) ** 2
                                 / 2.0))
    return g


def _ref_draw_gaussian(image, point, sigma):
    """utils.py:draw_gaussian (:42-81), direct numpy port."""
    ul = [np.floor(np.floor(point[0]) - 3 * sigma),
          np.floor(np.floor(point[1]) - 3 * sigma)]
    br = [np.floor(np.floor(point[0]) + 3 * sigma),
          np.floor(np.floor(point[1]) + 3 * sigma)]
    if (ul[0] > image.shape[1] or ul[1] > image.shape[0]
            or br[0] < 1 or br[1] < 1):
        return image
    size = 6 * sigma + 1
    g = _ref_gaussian_patch(size, 0.25)
    g_x = [int(max(1, -ul[0])), int(min(br[0], image.shape[1]))
           - int(max(1, ul[0])) + int(max(1, -ul[0]))]
    g_y = [int(max(1, -ul[1])), int(min(br[1], image.shape[0]))
           - int(max(1, ul[1])) + int(max(1, -ul[1]))]
    img_x = [int(max(1, ul[0])), int(min(br[0], image.shape[1]))]
    img_y = [int(max(1, ul[1])), int(min(br[1], image.shape[0]))]
    image[img_y[0] - 1:img_y[1], img_x[0] - 1:img_x[1]] = \
        image[img_y[0] - 1:img_y[1], img_x[0] - 1:img_x[1]] + \
        g[g_y[0] - 1:g_y[1], g_x[0] - 1:g_x[1]]
    image[image > 1] = 1
    return image


def test_draw_gaussian_matches_reference():
    from animateportrait_tpu.models.fan import draw_gaussian

    for pt in ((10.0, 7.0), (10.7, 7.2), (1.0, 1.0), (0.0, 0.0),
               (15.5, 12.9), (14.0, 2.0)):
        ref = _ref_draw_gaussian(np.zeros((13, 16), np.float32), pt, 1)
        ours = np.asarray(draw_gaussian(jnp.zeros((13, 16)),
                                        jnp.asarray(pt), 1))
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"point {pt}")


def test_gaussian_heatmaps_stack_and_boundary():
    from animateportrait_tpu.models.fan import gaussian_heatmaps

    pts = jnp.asarray([[8.0, 8.0], [20.0, 10.0]])
    hm = gaussian_heatmaps(pts, (16, 24), sigma=1, boundary=True)
    assert hm.shape == (16, 24, 3)
    # boundary channel is the clipped accumulation of both points
    np.testing.assert_allclose(
        np.asarray(hm[..., 2]),
        np.minimum(np.asarray(hm[..., 0] + hm[..., 1]), 1.0), atol=1e-6)


def test_adaptive_wing_loss_properties():
    from animateportrait_tpu.models.fan import adaptive_wing_loss

    target = jnp.full((4, 8, 8, 2), 0.3)
    assert float(adaptive_wing_loss(target, target)) == 0.0
    near = adaptive_wing_loss(target + 0.1, target)
    far = adaptive_wing_loss(target + 2.0, target)
    assert float(near) > 0 and float(far) > float(near)
    # gradient exists and is finite everywhere incl. the theta boundary
    g = jax.grad(lambda p: adaptive_wing_loss(p, target))(target + 0.5)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fan_nme_zero_for_exact_heatmaps():
    from animateportrait_tpu.models.fan import (fan_nme,
                                                heatmaps_to_landmarks)

    rng = np.random.default_rng(0)
    hm = np.zeros((2, 64, 64, 68), np.float32)
    px = rng.integers(5, 59, (2, 68))
    py = rng.integers(5, 59, (2, 68))
    for b in range(2):
        for c in range(68):
            hm[b, py[b, c], px[b, c], c] = 1.0
    pred_lm = np.asarray(heatmaps_to_landmarks(jnp.asarray(hm))) * 4.0
    nme = fan_nme(jnp.asarray(hm), jnp.asarray(pred_lm), 68)
    assert float(nme) < 1e-5
    # perturbing gt increases the error
    nme2 = fan_nme(jnp.asarray(hm), jnp.asarray(pred_lm + 3.0), 68)
    assert float(nme2) > float(nme)
