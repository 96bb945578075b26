"""LPIPS learned perceptual metric (PNetLin) and the ranking-loss heads.

Behavioral reimplementation of `Module2/models/networks_basic.py` and the
feature extractors in `Module2/models/pretrained_networks.py` (vgg16 :97-138,
alexnet :57-95, squeezenet :6-54). Registered in the reference but unused by
its main paths; included for full §2.8 inventory parity and as an eval
metric.

All NHWC flax; backbones are frozen feature extractors (converted from
torchvision state dicts via the ``load_*`` helpers)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import interpolate_bilinear, max_pool_ceil

# ImageNet-ish input scaling (networks_basic.py:92-99)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def scaling_layer(x: jax.Array) -> jax.Array:
    """ScalingLayer (networks_basic.py:92-99); x in [-1, 1] RGB."""
    return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)


def normalize_tensor(feat: jax.Array, eps: float = 1e-10) -> jax.Array:
    """util.normalize_tensor (Module2/util/util.py:100-102), channel-last."""
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


def _max_pool(x, window=2, stride=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), "VALID")


class Vgg16Features(nn.Module):
    """vgg16 slices 1-5 ending at relu{1_2,2_2,3_3,4_3,5_3}
    (pretrained_networks.py:97-138)."""

    @nn.compact
    def __call__(self, x):
        cfg = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
               (512, 512, 512))
        outs = []
        i = 0
        for b, block in enumerate(cfg):
            if b > 0:
                x = _max_pool(x)
            for c in block:
                x = nn.relu(nn.Conv(c, (3, 3), padding=1,
                                    name=f"conv{i}")(x))
                i += 1
            outs.append(x)
        return outs


class AlexNetFeatures(nn.Module):
    """alexnet slices 1-5 (pretrained_networks.py:57-95)."""

    @nn.compact
    def __call__(self, x):
        outs = []
        x = nn.relu(nn.Conv(64, (11, 11), strides=4, padding=2,
                            name="conv0")(x))
        outs.append(x)
        x = _max_pool(x, 3, 2)
        x = nn.relu(nn.Conv(192, (5, 5), padding=2, name="conv1")(x))
        outs.append(x)
        x = _max_pool(x, 3, 2)
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, name="conv2")(x))
        outs.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv3")(x))
        outs.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv4")(x))
        outs.append(x)
        return outs


class Fire(nn.Module):
    """torchvision squeezenet Fire module."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1,
                             name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """squeezenet1_1 slices 1-7 (pretrained_networks.py:6-54);
    ceil-mode max pools."""

    @nn.compact
    def __call__(self, x):
        outs = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=2, padding=0,
                            name="conv0")(x))
        outs.append(x)                                     # slice1 [0,2)
        x = max_pool_ceil(x, 3, 2)
        x = Fire(16, 64, name="fire3")(x)
        x = Fire(16, 64, name="fire4")(x)
        outs.append(x)                                     # slice2 [2,5)
        x = max_pool_ceil(x, 3, 2)
        x = Fire(32, 128, name="fire6")(x)
        x = Fire(32, 128, name="fire7")(x)
        outs.append(x)                                     # slice3 [5,8)
        x = max_pool_ceil(x, 3, 2)
        x = Fire(48, 192, name="fire9")(x)
        outs.append(x)                                     # slice4 [8,10)
        x = Fire(48, 192, name="fire10")(x)
        outs.append(x)                                     # slice5
        x = Fire(64, 256, name="fire11")(x)
        outs.append(x)                                     # slice6
        x = Fire(64, 256, name="fire12")(x)
        outs.append(x)                                     # slice7
        return outs


_BACKBONES = {
    "vgg": (Vgg16Features, (64, 128, 256, 512, 512)),
    "vgg16": (Vgg16Features, (64, 128, 256, 512, 512)),
    "alex": (AlexNetFeatures, (64, 192, 384, 256, 256)),
    "squeeze": (SqueezeNetFeatures, (64, 128, 256, 384, 384, 512, 512)),
}


class PNetLin(nn.Module):
    """Learned perceptual metric (networks_basic.py:22-89).

    __call__(in0, in1) -> (N, 1, 1, 1) distance (or per-pixel maps when
    ``spatial``). ``lpips=False`` sums raw squared feature differences.
    Dropout in the lin layers is an eval-time no-op.
    """

    pnet_type: str = "vgg"
    spatial: bool = False
    lpips: bool = True
    version: str = "0.1"

    @nn.compact
    def __call__(self, in0, in1, ret_per_layer: bool = False):
        net_cls, chns = _BACKBONES[self.pnet_type]
        net = net_cls(name="net")
        if self.version == "0.1":
            in0, in1 = scaling_layer(in0), scaling_layer(in1)
        outs0, outs1 = net(in0), net(in1)
        res = []
        for k, (f0, f1) in enumerate(zip(outs0, outs1)):
            d = jnp.square(normalize_tensor(f0) - normalize_tensor(f1))
            if self.lpips:
                d = nn.Conv(1, (1, 1), use_bias=False,
                            name=f"lin{k}")(d)
            else:
                d = jnp.sum(d, axis=-1, keepdims=True)
            if self.spatial:
                d = interpolate_bilinear(d, in0.shape[1:3],
                                         align_corners=False)
            else:
                d = jnp.mean(d, axis=(1, 2), keepdims=True)
            res.append(d)
        val = sum(res[1:], res[0])
        if ret_per_layer:
            return val, res
        return val


class Dist2LogitLayer(nn.Module):
    """(networks_basic.py:112-125): 2 distances -> [0,1] judgement."""

    chn_mid: int = 32
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, d0, d1, eps: float = 0.1):
        x = jnp.concatenate(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1)
        x = nn.leaky_relu(nn.Conv(self.chn_mid, (1, 1), name="conv0")(x),
                          0.2)
        x = nn.leaky_relu(nn.Conv(self.chn_mid, (1, 1), name="conv1")(x),
                          0.2)
        x = nn.Conv(1, (1, 1), name="conv2")(x)
        return nn.sigmoid(x) if self.use_sigmoid else x


def bce_ranking_loss(logit: jax.Array, judge: jax.Array,
                     eps: float = 1e-7) -> jax.Array:
    """BCERankingLoss (networks_basic.py:127-137): judge in [-1, 1]."""
    per = (judge + 1.0) / 2.0
    logit = jnp.clip(logit, eps, 1.0 - eps)
    return -jnp.mean(per * jnp.log(logit) + (1 - per) * jnp.log(1 - logit))


def l2_rgb(in0: jax.Array, in1: jax.Array) -> jax.Array:
    """L2 FakeNet metric, RGB colorspace (networks_basic.py:146-153)."""
    return jnp.mean(jnp.square(in0 - in1), axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# torchvision state-dict converters
# ---------------------------------------------------------------------------

def load_vgg16_features(sd) -> dict:
    """torchvision vgg16 'features.<i>.*' -> Vgg16Features params."""
    from animateportrait_tpu.io import torch_convert as tc
    sd = tc.strip_module_prefix(sd)
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    return {"params": {f"conv{i}": tc.conv2d(sd, f"features.{t}")
                       for i, t in enumerate(idx)}}


def load_alexnet_features(sd) -> dict:
    from animateportrait_tpu.io import torch_convert as tc
    sd = tc.strip_module_prefix(sd)
    idx = [0, 3, 6, 8, 10]
    return {"params": {f"conv{i}": tc.conv2d(sd, f"features.{t}")
                       for i, t in enumerate(idx)}}


def load_squeezenet_features(sd) -> dict:
    from animateportrait_tpu.io import torch_convert as tc
    sd = tc.strip_module_prefix(sd)
    p = {"conv0": tc.conv2d(sd, "features.0")}
    for t in (3, 4, 6, 7, 9, 10, 11, 12):
        p[f"fire{t}"] = {
            "squeeze": tc.conv2d(sd, f"features.{t}.squeeze"),
            "expand1x1": tc.conv2d(sd, f"features.{t}.expand1x1"),
            "expand3x3": tc.conv2d(sd, f"features.{t}.expand3x3")}
    return {"params": p}


def load_pnetlin_params(pnet_sd, lins_sd=None,
                        pnet_type: str = "vgg") -> dict:
    """(torchvision backbone sd, LPIPS 'lin<k>.model.1.weight' sd) ->
    PNetLin variables."""
    from animateportrait_tpu.io import torch_convert as tc
    loader = {"vgg": load_vgg16_features, "vgg16": load_vgg16_features,
              "alex": load_alexnet_features,
              "squeeze": load_squeezenet_features}[pnet_type]
    params = {"net": loader(pnet_sd)["params"]}
    if lins_sd is not None:
        lins_sd = tc.strip_module_prefix(lins_sd)
        k = 0
        while f"lin{k}.model.1.weight" in lins_sd:
            params[f"lin{k}"] = {"kernel": tc.conv2d_kernel(
                lins_sd[f"lin{k}.model.1.weight"])}
            k += 1
    return {"params": params}
