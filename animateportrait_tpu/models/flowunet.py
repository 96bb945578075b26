"""Intrinsic-flow regressor (FlowUnet) and its landmark-heatmap front end.

Behavioral reimplementation of
`Module2/intrinsic_flow_models/networks.py:509-644` (FlowUnet +
FlowUnetSkipConnectionBlock) and the inference wrapper `flow_network_warp`
(`Module2/models/geomcgt_ifw_test_model.py:12-76`): two 68-channel binary
keypoint maps at 224x224 go in; a x20-scaled flow field and a 3-class
visibility map come out, masked and bilinearly resized to 256.

The reference builds the Unet recursively; here the recursion is unrolled
into explicit down/up stacks (same parameter structure, NHWC). Norm is
BatchNorm (the flow checkpoint's train_opt norm), eval-mode running stats.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import ConvTranspose2dTorch, interpolate_bilinear
from animateportrait_tpu.ops.pack import s2d_conv_same, s2d_conv_stride2


class _Stride2Conv(nn.Module):
    """Parameter-identical drop-in for ``nn.Conv(features, (k, k),
    strides=2, padding=k//2, use_bias=False)`` computed space-to-depth
    packed (ops/pack.py) — the 16-channel stride-2 conv is otherwise
    lane-starved on the MXU (measured 13 GB/s; see pack.py)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), jnp.float32)
        if x.shape[1] % 2 or x.shape[2] % 2:
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (2, 2), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return s2d_conv_stride2(x, w)


class _SameConvPacked(nn.Module):
    """Parameter-identical drop-in for ``nn.Conv(features, (k, k),
    padding=k//2, use_bias=False)`` with 2x2 space-to-depth packing on
    both sides (ops/pack.py) — used for the 136->16 stem whose 16
    output lanes waste 7/8 of every MXU pass."""

    features: int
    kernel: int = 7

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), jnp.float32)
        if x.shape[1] % 2 or x.shape[2] % 2:
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return s2d_conv_same(x, w)


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class PredictFlow(nn.Module):
    """LeakyReLU(0.1) + 3x3 conv -> 2ch flow."""

    @nn.compact
    def __call__(self, x):
        return nn.Conv(2, (3, 3), padding=1, name="conv")(
            nn.leaky_relu(x, 0.1))


class FlowUnet(nn.Module):
    """FlowUnet with start_scale=2, nf=16, max_nf=512.

    num_scale defaults to 4: the reference constructor's default of 5 cannot
    run on the 224x224 keypoint maps the pipeline feeds it (112 is not
    divisible by 32 — the torch code errors on the skip concat), so the
    shipped FlowReg checkpoint's train_opt must use 4 scales.

    __call__(x: (N, 224, 224, input_nc)) ->
        (flow (N,224,224,2), vis (N,224,224,3), flow_pyramid, feat)
    """

    nf: int = 16
    num_scale: int = 4
    max_nf: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf, max_nf = self.nf, self.max_nf
        # conv_downsample: 7x7 stem + log2(start_scale)=1 stride-2 conv
        x = _SameConvPacked(nf, name="stem")(x)
        x = nn.leaky_relu(_BN(name="stem_bn")(x, train), 0.1)
        x = _Stride2Conv(nf * 2, name="down_pre")(x)
        x = nn.leaky_relu(_BN(name="down_pre_bn")(x, train), 0.1)
        nc = nf * 2

        outer = [min(max_nf, nc * 2 ** l) for l in range(self.num_scale)]
        inner = [min(max_nf, nc * 2 ** (l + 1))
                 for l in range(self.num_scale)]

        # --- encoder ---
        skips = []
        for l in range(self.num_scale):
            inp = x
            if l > 0:
                inp = nn.leaky_relu(inp, 0.2)
            y = nn.Conv(inner[l], (4, 4), strides=2, padding=1,
                        use_bias=False, name=f"down{l}")(inp)
            if l < self.num_scale - 1:
                # innermost block has no downnorm (down = [relu, conv])
                y = _BN(name=f"down{l}_bn")(y, train)
            skips.append(x)
            x = y

        # --- decoder with per-level flow heads ---
        flow_pyr = []
        for l in range(self.num_scale - 1, -1, -1):
            x = nn.relu(x)
            # outermost upconv is created without bias=use_bias in the
            # reference (networks.py:530-532), so it HAS a bias
            x = ConvTranspose2dTorch(
                outer[l], kernel=4, stride=2, padding=1, output_padding=0,
                use_bias=(l == 0), name=f"up{l}")(x)
            x = _BN(name=f"up{l}_bn")(x, train)
            flow_pyr.insert(0, PredictFlow(name=f"flow{l}")(x))
            if l > 0:
                x = jnp.concatenate([skips[l], x], axis=-1)
        feat = x

        vis = nn.Conv(3, (3, 3), padding=1, name="vis_conv")(
            nn.leaky_relu(feat, 0.1))

        H, W = feat.shape[1] * 2, feat.shape[2] * 2
        flow_out = interpolate_bilinear(flow_pyr[0], (H, W),
                                        align_corners=False)
        vis_out = interpolate_bilinear(vis, (H, W), align_corners=False)
        return flow_out, vis_out, flow_pyr, feat


def kp_to_map_binary(size_hw: tuple[int, int], kps: jax.Array,
                     radius: float = 4.0) -> jax.Array:
    """Binary-disc keypoint heatmaps (geomcgt_ifw_test_model.py:12-37).

    kps: (..., N, 2) (x, y); returns (..., H, W, N). Keypoints at (-1, -1)
    produce empty maps.
    """
    h, w = size_hw
    xg = jnp.arange(w, dtype=jnp.float32)
    yg = jnp.arange(h, dtype=jnp.float32)
    x = kps[..., 0][..., None, None, :]
    y = kps[..., 1][..., None, None, :]
    d2 = (xg[None, :, None] - x) ** 2 + (yg[:, None, None] - y) ** 2
    m = (d2 <= radius ** 2).astype(jnp.float32)
    invalid = jnp.logical_or(kps[..., 0] == -1, kps[..., 1] == -1)
    return m * (1.0 - invalid[..., None, None, :].astype(jnp.float32))


class FlowNetworkWarp:
    """Jitted equivalent of flow_network_warp
    (geomcgt_ifw_test_model.py:62-76): landmarks (256-space) -> (flow
    (N,256,256,2), mask (N,256,256,1))."""

    def __init__(self, variables, model: FlowUnet | None = None):
        self.variables = variables
        self.model = model or FlowUnet()
        self._jit = jax.jit(self._run)

    def _run(self, lm1, lm2):
        j1 = kp_to_map_binary((224, 224), lm1 * (7.0 / 8.0))
        j2 = kp_to_map_binary((224, 224), lm2 * (7.0 / 8.0))
        inp = jnp.concatenate([j1, j2], axis=-1)
        flow_out, vis_out, _, _ = self.model.apply(self.variables, inp)
        vis_cls = jnp.argmax(vis_out, axis=-1, keepdims=True)
        mask = (vis_cls < 2).astype(jnp.float32)
        flow = flow_out * 20.0 * mask
        warp_flow = interpolate_bilinear(
            flow * (8.0 / 7.0), (256, 256), align_corners=True)
        res_mask = interpolate_bilinear(mask, (256, 256),
                                        align_corners=True)
        return warp_flow, res_mask

    def __call__(self, lm1, lm2):
        return self._jit(jnp.asarray(lm1, jnp.float32)[None],
                         jnp.asarray(lm2, jnp.float32)[None])


def load_flowunet_params(sd, num_scale: int = 4) -> dict:
    """Reference `best_net_netF.pth` -> FlowUnet variables.

    torch names: conv_downsample.{0,1,3,4}; nested
    unet_block.(submodule.)*down.{idx}, .up.{idx}, .predict_flow.1; vis at
    predict_vis.1. Nesting depth d corresponds to scale level l=d.
    """
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def put_bn(name, torch_name):
        p, s = tc.batchnorm(sd, torch_name)
        params[name] = {"bn": p}
        stats[name] = {"bn": s}

    params["stem"] = {"kernel": tc.conv2d_kernel(
        sd["conv_downsample.0.weight"])}
    put_bn("stem_bn", "conv_downsample.1")
    params["down_pre"] = {"kernel": tc.conv2d_kernel(
        sd["conv_downsample.3.weight"])}
    put_bn("down_pre_bn", "conv_downsample.4")

    prefix = "unet_block."
    for l in range(num_scale):
        innermost = l == num_scale - 1
        outermost = l == 0
        # torch Sequential indices inside the block
        if outermost:
            down_conv, up_conv, up_bn = "down.0", "up.1", "up.2"
            down_bn = "down.1"
        elif innermost:
            down_conv, up_conv, up_bn = "down.1", "up.1", "up.2"
            down_bn = None
        else:
            down_conv, up_conv, up_bn = "down.1", "up.1", "up.2"
            down_bn = "down.2"
        params[f"down{l}"] = {"kernel": tc.conv2d_kernel(
            sd[f"{prefix}{down_conv}.weight"])}
        if down_bn is not None:
            put_bn(f"down{l}_bn", f"{prefix}{down_bn}")
        params[f"up{l}"] = {"kernel": tc.conv_transpose2d_kernel(
            sd[f"{prefix}{up_conv}.weight"])}
        if outermost:
            params[f"up{l}"]["bias"] = np.asarray(
                sd[f"{prefix}{up_conv}.bias"])
        put_bn(f"up{l}_bn", f"{prefix}{up_bn}")
        params[f"flow{l}"] = {
            "conv": tc.conv2d(sd, f"{prefix}predict_flow.1")}
        prefix += "submodule."

    params["vis_conv"] = tc.conv2d(sd, "predict_vis.1")
    return {"params": params, "batch_stats": stats}
