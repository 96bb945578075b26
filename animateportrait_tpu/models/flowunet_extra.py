"""Residual intrinsic-flow nets: FlowUnet_v2 and DualUnetGenerator.

Behavioral reimplementation of the remaining network classes in
`Module2/intrinsic_flow_models/networks.py`:

- ``FlowUnetV2`` (:647-744): a residual-block Unet with PixelShuffle
  upsampling and per-scale flow heads; same (flow, vis, pyramid, feat)
  interface as FlowUnet.
- ``DualUnetGenerator`` (:233-431): two encoders (pose + appearance) whose
  appearance skip features are warped to the target pose by an input flow,
  with visibility gating, fused at the bottleneck and decoded with
  dual skip connections. (Consumed by the reference's pose_transfer_model;
  included for full networks.py parity.)
- building blocks ``ResidualBlock`` (:26-60), ``GateBlock`` (:62-75),
  ``channel_mapping``/``conv`` (:16-24).

Everything is NHWC flax; norm is BatchNorm in eval mode (the reference's
``norm='batch'`` default). A reference quirk preserved here: the
appearance-encoder downsample is registered under BOTH names from the same
module (`networks.py:327` assigns ``p_downsample`` to ``enca_%d_downsample``),
so pose and appearance encoders share downsample weights.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.ops.warp import warp_acc_flow


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch.nn.PixelShuffle in NHWC: (N,H,W,C*r^2) -> (N,Hr,Wr,C).

    Matches torch's channel ordering: input channel c*r*r + i*r + j maps to
    output (c, h*r+i, w*r+j).
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class _ConvNorm(nn.Module):
    """conv() (networks.py:16-22): Conv2d + BatchNorm, no-norm variant for
    no_end_norm (Identity + bias)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    end_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding,
                    use_bias=not self.end_norm, name="conv")(x)
        if self.end_norm:
            x = _BN(name="norm")(x, train)
        return x


def _act(x, slope: float = 0.0):
    """The networks' configurable activation (G_activation): relu by
    default, leaky_relu(slope) when ``slope`` > 0."""
    return nn.leaky_relu(x, slope) if slope else nn.relu(x)


class ResidualBlock(nn.Module):
    """networks.py:26-60. ``dim_a`` > 0 adds a second input mapped through a
    1x1 conv and concatenated before the 3x3 residual conv. Dropout is an
    eval-time no-op."""

    dim: int
    dim_a: int = 0
    no_end_norm: bool = False
    slope: float = 0.0

    @nn.compact
    def __call__(self, x, a=None, train: bool = False):
        if self.dim_a > 0:
            a = _ConvNorm(self.dim, kernel=1, name="conv_a")(
                _act(a, self.slope), train)
            residual = jnp.concatenate([x, a], axis=-1)
        else:
            residual = x
        residual = _ConvNorm(self.dim, kernel=3, padding=1,
                             end_norm=not self.no_end_norm,
                             name="conv")(_act(residual, self.slope), train)
        return x + residual


class GateBlock(nn.Module):
    """networks.py:62-75: sigmoid gate over a side input."""

    dim: int

    @nn.compact
    def __call__(self, x, a):
        g = nn.sigmoid(nn.Conv(self.dim, (1, 1), name="conv")(nn.relu(a)))
        return x * g


class _Downsample(nn.Module):
    """[activation, Conv2d k3 s2 p1, norm] (networks.py:297-302)."""

    features: int
    slope: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=2, padding=1,
                    use_bias=False, name="conv")(_act(x, self.slope))
        return _BN(name="norm")(x, train)


class _Upsample(nn.Module):
    """[activation, Conv2d c->4c_out k3 p1, PixelShuffle(2), norm]
    (networks.py:337-343)."""

    features: int  # channels after the shuffle
    slope: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features * 4, (3, 3), padding=1, use_bias=False,
                    name="conv")(_act(x, self.slope))
        x = pixel_shuffle(x, 2)
        return _BN(name="norm")(x, train)


class _PredHead(nn.Module):
    """[activation, Conv2d k3 p1 bias] flow/vis head (networks.py:710-720)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding=1,
                       name="conv")(nn.relu(x))


class FlowUnetV2(nn.Module):
    """FlowUnet_v2 (networks.py:647-744).

    __call__(x (N,H,W,input_nc)) -> (flow, vis, flow_pyramid, feat) with
    flow/vis bilinearly upsampled by ``start_scale`` (align_corners=False).
    """

    nf: int = 64
    max_nf: int = 256
    start_scale: int = 2
    num_scales: int = 7
    n_residual_blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf, max_nf = self.nf, self.max_nf
        start_level = int(np.log2(self.start_scale))
        # pre_conv: channel mapping + start_level strided residual stages
        x = _ConvNorm(nf, kernel=1, name="pre_map")(x, train)
        for i in range(start_level):
            c_in = min(nf * (i + 1), max_nf)
            c_out = min(nf * (i + 2), max_nf)
            x = ResidualBlock(c_in, name=f"pre_res{i}")(x, train=train)
            x = nn.Conv(c_out, (3, 3), strides=2, padding=1, use_bias=False,
                        name=f"pre_down{i}")(nn.relu(x))
            x = _BN(name=f"pre_down{i}_bn")(x, train)

        chans = [min(nf * (start_level + l + 1), max_nf)
                 for l in range(self.num_scales + 1)]
        hiddens = []
        for l in range(self.num_scales):
            for i in range(self.n_residual_blocks):
                x = ResidualBlock(chans[l], name=f"enc_{l}_res_{i}")(
                    x, train=train)
                hiddens.append(x)
            x = _Downsample(chans[l + 1], name=f"enc_{l}_down")(x, train)

        flow_pyr = []
        for l in range(self.num_scales - 1, -1, -1):
            x = _Upsample(chans[l], name=f"dec_{l}_up")(x, train)
            for i in range(self.n_residual_blocks - 1, -1, -1):
                h = hiddens.pop()
                x = ResidualBlock(chans[l], dim_a=chans[l],
                                  name=f"dec_{l}_res_{i}")(x, h, train=train)
            flow_pyr.insert(0, _PredHead(2, name=f"flow_{l}")(x))

        feat = x
        vis = _PredHead(3, name="vis")(feat)
        s = self.start_scale
        h, w = feat.shape[1] * s, feat.shape[2] * s
        flow_out = jax.image.resize(flow_pyr[0], (x.shape[0], h, w, 2),
                                    "bilinear")
        vis_out = jax.image.resize(vis, (x.shape[0], h, w, 3), "bilinear")
        return flow_out, vis_out, flow_pyr, feat


class DualUnetGenerator(nn.Module):
    """DualUnetGenerator (networks.py:233-431).

    __call__(x_p, x_a, flow=None, vis=None) -> out (or (out, aux_outs) when
    aux_output_nc is set). flow is pixel-space (N,H,W,2); vis is (N,H,W,1)
    with classes 0-visible / 1-invisible / 2-background.
    """

    pose_nc: int = 68
    appearance_nc: int = 3
    output_nc: int = 3
    aux_output_nc: tuple = ()
    nf: int = 32
    max_nf: int = 128
    num_scales: int = 7
    num_warp_scales: int = 5
    n_residual_blocks: int = 2
    vis_mode: str = "none"
    no_end_norm: bool = False
    vis_expand_mult: int = 2

    def _vis_expand(self, feat, vis):
        return jnp.concatenate(
            [feat * (vis == i).astype(feat.dtype)
             for i in range(self.vis_expand_mult)], axis=-1)

    @nn.compact
    def __call__(self, x_p, x_a, flow=None, vis=None, train: bool = False):
        nf, max_nf = self.nf, self.max_nf
        use_fw = flow is not None
        if use_fw:
            vis = jnp.round(vis)
        chans = [min(nf * (l + 1), max_nf)
                 for l in range(self.num_scales + 1)]

        x_p = _ConvNorm(nf, kernel=1, end_norm=not self.no_end_norm,
                        name="encp_pre")(x_p, train)
        x_a = _ConvNorm(nf, kernel=1, end_norm=not self.no_end_norm,
                        name="enca_pre")(x_a, train)

        hidden_p, hidden_a = [], []
        for l in range(self.num_scales):
            # reference quirk: one downsample module serves both encoders
            down = _Downsample(chans[l + 1], name=f"enc_{l}_down")
            for i in range(self.n_residual_blocks):
                x_p = ResidualBlock(chans[l], name=f"encp_{l}_res_{i}")(
                    x_p, train=train)
                hidden_p.append(x_p)
            x_p = down(x_p, train)
            for i in range(self.n_residual_blocks):
                x_a = ResidualBlock(chans[l], name=f"enca_{l}_res_{i}")(
                    x_a, train=train)
                if use_fw and l < self.num_warp_scales:
                    k = 2 ** l
                    flow_l = flow if l == 0 else nn.avg_pool(
                        flow, (k, k), strides=(k, k)) / k
                    # priority visible > invisible > background == min-pool
                    vis_l = vis if l == 0 else -nn.max_pool(
                        -vis, (k, k), strides=(k, k))
                    x_w = warp_acc_flow(x_a, flow_l)
                    if self.vis_mode == "hard_gate":
                        x_w = x_w * (vis_l < 2).astype(x_w.dtype)
                    elif self.vis_mode == "soft_gate":
                        x_w = GateBlock(chans[l],
                                        name=f"enca_{l}_vis_{i}")(
                            x_w, self._vis_expand(x_w, vis_l))
                    elif self.vis_mode == "residual":
                        x_w = ResidualBlock(
                            chans[l], dim_a=chans[l] * self.vis_expand_mult,
                            name=f"enca_{l}_vis_{i}")(
                            x_w, self._vis_expand(x_w, vis_l), train=train)
                    elif self.vis_mode == "res_no_vis":
                        x_w = ResidualBlock(chans[l],
                                            name=f"enca_{l}_vis_{i}")(
                            x_w, train=train)
                    hidden_a.append(x_w)
                else:
                    hidden_a.append(x_a)
            x_a = down(x_a, train)

        x = _ConvNorm(chans[-1], kernel=1, name="dec_fuse")(
            jnp.concatenate([x_p, x_a], axis=-1), train)
        for l in range(self.num_scales - 1, -1, -1):
            x = _Upsample(chans[l], name=f"dec_{l}_up")(x, train)
            for i in range(self.n_residual_blocks - 1, -1, -1):
                h_p, h_a = hidden_p.pop(), hidden_a.pop()
                last = l == self.num_scales - 1 and \
                    i == self.n_residual_blocks - 1
                x = ResidualBlock(
                    chans[l], dim_a=chans[l] * 2,
                    no_end_norm=self.no_end_norm and last,
                    name=f"dec_{l}_res_{i}")(
                    x, jnp.concatenate([h_p, h_a], axis=-1), train=train)

        pad = [(0, 0), (3, 3), (3, 3), (0, 0)]
        xp = jnp.pad(x, pad, mode="reflect")
        out = nn.Conv(self.output_nc, (7, 7), padding=0,
                      name="dec_output")(xp)
        if self.aux_output_nc:
            aux = [nn.Conv(a_nc, (7, 7), padding=0,
                           name=f"dec_aux_{i}")(xp)
                   for i, a_nc in enumerate(self.aux_output_nc)]
            return out, aux
        return out


class IFUnetGenerator(nn.Module):
    """The intrinsic-flow UnetGenerator (networks.py:76-150): a Unet with
    ``n_residual_blocks`` residual blocks per scale instead of plain convs,
    strided-conv downsampling, pixel-shuffle upsampling, and skip
    connections feeding the decoder residual blocks through their 1x1
    ``dim_a`` side input. Used by PoseTransferModel with
    ``which_model_G == 'unet'`` (pose_transfer_model.py:26-38).

    __call__(x (N,H,W,input_nc)) -> (N,H,W,output_nc), pre-tanh.
    ``slope`` > 0 selects the leaky_relu G_activation variant.
    """

    output_nc: int = 3
    nf: int = 64
    max_nf: int = 256
    num_scales: int = 7
    n_residual_blocks: int = 2
    slope: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf, max_nf, slope = self.nf, self.max_nf, self.slope
        chans = [min(nf * (l + 1), max_nf)
                 for l in range(self.num_scales + 1)]
        x = _ConvNorm(nf, kernel=1, name="pre_conv")(x, train)
        hiddens = []
        for l in range(self.num_scales):
            for i in range(self.n_residual_blocks):
                x = ResidualBlock(chans[l], slope=slope,
                                  name=f"enc_{l}_res_{i}")(x, train=train)
                hiddens.append(x)
            x = _Downsample(chans[l + 1], slope=slope,
                            name=f"enc_{l}_down")(x, train)
        for l in range(self.num_scales - 1, -1, -1):
            x = _Upsample(chans[l], slope=slope,
                          name=f"dec_{l}_up")(x, train)
            for i in range(self.n_residual_blocks - 1, -1, -1):
                h = hiddens.pop()
                x = ResidualBlock(chans[l], dim_a=chans[l], slope=slope,
                                  name=f"dec_{l}_res_{i}")(x, h, train=train)
        xp = jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)], mode="reflect")
        return nn.Conv(self.output_nc, (7, 7), padding=0,
                       name="dec_output")(xp)


class IFUnetGeneratorMultiOutput(nn.Module):
    """UnetGenerator_MultiOutput (networks.py:151-231): the IFUnetGenerator
    trunk with one [1x1 conv-norm, act, reflect-pad, 7x7 conv] head per
    entry of ``output_nc``. PoseTransferModel's external pixel warper netPW
    uses it with output_nc=[1] (pose_transfer_model.py:62-79).

    __call__(x) -> list of (N,H,W,c) heads (pre-sigmoid).
    """

    output_nc: tuple = (1,)
    nf: int = 32
    max_nf: int = 128
    num_scales: int = 7
    n_residual_blocks: int = 2
    slope: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf, max_nf, slope = self.nf, self.max_nf, self.slope
        chans = [min(nf * (l + 1), max_nf)
                 for l in range(self.num_scales + 1)]
        x = _ConvNorm(nf, kernel=1, name="pre_conv")(x, train)
        hiddens = []
        for l in range(self.num_scales):
            for i in range(self.n_residual_blocks):
                x = ResidualBlock(chans[l], slope=slope,
                                  name=f"enc_{l}_res_{i}")(x, train=train)
                hiddens.append(x)
            x = _Downsample(chans[l + 1], slope=slope,
                            name=f"enc_{l}_down")(x, train)
        for l in range(self.num_scales - 1, -1, -1):
            x = _Upsample(chans[l], slope=slope,
                          name=f"dec_{l}_up")(x, train)
            for i in range(self.n_residual_blocks - 1, -1, -1):
                h = hiddens.pop()
                x = ResidualBlock(chans[l], dim_a=chans[l], slope=slope,
                                  name=f"dec_{l}_res_{i}")(x, h, train=train)
        outs = []
        for i, c in enumerate(self.output_nc):
            y = _ConvNorm(nf, kernel=1, name=f"out_{i}_map")(x, train)
            y = _act(y, slope)
            yp = jnp.pad(y, [(0, 0), (3, 3), (3, 3), (0, 0)],
                         mode="reflect")
            outs.append(nn.Conv(c, (7, 7), padding=0,
                                name=f"out_{i}_conv")(yp))
        return outs


# ---------------------------------------------------------------------------
# torch checkpoint converters
# ---------------------------------------------------------------------------

def _convnorm(sd, torch_prefix, end_norm=True):
    from animateportrait_tpu.io import torch_convert as tc
    p = {"conv": tc.conv2d(sd, f"{torch_prefix}.0", bias=not end_norm)}
    s = {}
    if end_norm:
        bn_p, bn_s = tc.batchnorm(sd, f"{torch_prefix}.1")
        p["norm"] = {"bn": bn_p}
        s["norm"] = {"bn": bn_s}
    return p, s


def _resblock(sd, torch_prefix, dim_a=0, no_end_norm=False):
    p, s = {}, {}
    cp, cs = _convnorm(sd, f"{torch_prefix}.conv", end_norm=not no_end_norm)
    p["conv"], s["conv"] = cp, cs
    if dim_a > 0:
        ap, as_ = _convnorm(sd, f"{torch_prefix}.conv_a")
        p["conv_a"], s["conv_a"] = ap, as_
    return p, s


def _seq_down(sd, torch_prefix):
    """[act, Conv2d(1), norm(2)] Sequential."""
    from animateportrait_tpu.io import torch_convert as tc
    bn_p, bn_s = tc.batchnorm(sd, f"{torch_prefix}.2")
    return ({"conv": tc.conv2d(sd, f"{torch_prefix}.1", bias=False),
             "norm": {"bn": bn_p}}, {"norm": {"bn": bn_s}})


def _seq_up(sd, torch_prefix):
    """[act, Conv2d(1), PixelShuffle(2), norm(3)] Sequential."""
    from animateportrait_tpu.io import torch_convert as tc
    bn_p, bn_s = tc.batchnorm(sd, f"{torch_prefix}.3")
    return ({"conv": tc.conv2d(sd, f"{torch_prefix}.1", bias=False),
             "norm": {"bn": bn_p}}, {"norm": {"bn": bn_s}})


def load_flowunet_v2_params(sd, nf=64, max_nf=256, start_scale=2,
                            num_scales=7, n_residual_blocks=2) -> dict:
    """torch FlowUnet_v2 state dict -> FlowUnetV2 variables."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params, stats = {}, {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    put("pre_map", _convnorm(sd, "pre_conv.0"))
    start_level = int(np.log2(start_scale))
    for i in range(start_level):
        base = 1 + i * 4  # [map][res, act, conv, norm]*
        put(f"pre_res{i}", _resblock(sd, f"pre_conv.{base}"))
        params[f"pre_down{i}"] = tc.conv2d(sd, f"pre_conv.{base + 2}",
                                           bias=False)
        bn_p, bn_s = tc.batchnorm(sd, f"pre_conv.{base + 3}")
        params[f"pre_down{i}_bn"] = {"bn": bn_p}
        stats[f"pre_down{i}_bn"] = {"bn": bn_s}

    for l in range(num_scales):
        for i in range(n_residual_blocks):
            put(f"enc_{l}_res_{i}", _resblock(sd, f"enc_{l}_res_{i}"))
            put(f"dec_{l}_res_{i}", _resblock(sd, f"dec_{l}_res_{i}",
                                              dim_a=1))
        put(f"enc_{l}_down", _seq_down(sd, f"enc_{l}_downsample"))
        put(f"dec_{l}_up", _seq_up(sd, f"dec_{l}_upsample"))
        params[f"flow_{l}"] = {"conv": tc.conv2d(sd, f"pred_flow_{l}.1")}
    params["vis"] = {"conv": tc.conv2d(sd, "pred_vis.1")}
    return {"params": params, "batch_stats": stats}


def load_if_unet_params(sd, num_scales=7, n_residual_blocks=2,
                        multi_output_nc=()) -> dict:
    """torch UnetGenerator / UnetGenerator_MultiOutput state dict ->
    IFUnetGenerator(MultiOutput) variables. Pass ``multi_output_nc``
    (e.g. (1,)) for the multi-output variant's per-head weights."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params, stats = {}, {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    put("pre_conv", _convnorm(sd, "pre_conv"))
    for l in range(num_scales):
        put(f"enc_{l}_down", _seq_down(sd, f"enc_{l}_downsample"))
        put(f"dec_{l}_up", _seq_up(sd, f"dec_{l}_upsample"))
        for i in range(n_residual_blocks):
            put(f"enc_{l}_res_{i}", _resblock(sd, f"enc_{l}_res_{i}"))
            put(f"dec_{l}_res_{i}", _resblock(sd, f"dec_{l}_res_{i}",
                                              dim_a=1))
    if multi_output_nc:
        # dec_output_%d = Sequential(channel_mapping, act, pad, conv)
        for i in range(len(multi_output_nc)):
            put(f"out_{i}_map", _convnorm(sd, f"dec_output_{i}.0"))
            params[f"out_{i}_conv"] = tc.conv2d(sd, f"dec_output_{i}.3")
    else:
        # dec_output = Sequential(ReflectionPad2d, Conv2d)
        params["dec_output"] = tc.conv2d(sd, "dec_output.1")
    return {"params": params, "batch_stats": stats}


def load_dual_unet_params(sd, num_scales=7, num_warp_scales=5,
                          n_residual_blocks=2, vis_mode="none",
                          no_end_norm=False, aux_output_nc=()) -> dict:
    """torch DualUnetGenerator state dict -> DualUnetGenerator variables."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    params, stats = {}, {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    put("encp_pre", _convnorm(sd, "encp_pre_conv",
                              end_norm=not no_end_norm))
    put("enca_pre", _convnorm(sd, "enca_pre_conv",
                              end_norm=not no_end_norm))
    put("dec_fuse", _convnorm(sd, "dec_fuse"))
    for l in range(num_scales):
        # shared downsample: stored under the pose name
        put(f"enc_{l}_down", _seq_down(sd, f"encp_{l}_downsample"))
        put(f"dec_{l}_up", _seq_up(sd, f"dec_{l}_upsample"))
        for i in range(n_residual_blocks):
            put(f"encp_{l}_res_{i}", _resblock(sd, f"encp_{l}_res_{i}"))
            put(f"enca_{l}_res_{i}", _resblock(sd, f"enca_{l}_res_{i}"))
            last = l == num_scales - 1 and i == n_residual_blocks - 1
            put(f"dec_{l}_res_{i}", _resblock(
                sd, f"dec_{l}_res_{i}", dim_a=1,
                no_end_norm=no_end_norm and last))
            if l < num_warp_scales and vis_mode in (
                    "soft_gate", "residual", "res_no_vis"):
                if vis_mode == "soft_gate":
                    params[f"enca_{l}_vis_{i}"] = {
                        "conv": tc.conv2d(sd, f"enca_{l}_vis_{i}.conv")}
                else:
                    put(f"enca_{l}_vis_{i}", _resblock(
                        sd, f"enca_{l}_vis_{i}",
                        dim_a=1 if vis_mode == "residual" else 0))
    params["dec_output"] = tc.conv2d(sd, "dec_output.1")
    for i in range(len(aux_output_nc)):
        params[f"dec_aux_{i}"] = tc.conv2d(sd, f"dec_aux_output_{i}.1")
    return {"params": params, "batch_stats": stats}
