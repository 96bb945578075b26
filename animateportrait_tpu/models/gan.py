"""Module2 GAN network zoo, TPU-native (NHWC flax).

Behavioral reimplementation of the reference generators/discriminators in
`Module2/models/networks.py`:

- ``ResnetGenerator``            (resnet_9blocks, :509-571)
- ``ResnetStyle2Generator``      (static photo->drawing net, :573-637)
- ``TridentGeneratorFullIFW``    (resnet_9blocks_rcatland32_full_ifw,
                                  :1190-1340) — the shipped main generator
- ``NLayerDiscriminator``        (70x70 PatchGAN, :2602-2647)
- ``PixelDiscriminator``         (:2720-2749)
- ``gan_loss``                   (GANLoss lsgan/vanilla/wgangp, :407-473)

All norm layers are torch InstanceNorm2d(affine=False) per the options
default (`base_options.py:37`), so they carry no parameters and checkpoint
conversion touches convs only. The trident generator's double feature
warping preserves the reference's mixed align_corners conventions
(grid_sample align_corners=False at :1311; bilinear motion/flow resizes
align_corners=True at :1297-1306).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu import nn as nn_mod
from animateportrait_tpu.nn import (
    Conv2dReflect, ConvTranspose2dTorch, InstanceNorm,
    add_reflect_border_corrections, interpolate_bilinear,
    reflect_conv_mode, reflect_pad_2d, replicate_pad_2d)
from animateportrait_tpu.ops.warp import grid_sample, warp_acc_flow  # noqa: F401 (re-exported for callers)


def _pad(x, pad, padding_type):
    if padding_type == "reflect":
        return reflect_pad_2d(x, pad)
    if padding_type == "replicate":
        return replicate_pad_2d(x, pad)
    raise ValueError(padding_type)


class _S2DConv(nn.Module):
    """Drop-in for nn.Conv(k odd, stride 2, padding k//2) computed as a
    space-to-depth packed conv (ops/pack.py): same param names/shapes
    (kernel HWIO + bias), exact same math (verified <=1.3e-6), 4x the
    MXU lane utilization for the C<128 stems.

    MEASURED AND LOST on v5e (2026-08-20): generator forward 232.0 f/s
    with AP_S2D_STEM=1 vs 273.0/271.3 same-session controls (-15%). At
    C=64 (half lanes) XLA's internal conv layouts already cost less
    than the explicit blocked reshape/transpose this adds; pack.py's
    win was at C=16 (1/8 lanes, FlowUnet stem). Kept opt-in for
    narrower-stem variants."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        from animateportrait_tpu.ops.pack import s2d_conv_stride2
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=None)
        return s2d_conv_stride2(x, w) + b


class ConvINReLU(nn.Module):
    """Conv -> InstanceNorm -> (optional ReLU), 'zero' torch padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        if (self.stride == 2 and self.kernel % 2 == 1
                and self.padding == self.kernel // 2
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and nn_mod.env_choice("AP_S2D_STEM", "0",
                                      ("0", "1")) == "1"):
            x = _S2DConv(self.features, self.kernel, name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=self.padding,
                        name="conv")(x)
        return InstanceNorm(relu=self.relu)(x)


class StemConv7(nn.Module):
    """ReflectionPad(3) + Conv7x7 + IN + ReLU stem (via Conv2dReflect,
    whose lowering is selected by AP_REFLECT_CONV — see nn.py)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = Conv2dReflect(self.features, 7, name="conv")(x)
        return InstanceNorm(relu=True)(x)


class ResnetBlock(nn.Module):
    """Reference ResnetBlock (networks.py:2303-2361)."""

    dim: int
    padding_type: str = "reflect"
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2

        def conv(name):
            if self.padding_type == "reflect":
                return Conv2dReflect(self.dim, self.kernel, name=name)
            return lambda v: nn.Conv(
                self.dim, (self.kernel, self.kernel), padding=0,
                name=name)(_pad(v, pad, self.padding_type))

        y = conv("conv0")(x)
        y = InstanceNorm(relu=True)(y)
        y = conv("conv1")(y)
        y = InstanceNorm()(y)
        return x + y


class ResnetBlock2(nn.Module):
    """Reference ResnetBlock2 with conv shortcut (networks.py:2363-2421)."""

    dim_out: int
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        def conv(name):
            if self.padding_type == "reflect":
                return Conv2dReflect(self.dim_out, 3, name=name)
            return lambda v: nn.Conv(
                self.dim_out, (3, 3), padding=0,
                name=name)(_pad(v, 1, self.padding_type))

        y = conv("conv0")(x)
        y = InstanceNorm(relu=True)(y)
        y = conv("conv1")(y)
        y = InstanceNorm()(y)
        s = nn.Conv(self.dim_out, (3, 3), padding=1, name="shortcut")(x)
        s = InstanceNorm()(s)
        return s + y


class Upsample2x(nn.Module):
    """ConvTranspose(k3, s2, p1, op1) + IN + ReLU."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose2dTorch(self.features, name="deconv")(x)
        return InstanceNorm(relu=True)(x)


class OutConv7(nn.Module):
    """ReflectionPad2d(3) + final 7x7 conv to few output channels.

    Parameter-identical to ``nn.Conv(features, (7,7), padding=0,
    name=...)`` applied to a reflect-padded input. XLA's direct conv
    emitter runs a (7,7,64,1) conv at 256^2 at ~14 GB/s on v5e because
    the single output lane wastes 127/128 of every MXU pass; this module
    instead runs a space-to-depth packed conv (~6x faster, identical
    parameters). The reflect pad is materialized by default
    (``AP_REFLECT_CONV=pad``); ``=fix`` folds it into the blocking pad
    and repairs the 3-pixel borders with thin convs
    (``nn.add_reflect_border_corrections``) — exact, but measured
    in-graph on v5e (2026-08-20) the fold LOSES (147 vs 257 f/s
    generator forward with every reflect conv folded; see PERF.md), so
    it stays opt-in.
    """

    features: int
    block: int = 8

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        f = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, C, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        blk = self.block
        reflect_fix = reflect_conv_mode() == "fix"
        if H % blk or W % blk or not reflect_fix:
            xp = reflect_pad_2d(x, 3)
            if H % blk or W % blk:
                return self._fallback(xp, kernel, bias, H, W)

        # Space-to-depth packed conv: the (7,7,C,f) conv becomes a
        # (2,2, blk*blk*C, blk*blk*f) conv on the blk-blocked image —
        # every output lane is a real output pixel phase, so the MXU runs
        # full-width instead of wasting 127/128 lanes on a 1-channel
        # output. The earlier 1x1-contraction + 49-shifted-slice-sum
        # decomposition collapses to ~50 GB/s inside the full model
        # (XLA materializes the lane-strided slices); this form measures
        # as an ordinary compute-bound conv.
        #   out[8Y+py, 8X+px] = sum_{ky,kx,by,bx,c}
        #       xblk[Y+ky, X+kx, (by,bx,c)] * w[blk*ky+by-py,
        #                                       blk*kx+bx-px, c]
        hb = H // blk + 1
        wb = W // blk + 1
        if reflect_fix:
            xp = jnp.pad(x, ((0, 0), (3, hb * blk - H - 3),
                             (3, wb * blk - W - 3), (0, 0)))
        else:
            xp = jnp.pad(xp, ((0, 0), (0, hb * blk - H - 6),
                              (0, wb * blk - W - 6), (0, 0)))
        xb = xp.reshape(N, hb, blk, wb, blk, C).transpose(
            0, 1, 3, 2, 4, 5).reshape(N, hb, wb, blk * blk * C)

        # packed kernel built from the 7x7 param with static index maps
        ky, by, py = np.meshgrid(np.arange(2), np.arange(blk),
                                 np.arange(blk), indexing="ij")
        d = blk * ky + by - py  # (2, blk, blk)
        valid = ((d >= 0) & (d <= 6))
        dc = np.clip(d, 0, 6)
        # k[dy, dx, c, f] -> pk[(ky,kx), (by,bx,c), (py,px,f)] via two
        # static gathers along the tap axes + validity masks
        kd = kernel.astype(x.dtype)
        vj = jnp.asarray(valid, x.dtype)
        kd1 = jnp.take(kd, jnp.asarray(dc.reshape(-1)), axis=0)
        kd1 = kd1.reshape(2, blk, blk, 7, C, f)  # [ky,by,py, dx, c, f]
        kd1 = kd1 * vj[..., None, None, None]
        kd2 = jnp.take(kd1, jnp.asarray(dc.reshape(-1)), axis=3)
        kd2 = kd2.reshape(2, blk, blk, 2, blk, blk, C, f)
        kd2 = kd2 * vj[:, :, :, None, None]  # mask over (kx, bx, px)
        # [ky,by,py, kx,bx,px, c, f] -> (ky,kx, by,bx,c, py,px,f)
        pk = kd2.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
            2, 2, blk * blk * C, blk * blk * f)
        # No preferred_element_type: its conv transpose rule rejects
        # mixed (bf16 input, f32 cotangent) under grad, and on TPU the
        # MXU accumulates in f32 internally either way (one rounding at
        # the output).
        out = jax.lax.conv_general_dilated(
            xb, pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out.reshape(N, H // blk, W // blk, blk, blk, f).transpose(
            0, 1, 3, 2, 4, 5).reshape(N, H, W, f)
        if reflect_fix:
            out = add_reflect_border_corrections(out, x, kd)
        return (out.astype(jnp.float32) + bias).astype(x.dtype)

    def _fallback(self, x, kernel, bias, H, W):
        """1x1 contraction + 49-tap shifted-slice sum (used when the
        output size is not a multiple of the pack block)."""
        N, Hp, Wp, C = x.shape
        kmat = kernel.astype(x.dtype).transpose(2, 0, 1, 3).reshape(
            C, 49 * self.features)
        z = jax.lax.dot_general(
            x, kmat, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        acc = jnp.zeros((N, H, W, self.features), jnp.float32)
        for dy in range(7):
            for dx in range(7):
                tap = dy * 7 + dx
                acc = acc + z[:, dy:dy + H, dx:dx + W,
                              tap * self.features:(tap + 1) * self.features
                              ].astype(jnp.float32)
        return (acc + bias).astype(x.dtype)


class ResnetGenerator(nn.Module):
    """Plain resnet_9blocks generator (networks.py:509-571)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        x = StemConv7(self.ngf, name="stem")(x)
        for i in range(2):
            mult = 2 ** i
            x = ConvINReLU(self.ngf * mult * 2, stride=2,
                           name=f"down{i}")(x)
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 4, self.padding_type,
                            name=f"block{i}")(x)
        for i in range(2):
            mult = 2 ** (2 - i)
            x = Upsample2x(self.ngf * mult // 2, name=f"up{i}")(x)
        x = OutConv7(self.output_nc, name="out")(x)
        return jnp.tanh(x)


class ResnetStyle2Generator(nn.Module):
    """Static stylization net with style injected at the bottleneck
    (networks.py:573-637). __call__(photo, style_map)."""

    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    extra_channel: int = 3
    model0_res: int = 0
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x, style):
        x = StemConv7(self.ngf, name="stem")(x)
        for i in range(2):
            mult = 2 ** i
            x = ConvINReLU(self.ngf * mult * 2, stride=2,
                           name=f"down{i}")(x)
        for i in range(self.model0_res):
            x = ResnetBlock(self.ngf * 4, self.padding_type,
                            name=f"block0_{i}")(x)
        x = jnp.concatenate([x, style], axis=-1)
        x = ConvINReLU(self.ngf * 4, name="merge")(x)
        for i in range(self.n_blocks - self.model0_res):
            x = ResnetBlock(self.ngf * 4, self.padding_type,
                            name=f"block{i}")(x)
        for i in range(2):
            mult = 2 ** (2 - i)
            x = Upsample2x(self.ngf * mult // 2, name=f"up{i}")(x)
        x = OutConv7(self.output_nc, name="out")(x)
        return jnp.tanh(x)


class LandmarkEncoder(nn.Module):
    """model_landmark_trans: 1ch landmark image -> 16ch at 1/4 res
    (networks.py:1284-1286)."""

    con_dim: int = 16

    @nn.compact
    def __call__(self, x):
        x = ConvINReLU(8, name="conv0")(x)
        x = ConvINReLU(self.con_dim, stride=2, name="conv1")(x)
        return ConvINReLU(self.con_dim, stride=2, relu=False,
                          name="conv2")(x)


def double_feature_warping(x, motion, flow, ifmask, level):
    """Warp features by BOTH the TPS motion grid and the intrinsic flow,
    concatenating the two warped copies (networks.py:1296-1313). NHWC.

    motion: (N, Hm, Wm, 2) normalized grid; flow: (N, Hf, Wf, 2) pixel flow
    at full res; ifmask: (N, Hf, Wf, 1).
    """
    # index math ALWAYS in f32: a bf16 normalized grid quantizes to
    # ~0.008 (half a pixel at 256) and gx+flow at values ~200 loses
    # ~0.5 px — only the gathered FEATURES should carry the compute
    # dtype (fractional lerp weights are cast back inside the sampler)
    motion = motion.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    if level > 0:
        size = x.shape[1:3]
        scale = 2 ** level
        motion = interpolate_bilinear(motion, size, align_corners=True)
        flow = interpolate_bilinear(flow / scale, size, align_corners=True)
        ifmask = interpolate_bilinear(ifmask, size, align_corners=True)
    # one shared-aug double sample: both warps gather from the same
    # padded/augmented feature map (see ops.warp.sample_bilinear_multi)
    N, H, W, _ = x.shape
    from animateportrait_tpu.ops.warp import (_unnormalize,
                                              sample_bilinear_multi)
    m_ix = _unnormalize(motion[..., 0], W, align_corners=False)
    m_iy = _unnormalize(motion[..., 1], H, align_corners=False)
    # warp_acc_flow quirk (modules.py:596-625): align_corners-True
    # normalization, align_corners-False sampling
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    nx = 2.0 * (gx + flow[..., 0]) / max(W - 1, 1) - 1.0
    ny = 2.0 * (gy + flow[..., 1]) / max(H - 1, 1) - 1.0
    f_ix = _unnormalize(nx, W, align_corners=False)
    f_iy = _unnormalize(ny, H, align_corners=False)
    x1, x2 = sample_bilinear_multi(x, [(m_iy, m_ix), (f_iy, f_ix)])
    x2 = jnp.where(ifmask > 0.5, x2, jnp.asarray(-1.0, x2.dtype))
    return jnp.concatenate([x1, x2], axis=-1)


class TridentGeneratorFullIFW(nn.Module):
    """resnet_9blocks_rcatland32_full_ifw (networks.py:1190-1340).

    Three encoder branches warp their features at depths 0/1/2 respectively
    (each warp doubles channels by concatenating TPS-warped and
    flow-warped copies), merge at 1/4 resolution into ngf*4, run n_blocks
    ResNet blocks where every (i+disp) % div == 0 block is a ResnetBlock2
    additionally conditioned on source+target landmark encodings, then
    upsample to the output.

    __call__(input, land1, land2, motion, flow, ifmask), all NHWC;
    motion is the normalized TPS grid (N,256,256,2), flow the intrinsic
    flow in pixels (N,256,256,2), ifmask its visibility mask (N,256,256,1).
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    div: int = 3
    disp: int = 1
    padding_type: str = "reflect"

    def setup(self):
        # setup-style (not nn.compact) so inference can split the forward
        # into a per-photo `encode_static` and a per-frame `decode` with
        # shared parameters; attribute names keep the checkpoint keys
        # identical to the nn.compact version (tri00.., merge,
        # landmark_trans, block0.., up0/1, out)
        ngf = self.ngf
        self.tri00 = StemConv7(ngf // 2)
        self.tri01 = ConvINReLU(ngf * 2, stride=2)
        self.tri02 = ConvINReLU(ngf * 4, stride=2)
        self.tri10 = StemConv7(ngf)
        self.tri11 = ConvINReLU(ngf, stride=2)
        self.tri12 = ConvINReLU(ngf * 4, stride=2)
        self.tri20 = StemConv7(ngf)
        self.tri21 = ConvINReLU(ngf * 2, stride=2)
        self.tri22 = ConvINReLU(ngf * 2, stride=2)
        self.merge = nn.Conv(ngf * 4, (3, 3), padding=1)
        self.landmark_trans = LandmarkEncoder()
        blocks = []
        for i in range(self.n_blocks):
            if (i + self.disp) % self.div == 0:
                blocks.append(ResnetBlock2(ngf * 4, self.padding_type,
                                           name=f"block{i}"))
            else:
                blocks.append(ResnetBlock(ngf * 4, self.padding_type,
                                          name=f"block{i}"))
        self.blocks = blocks
        self.up0 = Upsample2x(ngf * 2)
        self.up1 = Upsample2x(ngf)
        self.out = OutConv7(self.output_nc)

    def encode_static(self, x_in, land1):
        """The frame-invariant half of the forward: photo stems up to each
        branch's warp point + the source-landmark encoding. At inference
        the photo and source landmarks are constant over the whole video,
        so the renderer computes this ONCE per photo (batch 1) and reuses
        it across every frame batch — `decode` broadcasts as needed."""
        return {
            "s1": self.tri00(x_in),
            "s2": self.tri11(self.tri10(x_in)),
            "s3": self.tri22(self.tri21(self.tri20(x_in))),
            "l1": self.landmark_trans(land1),
        }

    def decode(self, cache, land2, motion, flow, ifmask):
        """Per-frame half: warps, post-warp encoder convs, bottleneck,
        decoder. `cache` entries may carry batch 1; they are broadcast to
        the frame batch."""
        B = motion.shape[0]
        bc = lambda t: jnp.broadcast_to(t, (B,) + t.shape[1:])  # noqa: E731
        # branch 1: warp at full res right after the stem
        x1 = double_feature_warping(bc(cache["s1"]), motion, flow,
                                    ifmask, 0)
        x1 = self.tri02(self.tri01(x1))
        # branch 2: warp at 1/2 res
        x2 = double_feature_warping(bc(cache["s2"]), motion, flow,
                                    ifmask, 1)
        x2 = self.tri12(x2)
        # branch 3: warp at 1/4 res
        x3 = double_feature_warping(bc(cache["s3"]), motion, flow,
                                    ifmask, 2)

        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = self.merge(x)

        l1, l2 = bc(cache["l1"]), self.landmark_trans(land2)
        for i in range(self.n_blocks):
            if (i + self.disp) % self.div == 0:
                x = self.blocks[i](jnp.concatenate([x, l1, l2], axis=-1))
            else:
                x = self.blocks[i](x)

        x = self.up0(x)
        x = self.up1(x)
        x = self.out(x)
        return jnp.tanh(x)

    def __call__(self, x_in, land1, land2, motion, flow, ifmask):
        return self.decode(self.encode_static(x_in, land1), land2,
                           motion, flow, ifmask)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (networks.py:2602-2647): C64(no norm) - C128 - C256 -
    C512(stride 1) - 1ch, LeakyReLU 0.2, InstanceNorm."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 1
        x = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw,
                    name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=2,
                        padding=padw, name=f"conv{n}")(x)
            x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=1, padding=padw,
                    name=f"conv{self.n_layers}")(x)
        x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        return nn.Conv(1, (kw, kw), strides=1, padding=padw, name="out")(x)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (networks.py:2720-2749)."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(
            nn.Conv(self.ndf, (1, 1), name="conv0")(x), 0.2)
        x = nn.Conv(self.ndf * 2, (1, 1), use_bias=True, name="conv1")(x)
        x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        return nn.Conv(1, (1, 1), name="out")(x)


def gan_loss(prediction: jax.Array, target_is_real: bool,
             mode: str = "lsgan") -> jax.Array:
    """GANLoss (networks.py:407-473): lsgan=MSE vs 1/0, vanilla=BCE-with-
    logits, wgangp=signed mean."""
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(prediction - target))
    if mode == "vanilla":
        target = jnp.ones_like(prediction) if target_is_real else (
            jnp.zeros_like(prediction))
        return jnp.mean(
            jnp.maximum(prediction, 0) - prediction * target
            + jnp.log1p(jnp.exp(-jnp.abs(prediction))))
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else (
            jnp.mean(prediction))
    raise ValueError(mode)


# --- torch checkpoint converters --------------------------------------------


def _cinr(sd, tc, name):
    return {"conv": tc.conv2d(sd, name)}


def _stem(sd, tc, name):
    return {"conv": tc.conv2d(sd, name)}


def _block(sd, tc, prefix):
    return {"conv0": tc.conv2d(sd, f"{prefix}.conv_block.1"),
            "conv1": tc.conv2d(sd, f"{prefix}.conv_block.5")}


def _block2(sd, tc, prefix):
    return {"conv0": tc.conv2d(sd, f"{prefix}.conv_block.1"),
            "conv1": tc.conv2d(sd, f"{prefix}.conv_block.5"),
            "shortcut": tc.conv2d(sd, f"{prefix}.shortcut.0")}


def load_trident_full_ifw_params(sd, n_blocks: int = 9, div: int = 3,
                                 disp: int = 1) -> dict:
    """Reference `<epoch>_net_G_A.pth` -> TridentGeneratorFullIFW params."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    p: dict = {}
    p["tri00"] = _stem(sd, tc, "model_tri00.1")
    p["tri01"] = _cinr(sd, tc, "model_tri01.0")
    p["tri02"] = _cinr(sd, tc, "model_tri02.0")
    p["tri10"] = _stem(sd, tc, "model_tri10.1")
    p["tri11"] = _cinr(sd, tc, "model_tri11.0")
    p["tri12"] = _cinr(sd, tc, "model_tri12.0")
    p["tri20"] = _stem(sd, tc, "model_tri20.1")
    p["tri21"] = _cinr(sd, tc, "model_tri21.0")
    p["tri22"] = _cinr(sd, tc, "model_tri22.0")
    p["merge"] = tc.conv2d(sd, "model_tri_merge")
    p["landmark_trans"] = {
        "conv0": _cinr(sd, tc, "model_landmark_trans.0"),
        "conv1": _cinr(sd, tc, "model_landmark_trans.3"),
        "conv2": _cinr(sd, tc, "model_landmark_trans.6"),
    }
    for i in range(n_blocks):
        if (i + disp) % div == 0:
            p[f"block{i}"] = _block2(sd, tc, f"model2.{i}")
        else:
            p[f"block{i}"] = _block(sd, tc, f"model2.{i}")
    p["up0"] = {"deconv": tc.conv_transpose2d(sd, "model3.0")}
    p["up1"] = {"deconv": tc.conv_transpose2d(sd, "model3.3")}
    p["out"] = tc.conv2d(sd, "model3.7")
    return {"params": p}


def load_style2_params(sd, n_blocks: int = 9, model0_res: int = 0) -> dict:
    """Reference `checkpoints/static/drawing.pth` -> ResnetStyle2Generator."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    p: dict = {
        "stem": _stem(sd, tc, "model0.1"),
        "down0": _cinr(sd, tc, "model0.4"),
        "down1": _cinr(sd, tc, "model0.7"),
        "merge": _cinr(sd, tc, "model.0"),
    }
    for i in range(model0_res):
        p[f"block0_{i}"] = _block(sd, tc, f"model0.{10 + i}")
    nb = n_blocks - model0_res
    for i in range(nb):
        p[f"block{i}"] = _block(sd, tc, f"model.{3 + i}")
    p["up0"] = {"deconv": tc.conv_transpose2d(sd, f"model.{3 + nb}")}
    p["up1"] = {"deconv": tc.conv_transpose2d(sd, f"model.{6 + nb}")}
    p["out"] = tc.conv2d(sd, f"model.{10 + nb}")
    return {"params": p}


def load_nlayer_d_params(sd, n_layers: int = 3) -> dict:
    """Reference `<epoch>_net_D_*.pth` -> NLayerDiscriminator params.

    torch Sequential indices: conv0 at 0, then convs at 2, 5, ... (conv,
    norm, leaky triplets), final at the end.
    """
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    p = {"conv0": tc.conv2d(sd, "model.0")}
    idx = 2
    for n in range(1, n_layers + 1):
        p[f"conv{n}"] = tc.conv2d(sd, f"model.{idx}")
        idx += 3
    p["out"] = tc.conv2d(sd, f"model.{idx}")
    return {"params": p}


def load_resnet_g_params(sd, n_blocks: int = 9) -> dict:
    """Reference plain ResnetGenerator state dict -> params."""
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    p: dict = {"stem": _stem(sd, tc, "model.1"),
               "down0": _cinr(sd, tc, "model.4"),
               "down1": _cinr(sd, tc, "model.7")}
    for i in range(n_blocks):
        p[f"block{i}"] = _block(sd, tc, f"model.{10 + i}")
    base = 10 + n_blocks
    p["up0"] = {"deconv": tc.conv_transpose2d(sd, f"model.{base}")}
    p["up1"] = {"deconv": tc.conv_transpose2d(sd, f"model.{base + 3}")}
    p["out"] = tc.conv2d(sd, f"model.{base + 7}")
    return {"params": p}


def _orthogonal_matrix(rng: np.random.Generator, rows: int, cols: int,
                       gain: float) -> np.ndarray:
    """torch.nn.init.orthogonal_ semantics: QR of a gaussian, sign-fixed."""
    a = rng.standard_normal((rows, cols))
    if rows < cols:
        a = a.T
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if rows < cols:
        q = q.T
    return (gain * q).astype(np.float32)


def _init_kernel(rng: np.random.Generator, shape, init_type: str,
                 gain: float) -> np.ndarray:
    """One conv/linear kernel in HWIO (or IO) layout, matching the torch
    initializers dispatched in the reference (networks.py:71-102)."""
    shape = tuple(shape)
    rf = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = int(np.prod(shape[:-1]))
    fan_out = shape[-1] * rf
    if init_type == "normal":
        return rng.normal(0.0, gain, shape).astype(np.float32)
    if init_type == "xavier":
        # init.xavier_normal_(w, gain): std = gain*sqrt(2/(fan_in+fan_out))
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return rng.normal(0.0, std, shape).astype(np.float32)
    if init_type == "kaiming":
        # init.kaiming_normal_(w, a=0, mode='fan_in'): std = sqrt(2/fan_in)
        std = np.sqrt(2.0 / fan_in)
        return rng.normal(0.0, std, shape).astype(np.float32)
    if init_type == "orthogonal":
        # torch flattens OIHW to (out, in*kh*kw); our HWIO kernels map to
        # the same matrix via a transpose.
        out_ch = shape[-1]
        rest = fan_in
        q = _orthogonal_matrix(rng, out_ch, rest, gain)  # (O, I*kh*kw)
        return np.ascontiguousarray(
            q.reshape((out_ch,) + shape[:-1]).transpose(
                tuple(range(1, len(shape))) + (0,)))
    raise ValueError(f"unknown init_type {init_type!r}")


def init_weights(params, init_type: str = "normal",
                 rng: np.random.Generator | None = None,
                 gain: float = 0.02):
    """From-scratch init matching the reference's ``init_weights``
    (networks.py:71-102): conv/linear kernels per ``init_type``
    (normal | xavier | kaiming | orthogonal), biases 0, norm scales
    ~ N(1, gain) (the BatchNorm branch; InstanceNorm here is affine-free,
    so ``scale`` leaves only appear for batch/group norms)."""
    if rng is None:
        rng = np.random.default_rng(0)

    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = visit(v)
            elif k in ("kernel",):
                out[k] = _init_kernel(rng, v.shape, init_type, gain)
            elif k in ("scale",):
                out[k] = rng.normal(1.0, gain, v.shape).astype(np.float32)
            elif k in ("bias",):
                out[k] = np.zeros(v.shape, np.float32)
            else:
                out[k] = v
        return out

    return jax.tree_util.tree_map(
        jnp.asarray, visit(jax.tree_util.tree_map(np.asarray, params)))


def init_weights_normal(params, rng: np.random.Generator | None = None,
                        gain: float = 0.02):
    """'normal' init: conv/linear weights ~ N(0, 0.02), biases 0."""
    return init_weights(params, "normal", rng, gain)
