"""Extended Module2 network zoo: remaining define_G/define_D entries.

Covers the rest of the reference's registry (`Module2/models/networks.py`
:123-247): the single-encoder conditional ResNet family (rcatland32 and its
fw/fw2/ifw warped variants, :890-1190), UnetGenerator (:2423-2521),
Regressor (:2524-2600), Combiner (:2178-2206), NLayerDiscriminatorCls
(:2650-2718), the HED edge net (:2752-2837) and the ULP upper-landmark MLP
(:2840-2859). The flagship trident generator lives in `models.gan`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.models.gan import (
    ConvINReLU, LandmarkEncoder, ResnetBlock, ResnetBlock2, StemConv7,
    Upsample2x)
from animateportrait_tpu.nn import (
    ConvTranspose2dTorch, InstanceNorm, interpolate_bilinear,
    max_pool_ceil, reflect_pad_2d)
from animateportrait_tpu.ops.warp import grid_sample, warp_acc_flow


class ConditionalResnetGenerator(nn.Module):
    """Single-encoder landmark-conditioned ResNet family.

    mode selects the reference variant:
      - 'none':  resnet_9blocks_rcatland32 (:806-978) — no warping
      - 'fw':    ..._fw (:979-1074) — grid-sample the 1/4-res bottleneck by
                 the motion grid (bilinearly resized, align_corners=True)
      - 'fw2':   ..._fw2 (:1075-1170) — grid-sample the full-res stem output
      - 'ifw':   ..._ifw (:1171-1189) — double warp (motion + intrinsic
                 flow) of the stem output, concatenated
    __call__ signature follows the variant (motion/flow/ifmask optional).
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    div: int = 3
    disp: int = 1
    mode: str = "none"
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x_in, land1, land2, motion=None, flow=None,
                 ifmask=None):
        ngf = self.ngf
        stem_ch = ngf // 2 if self.mode == "ifw" else ngf
        x = StemConv7(stem_ch, name="stem")(x_in)
        if self.mode == "fw2":
            x = grid_sample(x, motion, align_corners=False)
        elif self.mode == "ifw":
            x1 = grid_sample(x, motion, align_corners=False)
            x2 = warp_acc_flow(x, flow, mask=ifmask)
            x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvINReLU(ngf * 2, stride=2, name="down0")(x)
        x = ConvINReLU(ngf * 4, stride=2, name="down1")(x)
        if self.mode == "fw":
            size = x.shape[1:3]
            m = interpolate_bilinear(motion, size, align_corners=True)
            x = grid_sample(x, m, align_corners=False)

        lenc = LandmarkEncoder(name="landmark_trans")
        l1, l2 = lenc(land1), lenc(land2)
        for i in range(self.n_blocks):
            if (i + self.disp) % self.div == 0:
                x = ResnetBlock2(ngf * 4, self.padding_type,
                                 name=f"block{i}")(
                    jnp.concatenate([x, l1, l2], axis=-1))
            else:
                x = ResnetBlock(ngf * 4, self.padding_type,
                                name=f"block{i}")(x)
        x = Upsample2x(ngf * 2, name="up0")(x)
        x = Upsample2x(ngf, name="up1")(x)
        x = reflect_pad_2d(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding=0, name="out")(x)
        return jnp.tanh(x)


class UnetSkipBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    inner: nn.Module | None = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = x
        if not self.outermost:
            y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.inner_nc, (4, 4), strides=2, padding=1,
                    name="down")(y)
        if not (self.outermost or self.innermost):
            y = InstanceNorm()(y)
        if self.inner is not None:
            y = self.inner(y, deterministic)
        y = nn.relu(y)
        y = ConvTranspose2dTorch(self.outer_nc, kernel=4, stride=2,
                                 padding=1, output_padding=0,
                                 name="up")(y)
        if self.outermost:
            return jnp.tanh(y)
        y = InstanceNorm()(y)
        if self.use_dropout and not (self.outermost or self.innermost):
            y = nn.Dropout(0.5, deterministic=deterministic)(y)
        return jnp.concatenate([x, y], axis=-1)


class UnetGenerator(nn.Module):
    """unet_128/unet_256 (networks.py:2423-2452): num_downs=7/8."""

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        ngf = self.ngf
        block = UnetSkipBlock(ngf * 8, ngf * 8, innermost=True,
                              name="inner")
        for i in range(self.num_downs - 5):
            block = UnetSkipBlock(ngf * 8, ngf * 8, inner=block,
                                  use_dropout=self.use_dropout,
                                  name=f"mid{i}")
        block = UnetSkipBlock(ngf * 4, ngf * 8, inner=block, name="up4")
        block = UnetSkipBlock(ngf * 2, ngf * 4, inner=block, name="up2")
        block = UnetSkipBlock(ngf, ngf * 2, inner=block, name="up1")
        block = UnetSkipBlock(self.output_nc, ngf, inner=block,
                              outermost=True, name="outer")
        return block(x, deterministic)


class Regressor(nn.Module):
    """11x11-patch -> scalar regressor, archs 1-5 (networks.py:2524-2600)."""

    ngf: int = 64
    arch: int = 1

    @nn.compact
    def __call__(self, x, deterministic=True):
        ngf = self.ngf
        if self.arch == 1:
            x = nn.Conv(ngf, (3, 3), strides=2, padding=0, name="c0")(x)
            x = nn.leaky_relu(x, 0.2)
            return nn.Conv(1, (5, 5), padding=0, name="c1")(x)
        if self.arch == 2:
            x = nn.leaky_relu(nn.Conv(ngf, (3, 3), padding=0,
                                      name="c0")(x), 0.2)
            x = nn.Conv(ngf * 2, (3, 3), padding=0, name="c1")(x)
            x = nn.leaky_relu(InstanceNorm()(x), 0.2)
            x = nn.Conv(ngf * 4, (3, 3), padding=0, name="c2")(x)
            x = nn.leaky_relu(InstanceNorm()(x), 0.2)
            return nn.Conv(1, (5, 5), padding=0, name="c3")(x)
        if self.arch == 3:
            x = nn.leaky_relu(nn.Conv(ngf, (3, 3), padding=1,
                                      name="c0")(x), 0.2)
            return nn.Conv(1, (11, 11), padding=0, name="c1")(x)
        if self.arch == 4:
            for i, ch in enumerate((ngf, ngf * 2, ngf * 4)):
                x = nn.leaky_relu(nn.Conv(ch, (3, 3), padding=1,
                                          name=f"c{i}")(x), 0.2)
            return nn.Conv(1, (11, 11), padding=0, name="c3")(x)
        # arch 5: conv stack + FC-4096 head
        for i, ch in enumerate((ngf, ngf * 2, ngf * 4)):
            x = nn.leaky_relu(nn.Conv(ch, (3, 3), padding=1,
                                      name=f"c{i}")(x), 0.2)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc0")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return nn.Dense(1, name="fc1")(x)


class Combiner(nn.Module):
    """7x7 stem + n ResBlocks + 7x7 tanh head (networks.py:2178-2206)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 2

    @nn.compact
    def __call__(self, x):
        x = StemConv7(self.ngf, name="stem")(x)
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf, name=f"block{i}")(x)
        x = reflect_pad_2d(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding=0, name="out")(x)
        return jnp.tanh(x)


class NLayerDiscriminatorCls(nn.Module):
    """PatchGAN + n_class head (networks.py:2650-2718).

    Returns (patch (N,h,w,1), class logits (N,n_class))."""

    ndf: int = 64
    n_layers: int = 3
    n_class: int = 3

    @nn.compact
    def __call__(self, x):
        ndf = self.ndf
        x = nn.leaky_relu(nn.Conv(ndf, (4, 4), strides=2, padding=1,
                                  name="conv0")(x), 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(ndf * nf, (4, 4), strides=2, padding=1,
                        name=f"conv{n}")(x)
            x = nn.leaky_relu(InstanceNorm()(x), 0.2)
        feat = x
        nf2 = min(2 ** self.n_layers, 8)
        p = nn.Conv(ndf * nf2, (4, 4), strides=1, padding=1,
                    name="p_conv0")(feat)
        p = nn.leaky_relu(InstanceNorm()(p), 0.2)
        patch = nn.Conv(1, (4, 4), strides=1, padding=1, name="p_out")(p)
        c = nn.Conv(ndf * nf2, (4, 4), strides=2, padding=1,
                    name="c_conv0")(feat)
        c = nn.leaky_relu(InstanceNorm()(c), 0.2)
        c = nn.Conv(ndf * nf2, (4, 4), strides=2, padding=1,
                    name="c_conv1")(c)
        c = nn.leaky_relu(InstanceNorm()(c), 0.2)
        c = nn.Conv(self.n_class, (16, 16), padding=0, name="c_out")(c)
        return patch, c.reshape(c.shape[0], -1)


class HED(nn.Module):
    """VGG16 5-side-output edge detector with BGR mean subtraction
    (networks.py:2752-2837). Input RGB in [0,1]."""

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1:3]
        b = x[..., 2:3] * 255.0 - 104.00698793
        g = x[..., 1:2] * 255.0 - 116.66876762
        r = x[..., 0:1] * 255.0 - 122.67891434
        y = jnp.concatenate([b, g, r], axis=-1)

        def vgg_stage(y, chans, convs, name, pool):
            if pool:
                y = max_pool_ceil(y, 2, 2)
            for i in range(convs):
                y = nn.relu(nn.Conv(chans, (3, 3), padding=1,
                                    name=f"{name}_c{i}")(y))
            return y

        s1 = vgg_stage(y, 64, 2, "vgg1", False)
        s2 = vgg_stage(s1, 128, 2, "vgg2", True)
        s3 = vgg_stage(s2, 256, 3, "vgg3", True)
        s4 = vgg_stage(s3, 512, 3, "vgg4", True)
        s5 = vgg_stage(s4, 512, 3, "vgg5", True)
        scores = []
        for i, s in enumerate((s1, s2, s3, s4, s5)):
            sc = nn.Conv(1, (1, 1), padding=0, name=f"score{i}")(s)
            scores.append(interpolate_bilinear(sc, (H, W),
                                               align_corners=False))
        comb = nn.Conv(1, (1, 1), padding=0, name="combine")(
            jnp.concatenate(scores, axis=-1))
        return jax.nn.sigmoid(comb)


class ULP(nn.Module):
    """68 -> N upper-landmark MLP (networks.py:2840-2859)."""

    landmark_num: int = 17

    @nn.compact
    def __call__(self, lm68):
        x = lm68.reshape(-1, 68 * 2)
        for i in range(6):
            x = nn.leaky_relu(nn.Dense(512, name=f"l{i}")(x), 0.2)
        x = nn.Dense(self.landmark_num * 2, name="out")(x)
        return x.reshape(-1, self.landmark_num, 2)


def define_g(netg: str, output_nc: int = 3, ngf: int = 64,
             n_blocks: int | None = None, div: int = 3, disp: int = 1,
             **kw):
    """Reference define_G registry (networks.py:123-201) -> flax module.

    Serves every netG name the reference registers, including all trident
    sub-variants (full_ifw / colorcoded / ifw2 / single / single2 / single3
    / fw / fw2 / ifw / rcatland 2-4 / 32), style2, unet, regressor archs
    1-5, and combiner.
    """
    from animateportrait_tpu.models.gan import (
        ResnetGenerator, ResnetStyle2Generator, TridentGeneratorFullIFW)

    nb = n_blocks
    table = {
        "resnet_9blocks": lambda: ResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9),
        "resnet_6blocks": lambda: ResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 6),
        "resnet_style2_9blocks": lambda: ResnetStyle2Generator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, **kw),
        "resnet_9blocks_rcatland32": lambda: ConditionalResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
            disp=disp, mode="none"),
        "resnet_10blocks_rcatland32": lambda: ConditionalResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 10, div=div,
            disp=disp, mode="none"),
        "resnet_9blocks_rcatland32_fw": lambda: ConditionalResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
            disp=disp, mode="fw"),
        "resnet_9blocks_rcatland32_fw2": lambda: ConditionalResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
            disp=disp, mode="fw2"),
        "resnet_9blocks_rcatland32_ifw": lambda: ConditionalResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
            disp=disp, mode="ifw"),
        "resnet_9blocks_rcatland32_full_ifw": lambda:
            TridentGeneratorFullIFW(
                output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
                disp=disp),
        "unet_128": lambda: UnetGenerator(output_nc=output_nc,
                                          num_downs=7, ngf=ngf),
        "unet_256": lambda: UnetGenerator(output_nc=output_nc,
                                          num_downs=8, ngf=ngf),
        "regressor": lambda: Regressor(ngf=ngf, **kw),
        "combiner": lambda: Combiner(output_nc=output_nc, ngf=ngf, **kw),
    }
    variant = {
        # landmark-image channel / warp-kind ablations of the trident family
        "resnet_9blocks_rcatland32_full_ifw_colorcoded": dict(
            warp="both", land_nc=3),
        "resnet_9blocks_rcatland32_full_ifw2": dict(warp="dual_motion"),
        "resnet_9blocks_rcatland32_full_ifw_single": dict(warp="motion"),
        "resnet_9blocks_rcatland32_full_ifw_single3": dict(warp="motion"),
        "resnet_9blocks_rcatland32_full_ifw_single2": dict(warp="flow"),
        "resnet_9blocks_rcatland32_ifw_single2": dict(warp="flow"),
    }
    if netg in variant:
        return TridentGeneratorVariant(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
            disp=disp, **variant[netg])
    if netg in ("resnet_9blocks_rcatland", "resnet_9blocks_rcatland3"):
        # pre-32 revisions differing only in the landmark-encoder stride
        # arrangement; served by the 32-variant conditional resnet
        return ConditionalResnetGenerator(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div,
            disp=disp, mode="none")
    if netg == "resnet_9blocks_rcatland4":
        return ConditionalResnetDualHead(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div)
    if netg == "resnet_9blocks_rcatland2":
        return ConditionalResnetWarped(
            output_nc=output_nc, ngf=ngf, n_blocks=nb or 9, div=div)
    if netg in table:
        return table[netg]()
    raise ValueError(f"unknown netG {netg}")


def define_d(netd: str, ndf: int = 64, n_layers: int = 3, **kw):
    """Reference define_D registry (networks.py:204-247)."""
    from animateportrait_tpu.models.gan import (
        NLayerDiscriminator, PixelDiscriminator)

    if netd == "basic":
        return NLayerDiscriminator(ndf=ndf, n_layers=3)
    if netd == "n_layers":
        return NLayerDiscriminator(ndf=ndf, n_layers=n_layers)
    if netd == "pixel":
        return PixelDiscriminator(ndf=ndf)
    if netd == "cls":
        return NLayerDiscriminatorCls(ndf=ndf, n_layers=n_layers, **kw)
    raise ValueError(f"unknown netD {netd}")


class TridentGeneratorVariant(nn.Module):
    """The remaining trident (3-branch) generator variants
    (networks.py:1467-2153), parameterized by warp kind:

      - 'both'        full_ifw / full_ifw_colorcoded (land_nc=3): TPS grid
                      + intrinsic flow, concatenated (channel-doubling)
      - 'dual_motion' full_ifw2: two TPS grids, concatenated
      - 'motion'      full_ifw_single / single3: TPS grid only (no doubling)
      - 'flow'        full_ifw_single2 / ifw_single2: intrinsic flow only

    Branch channel schemes follow the reference: doubling variants stem
    branch 1 at ngf/2 and let the warp double it; single-warp variants stem
    at ngf and widen in the strided convs instead.
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    div: int = 3
    disp: int = 1
    warp: str = "both"
    land_nc: int = 1
    padding_type: str = "reflect"

    def _warp(self, x, motion, flow, ifmask, motion2, level):
        from animateportrait_tpu.models.gan import double_feature_warping
        from animateportrait_tpu.nn import interpolate_bilinear
        from animateportrait_tpu.ops.warp import grid_sample, warp_acc_flow

        if self.warp == "both":
            return double_feature_warping(x, motion, flow, ifmask, level)
        if level > 0:
            size = x.shape[1:3]
            scale = 2 ** level
            if self.warp != "flow":
                motion = interpolate_bilinear(motion, size,
                                              align_corners=True)
            if self.warp == "dual_motion":
                motion2 = interpolate_bilinear(motion2, size,
                                               align_corners=True)
            elif self.warp == "flow":
                flow = interpolate_bilinear(flow / scale, size,
                                            align_corners=True)
                ifmask = interpolate_bilinear(ifmask, size,
                                              align_corners=True)
        if self.warp == "dual_motion":
            x1 = grid_sample(x, motion, align_corners=False)
            x2 = grid_sample(x, motion2, align_corners=False)
            return jnp.concatenate([x1, x2], axis=-1)
        if self.warp == "motion":
            return grid_sample(x, motion, align_corners=False)
        return warp_acc_flow(x, flow, mask=ifmask)

    @nn.compact
    def __call__(self, x_in, land1, land2, motion=None, flow=None,
                 ifmask=None, motion2=None):
        ngf = self.ngf
        doubling = self.warp in ("both", "dual_motion")
        stem1 = ngf // 2 if doubling else ngf
        b2_mid = ngf if doubling else ngf * 2
        b3_mid2 = ngf * 2 if doubling else ngf * 4

        w = lambda x, lv: self._warp(  # noqa: E731
            x, motion, flow, ifmask, motion2, lv)

        x1 = StemConv7(stem1, name="tri00")(x_in)
        x1 = w(x1, 0)
        x1 = ConvINReLU(ngf * 2, stride=2, name="tri01")(x1)
        x1 = ConvINReLU(ngf * 4, stride=2, name="tri02")(x1)
        x2 = StemConv7(ngf, name="tri10")(x_in)
        x2 = ConvINReLU(b2_mid, stride=2, name="tri11")(x2)
        x2 = w(x2, 1)
        x2 = ConvINReLU(ngf * 4, stride=2, name="tri12")(x2)
        x3 = StemConv7(ngf, name="tri20")(x_in)
        x3 = ConvINReLU(ngf * 2, stride=2, name="tri21")(x3)
        x3 = ConvINReLU(b3_mid2, stride=2, name="tri22")(x3)
        x3 = w(x3, 2)

        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = nn.Conv(ngf * 4, (3, 3), padding=1, name="merge")(x)

        lenc = LandmarkEncoder(name="landmark_trans")
        l1, l2 = lenc(land1), lenc(land2)
        for i in range(self.n_blocks):
            if (i + self.disp) % self.div == 0:
                x = ResnetBlock2(ngf * 4, self.padding_type,
                                 name=f"block{i}")(
                    jnp.concatenate([x, l1, l2], axis=-1))
            else:
                x = ResnetBlock(ngf * 4, self.padding_type,
                                name=f"block{i}")(x)
        x = Upsample2x(ngf * 2, name="up0")(x)
        x = Upsample2x(ngf, name="up1")(x)
        x = reflect_pad_2d(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding=0, name="out")(x)
        return jnp.tanh(x)


class ConditionalResnetDualHead(nn.Module):
    """resnet_9blocks_rcatland4 (networks.py:2060-2176): shared encoder,
    two landmark-conditioned block stacks + two decoders -> (out1, out2)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    n_blocks2: int = 9
    div: int = 3
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x_in, land1, land2):
        ngf = self.ngf
        x = StemConv7(ngf, name="stem")(x_in)
        x = ConvINReLU(ngf * 2, stride=2, name="down0")(x)
        x = ConvINReLU(ngf * 4, stride=2, name="down1")(x)
        lenc = LandmarkEncoder(name="landmark_trans")
        l1, l2 = lenc(land1), lenc(land2)

        def stack(y, n, prefix):
            for i in range(n):
                if (i + 1) % self.div == 0:
                    y = ResnetBlock2(ngf * 4, self.padding_type,
                                     name=f"{prefix}block{i}")(
                        jnp.concatenate([y, l1, l2], axis=-1))
                else:
                    y = ResnetBlock(ngf * 4, self.padding_type,
                                    name=f"{prefix}block{i}")(y)
            y = Upsample2x(ngf * 2, name=f"{prefix}up0")(y)
            y = Upsample2x(ngf, name=f"{prefix}up1")(y)
            y = reflect_pad_2d(y, 3)
            y = nn.Conv(self.output_nc, (7, 7), padding=0,
                        name=f"{prefix}out")(y)
            return jnp.tanh(y)

        return stack(x, self.n_blocks, "a_"), stack(x, self.n_blocks2,
                                                    "b_")


class ConditionalResnetWarped(nn.Module):
    """resnet_9blocks_rcatland2 (networks.py:2208-2300): shared encoder for
    the photo AND a pre-warped photo; conditioned blocks consume the warped
    encoding instead of landmark images. __call__(input, warped)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    div: int = 3
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x_in, warped):
        ngf = self.ngf
        stem = StemConv7(ngf, name="stem")
        down0 = ConvINReLU(ngf * 2, stride=2, name="down0")
        down1 = ConvINReLU(ngf * 4, stride=2, name="down1")

        def encode(y):
            return down1(down0(stem(y)))

        x = encode(x_in)
        x1 = encode(warped)  # shared weights (model11 is commented out)
        for i in range(self.n_blocks):
            if (i + 1) % self.div == 0:
                x = ResnetBlock2(ngf * 4, self.padding_type,
                                 name=f"block{i}")(
                    jnp.concatenate([x, x1], axis=-1))
            else:
                x = ResnetBlock(ngf * 4, self.padding_type,
                                name=f"block{i}")(x)
        x = Upsample2x(ngf * 2, name="up0")(x)
        x = Upsample2x(ngf, name="up1")(x)
        x = reflect_pad_2d(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding=0, name="out")(x)
        return jnp.tanh(x)


class UnetParseSkipBlock(nn.Module):
    """UnetParseSkipConnectionBlock (networks.py:334-405).

    Like the plain Unet skip block but BatchNorm (define_P's default
    norm='batch'), ConvTranspose with output_padding=1 followed by a
    center crop back to the input size (the reference's size-repair
    quirk, :393-399), and tanh INSIDE the outermost block.
    """

    outer_nc: int
    inner_nc: int
    inner: nn.Module | None = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)(y)

        y = x
        if not self.outermost:
            y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.inner_nc, (4, 4), strides=2, padding=1,
                    use_bias=False, name="down")(y)
        if not (self.outermost or self.innermost):
            y = bn(y, "down_bn")
        if self.inner is not None:
            y = self.inner(y, train)
        y = nn.relu(y)
        y = ConvTranspose2dTorch(self.outer_nc, kernel=4, stride=2,
                                 padding=1, output_padding=1,
                                 use_bias=self.outermost, name="up")(y)
        # center crop back to the block's input size (:393-399); torch puts
        # the output_padding row at bottom/right, so this drops it
        ha, wa = x.shape[1], x.shape[2]
        t = (y.shape[1] - ha) // 2
        l = (y.shape[2] - wa) // 2
        y = y[:, t:t + ha, l:l + wa, :]
        if self.outermost:
            return jnp.tanh(y)
        y = bn(y, "up_bn")
        if self.use_dropout and not (self.outermost or self.innermost):
            y = nn.Dropout(0.5, deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class UnetParseGenerator(nn.Module):
    """Segmentation U-Net (networks.py:311-331): softmax over
    segment_classes channels."""

    segment_classes: int = 3
    num_downs: int = 7
    ngf: int = 64
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ngf = self.ngf
        block = UnetParseSkipBlock(ngf * 8, ngf * 8, innermost=True,
                                   name="inner")
        for i in range(self.num_downs - 5):
            block = UnetParseSkipBlock(ngf * 8, ngf * 8, inner=block,
                                       use_dropout=self.use_dropout,
                                       name=f"mid{i}")
        block = UnetParseSkipBlock(ngf * 4, ngf * 8, inner=block,
                                   name="up4")
        block = UnetParseSkipBlock(ngf * 2, ngf * 4, inner=block,
                                   name="up2")
        block = UnetParseSkipBlock(ngf, ngf * 2, inner=block, name="up1")
        block = UnetParseSkipBlock(self.segment_classes, ngf, inner=block,
                                   outermost=True, name="outer")
        return nn.softmax(block(x, train), axis=-1)


def define_p(segment_classes: int, which_model_netg: str = "unet_128",
             ngf: int = 64, use_dropout: bool = False):
    """Reference define_P (networks.py:294-309)."""
    downs = {"unet_128": 6, "unet_256": 7}
    if which_model_netg not in downs:
        raise ValueError(f"unknown parse netG {which_model_netg}")
    return UnetParseGenerator(segment_classes=segment_classes,
                              num_downs=downs[which_model_netg], ngf=ngf,
                              use_dropout=use_dropout)
