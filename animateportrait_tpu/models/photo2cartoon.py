"""Photo2Cartoon U-GAT-IT-style generator (SoftAdaLIN + hourglass), NHWC.

Behavioral reimplementation of `Module2/models/photo2cartoon.py:166-525`
(ngf=32, light=True as shipped, :530-536). The inference2 path used by the
cartoon pipeline (:569-600) does NOT consume the TF1 FaceSeg mask (its use
is commented out in the reference), so the missing `seg_model_384.pb` blob
is irrelevant: input is simply img/127.5 - 1.

Numerics quirks preserved: adaLIN/LIN use torch.var's *unbiased* variance;
hourglass/up-block upsampling is nearest-neighbor 2x.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from animateportrait_tpu.nn import InstanceNorm, reflect_pad_2d


def _upsample2x_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _var_unbiased(x, axes):
    mean = jnp.mean(x, axis=axes, keepdims=True)
    n = 1
    for a in axes:
        n *= x.shape[a]
    return jnp.sum(jnp.square(x - mean), axis=axes, keepdims=True) / (n - 1)


class LIN(nn.Module):
    """Learnable IN/LN mix (photo2cartoon.py:507-525), unbiased variance."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        rho = self.param("rho", nn.initializers.zeros, (self.features,))
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        in_mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        out_in = (x - in_mean) * jax.lax.rsqrt(
            _var_unbiased(x, (1, 2)) + self.eps)
        ln_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        out_ln = (x - ln_mean) * jax.lax.rsqrt(
            _var_unbiased(x, (1, 2, 3)) + self.eps)
        out = rho * out_in + (1 - rho) * out_ln
        return out * gamma + beta


class AdaLIN(nn.Module):
    """adaLIN (photo2cartoon.py:489-505): IN/LN mix with external
    gamma/beta."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, gamma, beta):
        rho = self.param(
            "rho", lambda k, s: jnp.full(s, 0.9), (self.features,))
        in_mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        out_in = (x - in_mean) * jax.lax.rsqrt(
            _var_unbiased(x, (1, 2)) + self.eps)
        ln_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        out_ln = (x - ln_mean) * jax.lax.rsqrt(
            _var_unbiased(x, (1, 2, 3)) + self.eps)
        out = rho * out_in + (1 - rho) * out_ln
        return out * gamma[:, None, None, :] + beta[:, None, None, :]


class SoftAdaLIN(nn.Module):
    """Blend content/style gamma-beta with learned weights
    (photo2cartoon.py:466-487)."""

    features: int

    @nn.compact
    def __call__(self, x, content, style):
        f = self.features
        cg = nn.Dense(f, name="c_gamma_1")(
            nn.relu(nn.Dense(f, name="c_gamma_0")(content)))
        cb = nn.Dense(f, name="c_beta_1")(
            nn.relu(nn.Dense(f, name="c_beta_0")(content)))
        sg = nn.Dense(f, name="s_gamma")(style)
        sb = nn.Dense(f, name="s_beta")(style)
        w_gamma = self.param("w_gamma", nn.initializers.zeros, (f,))
        w_beta = self.param("w_beta", nn.initializers.zeros, (f,))
        soft_gamma = (1.0 - w_gamma) * sg + w_gamma * cg
        soft_beta = (1.0 - w_beta) * sb + w_beta * cb
        return AdaLIN(f, name="norm")(x, soft_gamma, soft_beta)


class UGATITConvBlock(nn.Module):
    """Pre-act dense block: three IN+ReLU+conv stages concatenated
    (photo2cartoon.py:294-328)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        d = self.dim_out
        y = reflect_pad_2d(nn.relu(InstanceNorm()(x)), 1)
        x1 = nn.Conv(d // 2, (3, 3), padding=0, use_bias=False,
                     name="conv1")(y)
        y = reflect_pad_2d(nn.relu(InstanceNorm()(x1)), 1)
        x2 = nn.Conv(d // 4, (3, 3), padding=0, use_bias=False,
                     name="conv2")(y)
        y = reflect_pad_2d(nn.relu(InstanceNorm()(x2)), 1)
        x3 = nn.Conv(d // 4, (3, 3), padding=0, use_bias=False,
                     name="conv3")(y)
        out = jnp.concatenate([x1, x2, x3], axis=-1)
        residual = x
        if x.shape[-1] != d:
            residual = nn.Conv(d, (1, 1), padding=0, use_bias=False,
                               name="conv4")(nn.relu(InstanceNorm()(x)))
        return residual + out


class HourGlassBlock(nn.Module):
    """4-level hourglass of UGATITConvBlocks (photo2cartoon.py:359-416)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        cb = lambda name: UGATITConvBlock(self.dim, name=name)  # noqa: E731
        skips, down = [], x
        for i in range(1, 5):
            skips.append(cb(f"conv{i}_1")(down))
            down = cb(f"conv{i}_2")(_avg_pool2(down))
        up = cb("conv5")(down)
        for i, blk in enumerate(("conv6", "conv7", "conv8", "conv9")):
            up = _upsample2x_nearest(cb(blk)(up))
            up = skips[3 - i] + up
        return up


class HourGlass(nn.Module):
    """HourGlassBlock + ConvBlock + 1x1 conv head (photo2cartoon.py:330-357).
    With use_res the 3-ch intermediate is projected back and added."""

    dim: int
    use_res: bool = True

    @nn.compact
    def __call__(self, x):
        ll = HourGlassBlock(self.dim, name="hg")(x)
        ll = UGATITConvBlock(self.dim, name="hg_conv")(ll)
        ll = nn.Conv(self.dim, (1, 1), padding=0, use_bias=False,
                     name="hg_conv1x1")(ll)
        ll = nn.relu(InstanceNorm()(ll))
        tmp_out = nn.Conv(3, (1, 1), padding=0, name="conv1")(ll)
        if not self.use_res:
            return tmp_out
        ll = nn.Conv(self.dim, (1, 1), padding=0, name="conv2")(ll)
        tmp = nn.Conv(self.dim, (1, 1), padding=0, name="conv3")(tmp_out)
        return x + ll + tmp


class P2CResnetBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        y = reflect_pad_2d(x, 1)
        y = nn.Conv(self.dim, (3, 3), padding=0, use_bias=False,
                    name="conv1")(y)
        y = nn.relu(InstanceNorm()(y))
        y = reflect_pad_2d(y, 1)
        y = nn.Conv(self.dim, (3, 3), padding=0, use_bias=False,
                    name="conv2")(y)
        return x + InstanceNorm()(y)


class P2CSoftAdaLINBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, content, style):
        y = reflect_pad_2d(x, 1)
        y = nn.Conv(self.dim, (3, 3), padding=0, use_bias=False,
                    name="conv1")(y)
        y = nn.relu(SoftAdaLIN(self.dim, name="norm1")(y, content, style))
        y = reflect_pad_2d(y, 1)
        y = nn.Conv(self.dim, (3, 3), padding=0, use_bias=False,
                    name="conv2")(y)
        return SoftAdaLIN(self.dim, name="norm2")(y, content, style) + x


class Photo2CartoonGenerator(nn.Module):
    """UGATIT ResnetGenerator (ngf=32, light=True as shipped).

    __call__(img (N,256,256,3) in [-1,1]) -> (cartoon, cam_logit, heatmap).
    """

    ngf: int = 32
    light: bool = True

    @nn.compact
    def __call__(self, x):
        ngf = self.ngf
        x = reflect_pad_2d(x, 3)
        x = nn.Conv(ngf, (7, 7), padding=0, use_bias=False,
                    name="conv_in")(x)
        x = nn.relu(InstanceNorm()(x))
        x = HourGlass(ngf, name="hourglass1")(x)
        x = HourGlass(ngf, name="hourglass2")(x)

        for i, ch in enumerate((ngf * 2, ngf * 4)):
            x = reflect_pad_2d(x, 1)
            x = nn.Conv(ch, (3, 3), strides=2, padding=0, use_bias=False,
                        name=f"down{i + 1}")(x)
            x = nn.relu(InstanceNorm()(x))

        contents = []
        for i in range(1, 5):
            x = P2CResnetBlock(ngf * 4, name=f"encode{i}")(x)
            contents.append(jnp.mean(x, axis=(1, 2)))

        gap = jnp.mean(x, axis=(1, 2))
        gap_w = self.param("gap_fc_kernel", nn.initializers.lecun_normal(),
                           (ngf * 4, 1))
        gap_b = self.param("gap_fc_bias", nn.initializers.zeros, (1,))
        gap_logit = gap @ gap_w + gap_b
        gap_x = x * gap_w[:, 0][None, None, None, :]

        gmp = jnp.max(x, axis=(1, 2))
        gmp_w = self.param("gmp_fc_kernel", nn.initializers.lecun_normal(),
                           (ngf * 4, 1))
        gmp_b = self.param("gmp_fc_bias", nn.initializers.zeros, (1,))
        gmp_logit = gmp @ gmp_w + gmp_b
        gmp_x = x * gmp_w[:, 0][None, None, None, :]

        cam_logit = jnp.concatenate([gap_logit, gmp_logit], axis=1)
        x = jnp.concatenate([gap_x, gmp_x], axis=-1)
        x = nn.relu(nn.Conv(ngf * 4, (1, 1), padding=0, name="conv1x1")(x))
        heatmap = jnp.sum(x, axis=-1, keepdims=True)

        if self.light:
            s = jnp.mean(x, axis=(1, 2))
        else:
            s = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        s = nn.relu(nn.Dense(ngf * 4, name="fc0")(s))
        style = nn.relu(nn.Dense(ngf * 4, name="fc1")(s))

        for i in range(1, 5):
            x = P2CSoftAdaLINBlock(ngf * 4, name=f"decode{i}")(
                x, contents[4 - i], style)

        for i, ch in enumerate((ngf * 2, ngf)):
            x = _upsample2x_nearest(x)
            x = reflect_pad_2d(x, 1)
            x = nn.Conv(ch, (3, 3), padding=0, use_bias=False,
                        name=f"up{i + 1}")(x)
            x = nn.relu(LIN(ch, name=f"up{i + 1}_lin")(x))

        x = HourGlass(ngf, name="hourglass3")(x)
        x = HourGlass(ngf, use_res=False, name="hourglass4")(x)
        x = reflect_pad_2d(x, 3)
        x = nn.Conv(3, (7, 7), padding=0, use_bias=False,
                    name="conv_out")(x)
        return jnp.tanh(x), cam_logit, heatmap


def load_photo2cartoon_params(sd) -> dict:
    """Reference `static/cartoon.pt['genA2B']` -> params."""
    import numpy as np
    from animateportrait_tpu.io import torch_convert as tc

    sd = tc.strip_module_prefix(sd)
    p: dict = {}

    def conv(ours, theirs, bias=False):
        node = p
        for seg in ours.split(".")[:-1]:
            node = node.setdefault(seg, {})
        node[ours.split(".")[-1]] = tc.conv2d(sd, theirs, bias=bias)

    def ugatit_block(ours, theirs):
        conv(f"{ours}.conv1", f"{theirs}.ConvBlock1.3")
        conv(f"{ours}.conv2", f"{theirs}.ConvBlock2.3")
        conv(f"{ours}.conv3", f"{theirs}.ConvBlock3.3")
        if f"{theirs}.ConvBlock4.2.weight" in sd:
            conv(f"{ours}.conv4", f"{theirs}.ConvBlock4.2")

    def hourglass(ours, theirs, use_res=True):
        hg = f"{theirs}.HG.0"
        for i in range(1, 5):
            ugatit_block(f"{ours}.hg.conv{i}_1", f"{hg}.ConvBlock{i}_1")
            ugatit_block(f"{ours}.hg.conv{i}_2", f"{hg}.ConvBlock{i}_2")
        ugatit_block(f"{ours}.hg.conv5", f"{hg}.ConvBlock5")
        for i in range(6, 10):
            ugatit_block(f"{ours}.hg.conv{i}", f"{hg}.ConvBlock{i}")
        ugatit_block(f"{ours}.hg_conv", f"{theirs}.HG.1")
        conv(f"{ours}.hg_conv1x1", f"{theirs}.HG.2")
        conv(f"{ours}.conv1", f"{theirs}.Conv1", bias=True)
        if use_res:
            conv(f"{ours}.conv2", f"{theirs}.Conv2", bias=True)
            conv(f"{ours}.conv3", f"{theirs}.Conv3", bias=True)

    def soft_adalin(ours, theirs):
        node = p
        for seg in ours.split("."):
            node = node.setdefault(seg, {})
        node["w_gamma"] = np.asarray(sd[f"{theirs}.w_gamma"]).reshape(-1)
        node["w_beta"] = np.asarray(sd[f"{theirs}.w_beta"]).reshape(-1)
        node["c_gamma_0"] = tc.dense(sd, f"{theirs}.c_gamma.0")
        node["c_gamma_1"] = tc.dense(sd, f"{theirs}.c_gamma.2")
        node["c_beta_0"] = tc.dense(sd, f"{theirs}.c_beta.0")
        node["c_beta_1"] = tc.dense(sd, f"{theirs}.c_beta.2")
        node["s_gamma"] = tc.dense(sd, f"{theirs}.s_gamma")
        node["s_beta"] = tc.dense(sd, f"{theirs}.s_beta")
        node["norm"] = {
            "rho": np.asarray(sd[f"{theirs}.norm.rho"]).reshape(-1)}

    conv("conv_in", "ConvBlock1.1")
    hourglass("hourglass1", "HourGlass1")
    hourglass("hourglass2", "HourGlass2")
    conv("down1", "DownBlock1.1")
    conv("down2", "DownBlock2.1")
    for i in range(1, 5):
        conv(f"encode{i}.conv1", f"EncodeBlock{i}.conv_block.1")
        conv(f"encode{i}.conv2", f"EncodeBlock{i}.conv_block.5")
    p["gap_fc_kernel"] = tc.linear_kernel(sd["gap_fc.weight"])
    p["gap_fc_bias"] = np.asarray(sd["gap_fc.bias"])
    p["gmp_fc_kernel"] = tc.linear_kernel(sd["gmp_fc.weight"])
    p["gmp_fc_bias"] = np.asarray(sd["gmp_fc.bias"])
    p["conv1x1"] = tc.conv2d(sd, "conv1x1", bias=True)
    p["fc0"] = tc.dense(sd, "FC.0")
    p["fc1"] = tc.dense(sd, "FC.2")
    for i in range(1, 5):
        conv(f"decode{i}.conv1", f"DecodeBlock{i}.conv1")
        conv(f"decode{i}.conv2", f"DecodeBlock{i}.conv2")
        soft_adalin(f"decode{i}.norm1", f"DecodeBlock{i}.norm1")
        soft_adalin(f"decode{i}.norm2", f"DecodeBlock{i}.norm2")
    for i in (1, 2):
        conv(f"up{i}", f"UpBlock{i}.2")
        lin = f"UpBlock{i}.3"
        p[f"up{i}_lin"] = {
            "rho": np.asarray(sd[f"{lin}.rho"]).reshape(-1),
            "gamma": np.asarray(sd[f"{lin}.gamma"]).reshape(-1),
            "beta": np.asarray(sd[f"{lin}.beta"]).reshape(-1),
        }
    hourglass("hourglass3", "HourGlass3")
    hourglass("hourglass4", "HourGlass4", use_res=False)
    conv("conv_out", "ConvBlock2.1")
    return {"params": p}
