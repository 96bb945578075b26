"""Pose-transfer GAN framework (intrinsic-flow training wrapper).

Behavioral reimplementation of
`Module2/intrinsic_flow_models/pose_transfer_model.py` — the cascade of a
frozen 3d-flow module and a generation module (Unet or DualUnet), with the
optional external pixel-warper (netPW) stage — as ONE jitted SPMD train
step: flow prediction (no grad) -> masked x20 flow scaling
(pose_transfer_model.py:178-196) -> feature/image warping -> generator ->
L1 + VGG content/style (+ LSGAN) losses -> simultaneous Adam updates of G
(or PW, :112-116) and D (:318-321).

Departures from the reference, by design: the D update and the G update
happen in one compiled step from one forward (the reference's sequential
optimize_parameters re-runs nothing either — it reuses self.output);
dropout is an eval-time no-op as elsewhere in this package.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from animateportrait_tpu.models.flowunet import FlowUnet, kp_to_map_binary
from animateportrait_tpu.models.flowunet_extra import (
    _BN, DualUnetGenerator, IFUnetGenerator, IFUnetGeneratorMultiOutput)
from animateportrait_tpu.models.image_translation import Vgg19Features
from animateportrait_tpu.ops.warp import warp_acc_flow
from animateportrait_tpu.utils.metrics import psnr_ref


class BNPatchDiscriminator(nn.Module):
    """intrinsic_flow_models/networks.py:750-798 NLayerDiscriminator: the
    PatchGAN with its default BatchNorm2d norm_layer (the Module2 GAN file
    uses InstanceNorm; this one does not), output_bias=True, and a sigmoid
    head for dcgan mode."""

    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw, padw = 4, 1
        x = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw,
                    name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=2,
                        padding=padw, use_bias=False, name=f"conv{n}")(x)
            x = nn.leaky_relu(_BN(name=f"norm{n}")(x, train), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=1, padding=padw,
                    use_bias=False, name=f"conv{self.n_layers}")(x)
        x = nn.leaky_relu(_BN(name=f"norm{self.n_layers}")(x, train), 0.2)
        x = nn.Conv(1, (kw, kw), strides=1, padding=padw, name="out")(x)
        return nn.sigmoid(x) if self.use_sigmoid else x


def gan_loss(pred, target_is_real: bool, gan_type: str = "lsgan"):
    """modules.GANLoss (modules.py:222-241): mse for lsgan, binary
    cross-entropy (on already-sigmoided D output) for dcgan."""
    t = 1.0 if target_is_real else 0.0
    if gan_type == "lsgan":
        return jnp.mean(jnp.square(pred - t))
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


# shifted-gram cross-correlation offsets per VGG slice (modules.py:251)
_SHIFT_DELTA = ((0, 2, 4, 8, 16), (0, 2, 4, 8), (0, 2, 4), (0, 2), (0,))
_CONTENT_W = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def _pt_normalize(x):
    """modules.VGGLoss.normalize (:339-347): [-1,1] -> ImageNet stats."""
    mean = jnp.array([0.485, 0.456, 0.406], x.dtype)
    std = jnp.array([0.229, 0.224, 0.225], x.dtype)
    return (x * 0.5 + 0.5 - mean) / std


def _gram(feat):
    """Per-sample gram, NCHW flattening order (modules.py:349-355)."""
    b, h, w, c = feat.shape
    f = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, c, h * w)
    return jnp.einsum("bcl,bdl->bcd", f, f) / (c * h * w)


def _shifted_gram(feat, dx, dy):
    """modules.py:357-363: gram between a feature map and its (dx,dy)
    shifted self — a spatial cross-correlation of channels."""
    b, h, w, c = feat.shape
    f1 = jnp.transpose(feat[:, dy:, dx:, :], (0, 3, 1, 2)).reshape(b, c, -1)
    f2 = jnp.transpose(feat[:, :h - dy, :w - dx, :],
                       (0, 3, 1, 2)).reshape(b, c, -1)
    return jnp.einsum("bcl,bdl->bcd", f1, f2) / (c * h * w)


def pt_vgg_loss(vgg_vars, x, y, loss_type: str = "content",
                shifted_style: bool = False,
                content_weights=_CONTENT_W):
    """modules.VGGLoss forward (:286-337) on NHWC [-1,1] images.

    content: sum_i w_i * per-sample-mean L1 of slice i, averaged over batch.
    style: sum over slices of per-sample gram-MSE SUMMED over gram entries
    (not meaned — :324-333), plus the shifted-gram cross terms when
    ``shifted_style``; batch-averaged.
    """
    model = Vgg19Features()
    fx = model.apply(vgg_vars, _pt_normalize(x))
    fy = [jax.lax.stop_gradient(f)
          for f in model.apply(vgg_vars, _pt_normalize(y))]
    bsz = x.shape[0]
    loss = 0.0
    if loss_type == "content":
        for i, (a, b) in enumerate(zip(fx, fy)):
            loss = loss + content_weights[i] * jnp.mean(jnp.abs(a - b))
        return loss
    for i, (a, b) in enumerate(zip(fx, fy)):
        if shifted_style:
            for d in _SHIFT_DELTA[i]:
                if d == 0:
                    diff = jnp.square(_gram(a) - _gram(b))
                    loss = loss + diff.reshape(bsz, -1).sum(1).mean()
                else:
                    dh = jnp.square(_shifted_gram(a, d, 0)
                                    - _shifted_gram(b, d, 0))
                    dv = jnp.square(_shifted_gram(a, 0, d)
                                    - _shifted_gram(b, 0, d))
                    loss = loss + 0.5 * (dh + dv).reshape(bsz, -1) \
                        .sum(1).mean()
        else:
            diff = jnp.square(_gram(a) - _gram(b))
            loss = loss + diff.reshape(bsz, -1).sum(1).mean()
    return loss


@dataclasses.dataclass(frozen=True)
class PoseTransferConfig:
    """The PoseTransferModel option surface that changes the compiled
    program (pose_transfer_model.py:21-152 + its train_opt defaults)."""

    which_model_G: str = "dual_unet"  # 'unet' | 'dual_unet'
    G_nf: int = 32
    G_max_nf: int = 128
    G_n_scale: int = 7
    G_n_warp_scale: int = 5
    G_norm: str = "batch"
    G_vis_mode: str = "residual"
    G_activation: str = "relu"  # 'relu' | 'leaky_relu' (slope 0.1)
    G_no_end_norm: bool = False
    G_feat_warp: bool = True
    G_pix_warp: bool = False       # train netPW only, G frozen (:112-116)
    G_pix_warp_detach: bool = True
    flow_on_the_fly: bool = True
    flow_scale: float = 20.0       # :178
    joint_nc: int = 68
    size: int = 224
    D_nf: int = 64
    D_n_layers: int = 3
    gan_type: str = "lsgan"        # 'lsgan' | 'dcgan'
    shifted_style_loss: bool = False
    loss_weight_l1: float = 1.0
    loss_weight_content: float = 1.0
    loss_weight_style: float = 0.0
    loss_weight_gan: float = 0.01
    lr: float = 2e-4
    lr_D: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    weight_decay_D: float = 4e-4

    @property
    def slope(self) -> float:
        return 0.1 if self.G_activation == "leaky_relu" else 0.0

    @property
    def use_gan(self) -> bool:
        return self.loss_weight_gan > 0


def _build_g(cfg: PoseTransferConfig):
    if cfg.which_model_G == "dual_unet":
        return DualUnetGenerator(
            pose_nc=cfg.joint_nc, appearance_nc=3, output_nc=3,
            nf=cfg.G_nf, max_nf=cfg.G_max_nf, num_scales=cfg.G_n_scale,
            num_warp_scales=cfg.G_n_warp_scale, vis_mode=cfg.G_vis_mode,
            no_end_norm=cfg.G_no_end_norm)
    # 'unet': appearance+pose concatenated on channels (:26-38)
    return IFUnetGenerator(output_nc=3, nf=cfg.G_nf, max_nf=cfg.G_max_nf,
                           num_scales=cfg.G_n_scale, slope=cfg.slope)


def _build_pw(cfg: PoseTransferConfig):
    # netPW: img_out_G(3)+img_warp(3)+vis_out(1)+flow_out(2) input (:62-79)
    return IFUnetGeneratorMultiOutput(
        output_nc=(1,), nf=32, max_nf=128, num_scales=cfg.G_n_scale)


class PTTrainState(struct.PyTreeNode):
    step: jax.Array
    g: Any          # generator variables {params, batch_stats}
    pw: Any         # pixel-warper variables or None
    d: Any          # discriminator variables or None
    netf: Any       # frozen flow net variables (eval mode)
    vgg: Any        # frozen VGG19 features
    opt_g: Any      # Adam state for G params (or PW params in pix_warp)
    opt_d: Any


def _torch_adam(lr, b1, b2, wd):
    """torch.optim.Adam semantics: L2 weight decay folded into the
    gradient BEFORE the moment updates (not decoupled AdamW)."""
    chain = []
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    chain += [optax.scale_by_adam(b1=b1, b2=b2), optax.scale(-lr)]
    return optax.chain(*chain)


def init_pt_state(cfg: PoseTransferConfig, rng,
                  netf_vars=None, vgg_vars=None) -> PTTrainState:
    """Random-init everything; pass converted ``netf_vars``/``vgg_vars``
    to use the shipped frozen checkpoints."""
    ks = jax.random.split(rng, 5)
    n, s, j = 1, cfg.size, cfg.joint_nc
    img = jnp.zeros((n, s, s, 3))
    jmap = jnp.zeros((n, s, s, j))
    g_model = _build_g(cfg)
    if cfg.which_model_G == "dual_unet":
        g = g_model.init(ks[0], jmap, img, jnp.zeros((n, s, s, 2)),
                         jnp.zeros((n, s, s, 1)))
    else:
        g = g_model.init(ks[0], jnp.concatenate([img, jmap], -1))
    pw = (_build_pw(cfg).init(ks[1], jnp.zeros((n, s, s, 9)))
          if cfg.G_pix_warp else None)
    d = None
    if cfg.use_gan:
        d_in = 3 + 3 + j  # img_1+img_{2,out}+joint_2 (:86, D_input_type)
        d = BNPatchDiscriminator(
            ndf=cfg.D_nf, n_layers=cfg.D_n_layers,
            use_sigmoid=cfg.gan_type == "dcgan").init(
            ks[2], jnp.zeros((n, s, s, d_in)))
    if netf_vars is None:
        netf_vars = FlowUnet().init(ks[3], jnp.zeros((n, s, s, 2 * j)))
    if vgg_vars is None:
        vgg_vars = Vgg19Features().init(ks[4], img)
    tx_g = _torch_adam(cfg.lr, cfg.beta1, cfg.beta2, cfg.weight_decay)
    tx_d = _torch_adam(cfg.lr_D, cfg.beta1, cfg.beta2, cfg.weight_decay_D)
    trained = pw["params"] if cfg.G_pix_warp else g["params"]
    return PTTrainState(
        step=jnp.zeros((), jnp.int32), g=g, pw=pw, d=d,
        netf=netf_vars, vgg=vgg_vars, opt_g=tx_g.init(trained),
        opt_d=tx_d.init(d["params"]) if d is not None else None)


def _forward(cfg: PoseTransferConfig, g_vars, pw_vars, netf_vars,
             batch, train: bool):
    """pose_transfer_model.forward (:176-237). batch: img_1, img_2
    (N,H,W,3) in [-1,1]; kp_1, kp_2 (N,68,2) keypoints (joint maps are
    built on device, Av2Flau-style); optional flow_2to1 (N,H,W,2) + vis_2
    (N,H,W,1) ground truth when not flow_on_the_fly."""
    size = (cfg.size, cfg.size)
    j1 = kp_to_map_binary(size, batch["kp_1"])
    j2 = kp_to_map_binary(size, batch["kp_2"])
    out = {}
    if cfg.flow_on_the_fly:
        flow_raw, vis_logits, _, _ = FlowUnet().apply(
            netf_vars, jnp.concatenate([j1, j2], axis=-1))
        vis = jnp.argmax(vis_logits, axis=-1, keepdims=True) \
            .astype(jnp.float32)
        mask = (vis < 2).astype(jnp.float32)
        flow = jax.lax.stop_gradient(flow_raw * cfg.flow_scale * mask)
        vis = jax.lax.stop_gradient(vis)
    else:
        flow = batch["flow_2to1"]
        vis = batch["vis_2"]
        mask = (vis < 2).astype(jnp.float32)
    out["flow_out"], out["vis_out"], out["mask_out"] = flow, vis, mask
    # invalid regions fill with -1 (modules.warp_acc_flow mask_value)
    out["img_warp"] = warp_acc_flow(batch["img_1"], flow, mask=mask)

    g_model = _build_g(cfg)
    updates = {}
    if cfg.which_model_G == "dual_unet":
        fw = (flow, vis) if cfg.G_feat_warp else (None, None)
        if train and not cfg.G_pix_warp:
            raw, updates = g_model.apply(
                g_vars, j2, batch["img_1"], fw[0], fw[1], train=True,
                mutable=["batch_stats"])
        else:
            raw = g_model.apply(g_vars, j2, batch["img_1"], fw[0], fw[1])
    else:
        x = jnp.concatenate([batch["img_1"], j2], axis=-1)
        if train and not cfg.G_pix_warp:
            raw, updates = g_model.apply(g_vars, x, train=True,
                                         mutable=["batch_stats"])
        else:
            raw = g_model.apply(g_vars, x)
    if not cfg.G_pix_warp:
        out["img_out"] = jnp.tanh(raw)
    else:
        # PW stage: G frozen no-grad (:220-229)
        out["img_out_G"] = jax.lax.stop_gradient(jnp.tanh(raw))
        pw_in = jnp.concatenate(
            [out["img_out_G"], out["img_warp"], vis, flow], axis=-1)
        if train:
            heads, updates = _build_pw(cfg).apply(
                pw_vars, pw_in, train=True, mutable=["batch_stats"])
        else:
            heads = _build_pw(cfg).apply(pw_vars, pw_in)
        pmask = nn.sigmoid(heads[0])
        out["pix_mask"] = pmask
        base = out["img_out_G"]  # detach is a no-op: G already stopped
        out["img_out"] = out["img_warp"] * pmask + base * (1.0 - pmask)
    out["j2"] = j2
    return out, updates


def build_pt_train_step(cfg: PoseTransferConfig):
    """train_step(state, batch) -> (state, metrics): the
    optimize_parameters cycle (:307-321) as one jitted computation."""
    tx_g = _torch_adam(cfg.lr, cfg.beta1, cfg.beta2, cfg.weight_decay)
    tx_d = _torch_adam(cfg.lr_D, cfg.beta1, cfg.beta2, cfg.weight_decay_D)
    d_model = BNPatchDiscriminator(
        ndf=cfg.D_nf, n_layers=cfg.D_n_layers,
        use_sigmoid=cfg.gan_type == "dcgan")

    def g_loss_fn(trained_params, state, batch):
        if cfg.G_pix_warp:
            g_vars = state.g
            pw_vars = dict(state.pw, params=trained_params) \
                if state.pw else None
        else:
            g_vars = dict(state.g, params=trained_params)
            pw_vars = state.pw
        out, updates = _forward(cfg, g_vars, pw_vars, state.netf,
                                batch, train=True)
        img_out, img_tar = out["img_out"], batch["img_2"]
        m = {"loss_l1": jnp.mean(jnp.abs(img_out - img_tar)),
             "loss_content": pt_vgg_loss(state.vgg, img_out, img_tar,
                                         "content")}
        loss = m["loss_l1"] * cfg.loss_weight_l1 \
            + m["loss_content"] * cfg.loss_weight_content
        if cfg.loss_weight_style > 0:
            m["loss_style"] = pt_vgg_loss(state.vgg, img_out, img_tar,
                                          "style", cfg.shifted_style_loss)
            loss = loss + m["loss_style"] * cfg.loss_weight_style
        if cfg.use_gan:
            fake_in = jnp.concatenate(
                [batch["img_1"], img_out, out["j2"]], axis=-1)
            m["loss_G"] = gan_loss(
                d_model.apply(state.d, fake_in), True, cfg.gan_type)
            loss = loss + m["loss_G"] * cfg.loss_weight_gan
        return loss, (out, updates, m)

    def d_loss_fn(d_params, state, batch, out):
        d_vars = dict(state.d, params=d_params)
        real_in = jnp.concatenate(
            [batch["img_1"], batch["img_2"], out["j2"]], axis=-1)
        fake_in = jnp.concatenate(
            [batch["img_1"], jax.lax.stop_gradient(out["img_out"]),
             out["j2"]], axis=-1)
        real_pred, d_updates = d_model.apply(
            d_vars, real_in, train=True, mutable=["batch_stats"])
        fake_pred = d_model.apply(d_vars, fake_in)
        loss_d = 0.5 * (gan_loss(real_pred, True, cfg.gan_type)
                        + gan_loss(fake_pred, False, cfg.gan_type))
        return loss_d * cfg.loss_weight_gan, (d_updates, loss_d)

    def train_step(state: PTTrainState, batch):
        trained = state.pw["params"] if cfg.G_pix_warp \
            else state.g["params"]
        (_, (out, updates, metrics)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(trained, state, batch)
        up, opt_g = tx_g.update(grads, state.opt_g, trained)
        new_trained = optax.apply_updates(trained, up)
        if cfg.G_pix_warp:
            pw = {"params": new_trained,
                  "batch_stats": updates.get("batch_stats",
                                             state.pw["batch_stats"])}
            g = state.g
        else:
            g = {"params": new_trained,
                 "batch_stats": updates.get("batch_stats",
                                            state.g["batch_stats"])}
            pw = state.pw
        d, opt_d = state.d, state.opt_d
        if cfg.use_gan:
            (_, (d_updates, loss_d)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(
                state.d["params"], state, batch, out)
            d_up, opt_d = tx_d.update(d_grads, state.opt_d,
                                      state.d["params"])
            d = {"params": optax.apply_updates(state.d["params"], d_up),
                 "batch_stats": d_updates["batch_stats"]}
            metrics["loss_D"] = loss_d
        metrics["PSNR"] = psnr_ref(out["img_out"], batch["img_2"])
        return state.replace(step=state.step + 1, g=g, pw=pw, d=d,
                             opt_g=opt_g, opt_d=opt_d), metrics

    return train_step


def build_pt_test_step(cfg: PoseTransferConfig):
    """test (:239-246): eval forward + PSNR/SSIM measurements."""
    from animateportrait_tpu.utils.metrics import ssim_ref

    def test_step(state: PTTrainState, batch):
        out, _ = _forward(cfg, state.g, state.pw, state.netf, batch,
                          train=False)
        return out, {"PSNR": psnr_ref(out["img_out"], batch["img_2"]),
                     "SSIM": ssim_ref(out["img_out"], batch["img_2"])}

    return test_step
