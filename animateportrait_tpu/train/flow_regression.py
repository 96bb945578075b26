"""Intrinsic-flow regressor training (provenance of the frozen netF).

Behavioral reimplementation of
`Module2/intrinsic_flow_models/{flow_regression_model,modules}.py`: masked
L1/L2/EPE flow metrics, the flownet2-style MultiScaleFlowLoss (avg/max-pool
pyramid, div_flow 0.05, weights 0.32/2^s), cross-entropy visibility loss,
and the Adam train step over FlowUnet — so the shipped
`FlowReg_id_flow_faces` checkpoint can be reproduced from scratch on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animateportrait_tpu.models.flowunet import FlowUnet, kp_to_map_binary


def _masked_l1(inp, tgt, mask):
    """modules.L1 (:374-384), NHWC (..., 2) flows, (..., 1) mask."""
    bsz = inp.shape[0]
    err = jnp.abs(tgt - inp) * mask
    count = mask.reshape(bsz, -1).sum(axis=1, keepdims=True)
    return (err.reshape(bsz, -1) / (count * bsz * 2 + 1e-8)).sum()


def _masked_l2(inp, tgt, mask):
    bsz = inp.shape[0]
    err = jnp.linalg.norm(tgt - inp, axis=-1, keepdims=True) * mask
    count = mask.reshape(bsz, -1).sum(axis=1, keepdims=True)
    return (err.reshape(bsz, -1) / (count * bsz + 1e-8)).sum()


def epe(inp, tgt, mask):
    """modules.EPE (:361-372)."""
    bsz = inp.shape[0]
    e = jnp.linalg.norm(tgt - inp, axis=-1, keepdims=True) * mask
    count = mask.reshape(bsz, -1).sum(axis=1, keepdims=True)
    return (e.reshape(bsz, -1) / (count * bsz + 1e-8)).sum()


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _max_pool(x, k):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID")


def multi_scale_flow_loss(flow_pyramid, target_flow, vis_mask,
                          start_scale: int = 2, l_weight: float = 0.32,
                          div_flow: float = 0.05, loss_type: str = "l1"):
    """MultiScaleFlowLoss (modules.py:400-429): returns (loss, epe)."""
    loss_fn = _masked_l1 if loss_type == "l1" else _masked_l2
    target = target_flow * div_flow
    loss = 0.0
    e = 0.0
    for i, inp in enumerate(flow_pyramid):
        k = start_scale * (2 ** i)
        t = _avg_pool(target, k)
        m = _max_pool(vis_mask, k)
        w = l_weight / (2 ** i)
        loss = loss + w * loss_fn(inp, t, m)
        e = e + w * epe(inp, t, m)
    return loss, e


def ss_flow_loss(input_flow, target_flow, seg_1, seg_2, vis_2,
                 loss_type: str = "l1", div_flow: float = 0.05):
    """modules.SS_FlowLoss (:431-460): segmentation-sensitive flow loss —
    penalizes only pixels whose predicted flow lands in a WRONG
    segmentation region of the source.

    input_flow/target_flow: (N,H,W,2) pixel-space (the x20-scaled net
    output and the GT); seg_1/seg_2: (N,H,W,ns) one-hot with channel 0 =
    background; vis_2: (N,H,W) or (N,H,W,1) visibility classes. The mask
    is built under stop_gradient like the reference's torch.no_grad.
    """
    from animateportrait_tpu.ops.warp import warp_acc_flow

    if vis_2.ndim == 3:
        vis_2 = vis_2[..., None]
    fg_1 = seg_1[..., 1:]
    fg_2 = seg_2[..., 1:]
    seg_1w = (warp_acc_flow(fg_1, input_flow) > 0).astype(input_flow.dtype)
    mask = jnp.sum(fg_2 * (1.0 - seg_1w), axis=-1, keepdims=True)
    mask = jax.lax.stop_gradient(
        mask * (vis_2 == 0).astype(input_flow.dtype))
    err = (input_flow - target_flow) * div_flow * mask
    if loss_type == "l1":
        return jnp.mean(jnp.abs(err))
    return jnp.mean(jnp.linalg.norm(err, axis=-1))


def psnr(a, b, max_val: float = 1.0):
    """modules.PSNR (:560-570)."""
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10(max_val ** 2 / (mse + 1e-12)))


@dataclasses.dataclass(frozen=True)
class FlowRegConfig:
    lr: float = 2e-4
    beta1: float = 0.9
    num_scale: int = 4
    loss_weight_vis: float = 1.0
    # --use_ss_flow_loss (flow_regression_model.py:47-48,123-124):
    # segmentation-sensitive flow term on the x20 pixel-space output
    use_ss_flow_loss: bool = False
    loss_weight_flow_ss: float = 1.0


class FlowRegTrainState(struct.PyTreeNode):
    step: jax.Array
    variables: Any
    opt: Any


def init_flow_state(cfg: FlowRegConfig, rng, input_nc: int = 136,
                    size: int = 224) -> FlowRegTrainState:
    model = FlowUnet(num_scale=cfg.num_scale)
    variables = model.init(rng, jnp.zeros((1, size, size, input_nc)))
    tx = optax.adam(cfg.lr, b1=cfg.beta1)
    return FlowRegTrainState(step=jnp.zeros((), jnp.int32),
                             variables=variables,
                             opt=tx.init(variables["params"]))


def build_flow_train_step(cfg: FlowRegConfig):
    """train_step(state, kp1 (N,68,2), kp2 (N,68,2), flow_gt (N,224,224,2),
    vis_gt (N,224,224) int {0,1,2}) — joint-heatmap input type
    (flow_regression_model.py:94-129)."""
    model = FlowUnet(num_scale=cfg.num_scale)
    tx = optax.adam(cfg.lr, b1=cfg.beta1)

    def loss_fn(params, batch_stats, kp1, kp2, flow_gt, vis_gt,
                seg_1, seg_2):
        j1 = kp_to_map_binary((224, 224), kp1)
        j2 = kp_to_map_binary((224, 224), kp2)
        inp = jnp.concatenate([j1, j2], axis=-1)
        (flow_out, vis_out, flow_pyr, _), updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, inp,
            train=True, mutable=["batch_stats"])
        vis_mask = (vis_gt < 2).astype(jnp.float32)[..., None]
        l_flow, e = multi_scale_flow_loss(flow_pyr, flow_gt, vis_mask)
        logp = jax.nn.log_softmax(vis_out, axis=-1)
        l_vis = -jnp.mean(jnp.take_along_axis(
            logp, vis_gt[..., None], axis=-1))
        loss = l_flow + cfg.loss_weight_vis * l_vis
        metrics = {"loss": loss, "flow": l_flow, "vis": l_vis, "epe": e}
        if cfg.use_ss_flow_loss:
            l_ss = ss_flow_loss(flow_out * 20.0, flow_gt, seg_1, seg_2,
                                vis_gt)
            loss = loss + cfg.loss_weight_flow_ss * l_ss
            metrics["flow_ss"] = l_ss
            metrics["loss"] = loss
        return loss, (updates["batch_stats"], metrics)

    def train_step(state, kp1, kp2, flow_gt, vis_gt,
                   seg_1=None, seg_2=None):
        (_, (stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.variables["params"], state.variables["batch_stats"],
            kp1, kp2, flow_gt, vis_gt, seg_1, seg_2)
        updates, opt = tx.update(grads, state.opt,
                                 state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        return state.replace(
            step=state.step + 1,
            variables={"params": params, "batch_stats": stats},
            opt=opt), metrics

    return train_step
