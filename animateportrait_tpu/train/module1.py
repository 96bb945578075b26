"""Module1 trainers: content branch and speaker-aware branch.

Behavioral reimplementation of
`Module1/src/approaches/train_content.py:80-141` and
`train_speaker_aware.py:177-339` as jitted train steps: lip-openness-
weighted L1, motion-delta loss, Laplacian mesh smoothness over the 68-pt
rings, and (speaker branch) the quaternion+translation head-pose loss.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animateportrait_tpu.models.audio2landmark import (
    Audio2landmarkContent, Audio2landmarkSpeakerAware)


def laplacian_rings() -> tuple[np.ndarray, np.ndarray]:
    """The reference's n1/n2 neighbor index rings (train_content.py:112-117)."""
    n1 = ([1] + list(range(0, 16)) + [18] + list(range(17, 21)) + [23]
          + list(range(22, 26)) + [28] + list(range(27, 35)) + [41]
          + list(range(36, 41)) + [47] + list(range(42, 47)) + [59]
          + list(range(48, 59)) + [67] + list(range(60, 67)))
    n2 = (list(range(1, 17)) + [15] + list(range(18, 22)) + [20]
          + list(range(23, 27)) + [25] + list(range(28, 36)) + [34]
          + list(range(37, 42)) + [36] + list(range(43, 48)) + [42]
          + list(range(49, 60)) + [48] + list(range(61, 68)) + [60])
    return np.asarray(n1), np.asarray(n2)


def laplacian_l1(pred_flat: jax.Array, gt_flat: jax.Array) -> jax.Array:
    n1, n2 = laplacian_rings()
    V = pred_flat.reshape(-1, 68, 3)
    G = gt_flat.reshape(-1, 68, 3)
    L_V = V - 0.5 * (V[:, n1] + V[:, n2])
    L_G = G - 0.5 * (G[:, n1] + G[:, n2])
    return jnp.mean(jnp.abs(L_V - L_G))


@dataclasses.dataclass(frozen=True)
class ContentConfig:
    lr: float = 1e-3
    use_lip_weight: bool = True
    use_motion_loss: bool = True
    lambda_laplacian: float = 1.0


class ContentTrainState(struct.PyTreeNode):
    step: jax.Array
    variables: Any              # params + batch_stats
    opt: Any


def init_content_state(cfg: ContentConfig, rng, window: int = 18
                       ) -> ContentTrainState:
    model = Audio2landmarkContent()
    variables = model.init(rng, jnp.zeros((2, window, 80)),
                           jnp.zeros((1, 204)))
    tx = optax.adam(cfg.lr)
    return ContentTrainState(step=jnp.zeros((), jnp.int32),
                             variables=variables,
                             opt=tx.init(variables["params"]))


def build_content_train_step(cfg: ContentConfig):
    """train_step(state, fls (N,W,204), aus (N,W,80), face_id (1,204))."""
    model = Audio2landmarkContent()
    tx = optax.adam(cfg.lr)

    def loss_fn(params, batch_stats, fls, aus, face_id):
        fls_gt = fls[:, 0, :]
        (fl_dis_pred, _), updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, aus, face_id,
            train=True, mutable=["batch_stats"])
        pred = fl_dis_pred + face_id[0:1]
        if cfg.use_lip_weight:
            w = jnp.abs(fls[:, 0, 66 * 3 + 1] - fls[:, 0, 62 * 3 + 1])
            w = 1.0 / (w * 4.0 + 0.1)
            lip_w = jnp.ones((fls.shape[0], 204))
            lip_w = lip_w.at[:, 48 * 3:].set(w[:, None])
            loss = jnp.mean(jnp.abs(pred - fls_gt) * lip_w)
        else:
            loss = jnp.mean(jnp.abs(pred - fls_gt))
        if cfg.use_motion_loss:
            loss += jnp.mean(jnp.abs(
                (fl_dis_pred[:-1] - fl_dis_pred[1:])
                - (fls_gt[:-1] - fls_gt[1:])))
        if cfg.lambda_laplacian > 0:
            loss += laplacian_l1(pred, fls_gt)
        return loss, updates["batch_stats"]

    def train_step(state: ContentTrainState, fls, aus, face_id):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.variables["params"], state.variables["batch_stats"],
            fls, aus, face_id)
        updates, opt = tx.update(grads, state.opt,
                                 state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        return state.replace(
            step=state.step + 1,
            variables={"params": params, "batch_stats": new_stats},
            opt=opt), {"loss": loss}

    return train_step


@dataclasses.dataclass(frozen=True)
class SpeakerAwareConfig:
    lr: float = 1e-3
    emb_coef: float = 3.0
    lambda_laplacian: float = 1.0
    pos_dim: int = 7


class SpeakerAwareTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt: Any


def init_speaker_aware_state(cfg: SpeakerAwareConfig, rng, window: int = 18
                             ) -> SpeakerAwareTrainState:
    model = Audio2landmarkSpeakerAware(pos_dim=cfg.pos_dim)
    variables = model.init(
        {"params": rng, "z_spk": rng}, jnp.zeros((2, window, 80)),
        jnp.zeros((2, 256)), jnp.zeros((1, 204)), add_z_spk=True)
    tx = optax.adam(cfg.lr)
    return SpeakerAwareTrainState(step=jnp.zeros((), jnp.int32),
                                  params=variables["params"],
                                  opt=tx.init(variables["params"]))


def build_speaker_aware_train_step(cfg: SpeakerAwareConfig):
    """train_step(state, aus (T,W,80), embs (T,256), face_id (1,204),
    reg_fls_gt (T,204), rot_quat (T,4), rot_trans (T,3,4), rng).

    Mirrors __train_speaker_aware__ (train_speaker_aware.py:255-339)
    without the frozen-C residual path (use_residual training defaults off
    for the from-scratch case).
    """
    model = Audio2landmarkSpeakerAware(pos_dim=cfg.pos_dim)
    tx = optax.adam(cfg.lr)

    def loss_fn(params, aus, embs, face_id, reg_fls_gt, rot_quat,
                rot_trans, rng):
        fl_dis_pred, pos_pred, _, _ = model.apply(
            {"params": params}, aus, embs * cfg.emb_coef, face_id,
            add_z_spk=True, rngs={"z_spk": rng})
        pred = fl_dis_pred + face_id[0:1]
        loss_reg = jnp.mean(jnp.abs(pred - reg_fls_gt))
        # the reference adds face_id twice inside its laplacian term
        # (train_speaker_aware.py:300,316) — preserved verbatim
        loss_lap = laplacian_l1(pred + face_id[0:1], reg_fls_gt) if (
            cfg.lambda_laplacian > 0) else 0.0
        if cfg.pos_dim == 7:
            pos_gt = jnp.concatenate(
                [rot_quat, rot_trans[:, :, 3]], axis=1)
        else:
            pos_gt = rot_trans.reshape(-1, 12)
        loss_pos = jnp.mean(jnp.abs(pos_pred - pos_gt))
        loss = loss_reg + loss_lap * cfg.lambda_laplacian + loss_pos
        return loss, {"loss": loss, "reg": loss_reg, "lap": loss_lap,
                      "pos": loss_pos}

    def train_step(state, aus, embs, face_id, reg_fls_gt, rot_quat,
                   rot_trans, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, aus, embs, face_id, reg_fls_gt, rot_quat,
            rot_trans, rng)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt=opt), metrics

    return train_step
