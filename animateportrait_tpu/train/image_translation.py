"""Module1 image-translation (MakeItTalk texture renderer) trainer.

Behavioral reimplementation of
`Module1/src/approaches/train_image_translation.py`: ResUnet generator over
a 6-channel input (reference frame + landmark sketch), trained with
L1 + VGG perceptual + Gram style losses (:205-210), Adam.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animateportrait_tpu.models.image_translation import (
    ResUnetGenerator, vgg_loss)


@dataclasses.dataclass(frozen=True)
class ImageTranslationConfig:
    lr: float = 1e-4
    num_downs: int = 6
    ngf: int = 64
    use_vgg: bool = True


class ImageTranslationState(struct.PyTreeNode):
    step: jax.Array
    variables: Any
    opt: Any


def init_image_translation_state(cfg: ImageTranslationConfig, rng,
                                 size: int = 256) -> ImageTranslationState:
    model = ResUnetGenerator(output_nc=3, num_downs=cfg.num_downs,
                             ngf=cfg.ngf)
    variables = model.init(rng, jnp.zeros((1, size, size, 6)))
    tx = optax.adam(cfg.lr)
    return ImageTranslationState(step=jnp.zeros((), jnp.int32),
                                 variables=variables,
                                 opt=tx.init(variables["params"]))


def build_image_translation_train_step(cfg: ImageTranslationConfig,
                                       vgg_variables=None):
    """train_step(state, image_in (N,H,W,6), image_out (N,H,W,3))."""
    model = ResUnetGenerator(output_nc=3, num_downs=cfg.num_downs,
                             ngf=cfg.ngf)
    tx = optax.adam(cfg.lr)

    def loss_fn(params, batch_stats, image_in, image_out):
        g_out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, image_in,
            train=True, mutable=["batch_stats"])
        l1 = jnp.mean(jnp.abs(g_out - image_out))
        if cfg.use_vgg and vgg_variables is not None:
            lv, ls = vgg_loss(vgg_variables, g_out, image_out, style=True)
        else:
            lv = ls = 0.0
        loss = l1 + lv + ls
        return loss, (updates["batch_stats"],
                      {"loss": loss, "l1": l1, "vgg": lv, "style": ls})

    def train_step(state, image_in, image_out):
        (_, (stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.variables["params"], state.variables["batch_stats"],
            image_in, image_out)
        updates, opt = tx.update(grads, state.opt,
                                 state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        return state.replace(
            step=state.step + 1,
            variables={"params": params, "batch_stats": stats},
            opt=opt), metrics

    return train_step
