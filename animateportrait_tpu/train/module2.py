"""Module2 GAN training: one jitted SPMD step with five discriminators.

Behavioral reimplementation of the reference training model
(`Module2/models/geomgm_ifw_fore_model.py`) re-designed TPU-first:

- The reference runs ~16 separate forward/backward passes per step with
  host round-trips and optional two-GPU tensor ping-pong; here the WHOLE
  step (G forward x2, all D passes, MODNet matte, FlowUnet intrinsic flow,
  MobileFaceNet geometry loss, Sphere20a FaceLoss, TPS warps, both Adam
  updates, and the coherence-D image pool) is ONE jitted computation.
- Data parallelism is plain SPMD: shard the batch dim over a
  `jax.sharding.Mesh` and jit — XLA inserts the gradient all-reduces.
- The CycleGAN image pool (`Module2/util/image_pool.py`) becomes a device
  buffer carried in the train state: slots fill until the pool is full,
  then each query swaps with probability 0.5 against a random slot.

Shipped drawing config (readme.md:65): netg_resb_div=3, disp=3,
output_nc=1, lr 5e-5, lambda_geom=50, lambda_geom_lipline=50,
more_weight_for_lip=2, lambda_face=3, lambda_warp_inter=10, blendbg=1,
niter=70, niter_decay=0.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animateportrait_tpu.models import gan as gan_lib
from animateportrait_tpu.models.gan import (
    NLayerDiscriminator, TridentGeneratorFullIFW, gan_loss)
from animateportrait_tpu.models.flowunet import FlowUnet, kp_to_map_binary
from animateportrait_tpu.models.modnet import MODNet
from animateportrait_tpu.models.perception import (
    MobileFaceNet, Sphere20a, face_loss)
from animateportrait_tpu.nn import interpolate_bilinear
from animateportrait_tpu.ops.tps import sparse_image_warp
from animateportrait_tpu.ops.warp import sample_bicubic


@dataclasses.dataclass(frozen=True)
class Module2Config:
    """Training flags mirroring the reference CLI (readme.md:65-67)."""

    crop_size: int = 256
    output_nc: int = 1           # 1 = drawing, 3 = cartoon
    ngf: int = 64
    ndf: int = 64
    n_layers_d: int = 3
    netg_resb_div: int = 3
    netg_resb_disp: int = 3
    lr: float = 5e-5
    beta1: float = 0.5
    niter: int = 70
    niter_decay: int = 0
    lr_policy: str = "linear"    # linear | step | plateau | cosine
    lr_decay_iters: int = 50     # StepLR step_size for lr_policy='step'
    init_type: str = "normal"    # normal | xavier | kaiming | orthogonal
    init_gain: float = 0.02
    # "bfloat16" runs every network forward/backward in bf16 (f32 master
    # params + optimizer + losses + TPS solves) — the TPU-native mixed
    # precision recipe. Default f32 matches the reference numerics.
    compute_dtype: str = "float32"
    # rematerialize the two generator forwards in the backward pass
    # (jax.checkpoint): trades one extra G forward for not keeping its
    # activations live across the ~16 discriminator passes — the HBM
    # lever for larger per-chip batches (grads are bit-identical).
    remat: bool = False
    # fold each discriminator's separate real/fake/fake2 forwards into
    # ONE pass with the inputs stacked along batch (15 PatchGAN passes
    # -> 5). Mathematically identical (convs and InstanceNorm are
    # per-sample); larger per-conv batches utilize the MXU better at
    # small N. Default False pending the perf measurement (PERF.md).
    batch_d_passes: bool = False
    steps_per_epoch: int = 1000
    pool_size: int = 50
    gan_mode: str = "lsgan"
    lambda_geom: float = 50.0
    lambda_geom_lipline: float = 50.0
    lambda_g_a_l: float = 0.5
    lambda_g_a_coh: float = 0.5
    lambda_face: float = 3.0
    lambda_warp: float = 5.0
    lambda_warp_inter: float = 10.0
    use_mask: bool = True
    use_eye_mask: bool = True
    use_lip_mask: bool = True
    mask_type: int = 3
    blendbg: int = 1
    coherent: int = 1            # 0 for the cartoon twin
    coh_use_more: int = 2
    check_fakeb2_in_backward_d: bool = True
    identity_loss: int = 2
    warp_loss: int = 2
    more_weight_for_lip: int = 2
    # FaceLoss backbone selection, dispatched like the reference on a
    # 'senet' substring in the checkpoint path (--face_recog_model,
    # geomgm_ifw_fore_model.py:185; networks.py:2862-2876): senet50 crops
    # heads to 224x224, sphere20a to 112x96.
    face_recog_model: str = "sphere20a"

    @property
    def use_senet(self) -> bool:
        return "senet" in self.face_recog_model

    @property
    def face_crop_hw(self) -> tuple:
        return (224, 224) if self.use_senet else (112, 96)


class FrozenNets(struct.PyTreeNode):
    """Frozen helper-net variables (replicated across the mesh)."""

    modnet: Any
    mobilefacenet: Any
    sphere: Any
    flowunet: Any


class TrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any               # dict: d_a, d_a_l, d_a_le, d_a_ll, d_a_coh
    g_opt: Any
    d_opt: Any
    pool: jax.Array             # (pool_size, H, W, 2*output_nc)
    pool_count: jax.Array


# --- geometry helpers -------------------------------------------------------


EDGE_ANCHORS_256 = np.array(
    [[0, 0], [255, 255], [0, 255], [255, 0],
     [0, 127], [127, 0], [127, 255], [255, 127]], np.float32)


def masked(a: jax.Array, mask: jax.Array, mask_type: int = 3) -> jax.Array:
    """base_model.masked (base_model.py:238-247), NHWC."""
    if mask_type == 0:
        return (a / 2 + 0.5) * mask * 2 - 1
    if mask_type == 1:
        return ((a / 2 + 0.5) * mask + 1 - mask) * 2 - 1
    if mask_type == 2:
        return jnp.concatenate([a, mask], axis=-1)
    m = ((a / 2 + 0.5) * mask + 1 - mask) * 2 - 1
    return jnp.concatenate([m, mask], axis=-1)


def extract_landmarks(mfn_vars, imgs, wins, crop_size: int = 256,
                      out_size: int = 112) -> jax.Array:
    """get_lm (geomgm_ifw_fore_model.py:391-415), batched.

    imgs NHWC in [-1,1] (1 or 3 channels); wins (N, 4) [x1, x2, y1, y2].
    Crops the window (ones padding outside the image), bicubic-resizes to
    112, swaps RGB->BGR, runs MobileFaceNet on [0,1], and reprojects the
    [0,1] landmarks back to window pixel coordinates.
    """
    N = imgs.shape[0]
    if imgs.shape[-1] == 1:
        imgs = jnp.repeat(imgs, 3, axis=-1)
    else:
        imgs = imgs[..., ::-1]  # RGB -> BGR (get_lm's channel swap)
    x1 = wins[:, 0].astype(jnp.float32)
    x2 = wins[:, 1].astype(jnp.float32)
    y1 = wins[:, 2].astype(jnp.float32)
    y2 = wins[:, 3].astype(jnp.float32)
    # bicubic sample grid over the box (torch half-pixel convention for the
    # box -> 112 resize)
    t = (jnp.arange(out_size) + 0.5) / out_size
    iy = y1[:, None, None] + t[None, :, None] * (y2 - y1)[:, None, None] - 0.5
    ix = x1[:, None, None] + t[None, None, :] * (x2 - x1)[:, None, None] - 0.5
    iy = jnp.broadcast_to(iy, (N, out_size, out_size))
    ix = jnp.broadcast_to(ix, (N, out_size, out_size))
    crop = sample_bicubic(imgs, iy, ix)
    # ones padding where the window leaves the image
    H, W = imgs.shape[1:3]
    inb = ((iy >= 0) & (iy <= H - 1) & (ix >= 0) & (ix <= W - 1))
    crop = jnp.where(inb[..., None], crop, 1.0)

    lm, _ = MobileFaceNet().apply(mfn_vars, (crop + 1.0) * 0.5)
    lm = lm.reshape(N, 68, 2)
    lx = lm[..., 0] * (x2 - x1)[:, None] + x1[:, None]
    ly = lm[..., 1] * (y2 - y1)[:, None] + y1[:, None]
    return jnp.stack([lx, ly], axis=-1)


def lipline_mask(lm68: jax.Array, edges: np.ndarray, size: int = 256,
                 thickness: float = 2.0) -> jax.Array:
    """getlipline (geomgm_ifw_fore_model.py:507-515) without cv2: rasterize
    the 20 lip edges as distance-to-segment <= thickness/2. lm68 (N,68,2)."""
    N = lm68.shape[0]
    p0 = lm68[:, edges[:, 0], :]  # (N, E, 2)
    p1 = lm68[:, edges[:, 1], :]
    gy, gx = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32), indexing="ij")
    g = jnp.stack([gx, gy], axis=-1).reshape(1, size * size, 1, 2)
    a = p0[:, None, :, :]
    d = p1[:, None, :, :] - a
    t = jnp.clip(jnp.sum((g - a) * d, -1)
                 / jnp.maximum(jnp.sum(d * d, -1), 1e-6), 0.0, 1.0)
    proj = a + t[..., None] * d
    dist2 = jnp.sum(jnp.square(g - proj), -1)
    hit = jnp.any(dist2 <= (thickness / 2.0) ** 2, axis=-1)
    return hit.reshape(N, size, size, 1).astype(jnp.float32)


def _with_edges(lm68: jax.Array) -> jax.Array:
    """Append the 8 fixed border anchors (geomgm_ifw_fore_model.py:379-381)."""
    N = lm68.shape[0]
    e = jnp.broadcast_to(jnp.asarray(EDGE_ANCHORS_256)[None], (N, 8, 2))
    return jnp.concatenate([lm68, e], axis=1)


def flow_warp_fields(flow_vars, lm1, lm2, size: int = 256,
                     dtype=jnp.float32):
    """flow_network_warp (geomgm_ifw_fore_model.py:69-83) on-device: 68-pt
    landmarks (N,68,2) in crop_size space -> (flow (N,256,256,2),
    mask (N,256,256,1))."""
    j1 = kp_to_map_binary((224, 224), lm1[:, :68] * (7.0 / 8.0))
    j2 = kp_to_map_binary((224, 224), lm2[:, :68] * (7.0 / 8.0))
    inp = jnp.concatenate([j1, j2], axis=-1).astype(dtype)
    flow_out, vis_out, _, _ = FlowUnet().apply(flow_vars, inp)
    flow_out = flow_out.astype(jnp.float32)
    vis_out = vis_out.astype(jnp.float32)
    vis = jnp.argmax(vis_out, axis=-1, keepdims=True)
    mask = (vis < 2).astype(jnp.float32)
    flow = flow_out * 20.0 * mask
    warp_flow = interpolate_bilinear(flow * (8.0 / 7.0), (size, size),
                                     align_corners=True)
    res_mask = interpolate_bilinear(mask, (size, size), align_corners=True)
    return warp_flow, res_mask


def pool_query(pool, count, imgs, rng):
    """Image pool (util/image_pool.py:23-54) as pure state: returns
    (new_pool, new_count, out_imgs). Batched variant of the reference's
    per-image loop; slot collisions within a batch are resolved by later
    writes winning."""
    B = imgs.shape[0]
    psize = pool.shape[0]
    k1, k2 = jax.random.split(rng)
    # history may only be returned once the pool was full BEFORE this
    # query (the reference pool never returns an unfilled slot,
    # image_pool.py:33-49)
    use_hist = (jax.random.uniform(k1, (B,)) > 0.5) & (count >= psize)
    slots = jax.random.randint(k2, (B,), 0, psize)
    idx = jnp.arange(B)
    fill_slot = jnp.clip(count + idx, 0, psize - 1)
    is_fill = (count + idx) < psize
    write_slot = jnp.where(is_fill, fill_slot, slots)
    do_write = is_fill | use_hist
    out = jnp.where(
        (~is_fill & use_hist)[:, None, None, None],
        pool[slots], imgs)
    new_pool = pool.at[jnp.where(do_write, write_slot, psize)].set(
        jnp.where(do_write[:, None, None, None], imgs, 0.0),
        mode="drop")
    new_count = jnp.minimum(count + jnp.sum(is_fill), psize)
    return new_pool, new_count, out


# --- the train step ---------------------------------------------------------


def init_state(cfg: Module2Config, rng, example_batch) -> TrainState:
    """Initialize G/D params ('normal' 0.02 init as the reference) and Adam
    states."""
    g = TridentGeneratorFullIFW(
        output_nc=cfg.output_nc, ngf=cfg.ngf,
        div=cfg.netg_resb_div, disp=cfg.netg_resb_disp)
    b = example_batch
    kg, kd = jax.random.split(rng)
    g_vars = g.init(kg, b["real_A"], b["A_lm"], b["tB_lm"],
                    b["warp_motion"], jnp.zeros_like(b["warp_motion"]),
                    jnp.zeros(b["real_A"].shape[:3] + (1,)))
    g_params = gan_lib.init_weights(g_vars["params"], cfg.init_type,
                                    np.random.default_rng(0), cfg.init_gain)

    nc = cfg.output_nc
    local_nc = nc + 1 if cfg.mask_type in (2, 3) else nc
    d_specs = {"d_a": nc, "d_a_l": local_nc, "d_a_le": local_nc,
               "d_a_ll": local_nc, "d_a_coh": nc * 2}
    d_params = {}
    keys = jax.random.split(kd, len(d_specs))
    H = cfg.crop_size
    for k, (name, in_nc) in zip(keys, d_specs.items()):
        if name == "d_a_coh" and not cfg.coherent:
            continue
        dv = NLayerDiscriminator(ndf=cfg.ndf, n_layers=cfg.n_layers_d).init(
            k, jnp.zeros((1, H, H, in_nc)))
        d_params[name] = gan_lib.init_weights(
            dv["params"], cfg.init_type, np.random.default_rng(1),
            cfg.init_gain)

    g_tx = make_optimizer(cfg)
    d_tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        pool=jnp.zeros((cfg.pool_size, H, H, nc), jnp.float32),
        pool_count=jnp.zeros((), jnp.int32),
    )


def make_optimizer(cfg: Module2Config) -> optax.GradientTransformation:
    """Adam + the reference's lr policies (get_scheduler, networks.py:42-68):
    'linear' (constant for niter epochs, then linear decay over niter_decay),
    'step' (StepLR gamma 0.1 every lr_decay_iters epochs), 'plateau'
    (ReduceLROnPlateau factor .2 patience 5 — Module2 always steps it with
    metric=0 (base_model.py:117-126), so it degenerates to a deterministic
    x0.2 every 6 epochs after the first; reproduced exactly), and 'cosine'
    (CosineAnnealingLR T_max=niter, eta_min=0)."""
    def schedule(step):
        epoch = step // cfg.steps_per_epoch  # 0-based
        if cfg.lr_policy == "step":
            return cfg.lr * jnp.power(0.1, epoch // cfg.lr_decay_iters)
        if cfg.lr_policy == "plateau":
            return cfg.lr * jnp.power(0.2, jnp.maximum(0, epoch - 1) // 6)
        if cfg.lr_policy == "cosine":
            return cfg.lr * 0.5 * (
                1.0 + jnp.cos(jnp.pi * epoch / max(cfg.niter, 1)))
        decay = jnp.maximum(0, epoch + 1 - cfg.niter) / max(
            cfg.niter_decay + 1, 1)
        return cfg.lr * jnp.clip(1.0 - decay, 0.0, 1.0)

    return optax.chain(
        optax.scale_by_adam(b1=cfg.beta1, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def build_train_step(cfg: Module2Config):
    """Returns train_step(state, batch, frozen, rng) -> (state, metrics).

    Batch (all NHWC float32, landmarks in crop_size pixel space):
      real_A (N,256,256,3), real_B (N,256,256,nc), A_lm/tB_lm/tB2_lm
      (N,256,256,1) landmark images, A_lm_68/tB_lm_68/tB2_lm_68 (N,68,2),
      warp_motion/warp_motion2 (N,256,256,2) normalized grids,
      fakeB_static (N,256,256,nc), winA/winB/winB2 (N,4),
      B_mask/B2_mask/Br_mask (+ _e, _l variants) (N,256,256,1),
      B1/B2_img/B3/B4 (N,256,256,nc) film frames for the coherence D.
    """
    g_model = TridentGeneratorFullIFW(
        output_nc=cfg.output_nc, ngf=cfg.ngf,
        div=cfg.netg_resb_div, disp=cfg.netg_resb_disp)
    d_model = NLayerDiscriminator(ndf=cfg.ndf, n_layers=cfg.n_layers_d)
    g_tx = make_optimizer(cfg)
    d_tx = make_optimizer(cfg)
    lip_edges = None  # loaded lazily from assets

    from animateportrait_tpu.utils.assets import face_lmark_lookup
    lip_edges = face_lmark_lookup()[:20]

    cdt = jnp.dtype(cfg.compute_dtype)

    def _cast(tree):
        """f32 -> compute dtype (params and activations); no-op for f32."""
        if cdt == jnp.float32:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def d_apply(params, x):
        return d_model.apply({"params": _cast(params)},
                             _cast(x)).astype(jnp.float32)

    def crit(pred, real):
        return gan_loss(pred, real, cfg.gan_mode)

    def forward_shared(batch, frozen):
        """Everything upstream of G that carries no G/D gradients."""
        real_A = batch["real_A"]
        _, _, matte = MODNet().apply(_cast(frozen.modnet), _cast(real_A))
        matte = matte.astype(jnp.float32)
        mask = (matte > 0.5).astype(jnp.float32)
        real_A_fore = ((real_A / 2 + 0.5) * mask + 1 - mask) * 2 - 1
        if not cfg.blendbg:
            real_A = real_A_fore
            fakeB_static = ((batch["fakeB_static"] / 2 + 0.5) * mask
                            + 1 - mask) * 2 - 1
        else:
            fakeB_static = batch["fakeB_static"]

        iw_flow, if_mask = flow_warp_fields(
            _cast(frozen.flowunet), batch["A_lm_68"], batch["tB_lm_68"],
            cfg.crop_size, dtype=cdt)
        iw_flow2, if_mask2 = flow_warp_fields(
            _cast(frozen.flowunet), batch["A_lm_68"], batch["tB2_lm_68"],
            cfg.crop_size, dtype=cdt)

        # control points for the TPS warps: with blendbg the reference sets
        # real_A_lm_681 = the bare 68 landmarks (geomgm_ifw_fore_model.py
        # forward, blendbg block) and the warp_loss==2 block then skips
        # appending the 8 edge anchors (`if not hasattr(...)`); edges are
        # only used when blendbg is off
        if cfg.blendbg:
            a_681 = batch["A_lm_68"]
            tb_681 = batch["tB_lm_68"]
            tb2_681 = batch["tB2_lm_68"]
        else:
            a_681 = _with_edges(batch["A_lm_68"])
            tb_681 = _with_edges(batch["tB_lm_68"])
            tb2_681 = _with_edges(batch["tB2_lm_68"])
        # warp grids: taken from the batch when precomputed, else derived
        # on device from the landmarks (replacing the reference's per-item
        # host-side scipy griddata, umlvd_ifw_dataset.py:409-425)
        if "warp_motion" in batch:
            warp_motion = batch["warp_motion"]
            warp_motion2 = batch["warp_motion2"]
        elif "tri_motion" in batch:
            # exact griddata-linear grids: the data pipeline ships each
            # item's host-computed Delaunay simplices; the dense
            # barycentric evaluation stays on device
            from animateportrait_tpu.ops.tps import linear_motion_grid

            warp_motion = linear_motion_grid(
                batch["A_lm_68"][:, :68], batch["tB_lm_68"][:, :68],
                batch["tri_motion"], cfg.crop_size)
            warp_motion2 = linear_motion_grid(
                batch["A_lm_68"][:, :68], batch["tB2_lm_68"][:, :68],
                batch["tri_motion2"], cfg.crop_size)
        else:
            from animateportrait_tpu.ops.tps import (
                motion_grid_from_landmarks)

            warp_motion = motion_grid_from_landmarks(
                batch["A_lm_68"][:, :68], batch["tB_lm_68"][:, :68],
                cfg.crop_size)
            warp_motion2 = motion_grid_from_landmarks(
                batch["A_lm_68"][:, :68], batch["tB2_lm_68"][:, :68],
                cfg.crop_size)
        if cfg.blendbg:
            mask1 = sparse_image_warp(
                mask, a_681[:, :, ::-1], tb_681[:, :, ::-1])[0]
            mask2 = sparse_image_warp(
                mask, a_681[:, :, ::-1], tb2_681[:, :, ::-1])[0]
        else:
            mask1 = mask2 = None
        fakeB_static_warp = None
        if cfg.warp_loss == 2:
            fakeB_static_warp = sparse_image_warp(
                fakeB_static, a_681[:, :, ::-1], tb_681[:, :, ::-1])[0]
        elif cfg.warp_loss == 1:
            # warp_loss==1: the dataset precomputes the warped static
            # drawing (geomgm_ifw_fore_model.py:474-475)
            fakeB_static_warp = batch["fakeB_static_warp"]
        return dict(real_A_fore=real_A_fore, fakeB_static=fakeB_static,
                    iw_flow=iw_flow, if_mask=if_mask, iw_flow2=iw_flow2,
                    if_mask2=if_mask2, mask1=mask1, mask2=mask2,
                    warp_motion=warp_motion, warp_motion2=warp_motion2,
                    fakeB_static_warp=fakeB_static_warp)

    def _g_apply(gp, img, l1, l2, motion, flow, ifmask):
        return g_model.apply({"params": gp}, img, l1, l2, motion, flow,
                             ifmask).astype(jnp.float32)

    if cfg.remat:
        _g_apply = jax.checkpoint(_g_apply)

    def g_forward(g_params, batch, shared):
        gp = _cast(g_params)
        # motion grids / flows stay f32: the generator's warp index math
        # runs f32 regardless (a bf16 grid quantizes to ~half a pixel at
        # 256), so casting them would only round-trip-lose precision
        fake_B = _g_apply(
            gp, _cast(shared["real_A_fore"]),
            _cast(batch["A_lm"]), _cast(batch["tB_lm"]),
            shared["warp_motion"], shared["iw_flow"],
            shared["if_mask"])
        fake_B2 = _g_apply(
            gp, _cast(shared["real_A_fore"]),
            _cast(batch["A_lm"]), _cast(batch["tB2_lm"]),
            shared["warp_motion2"], shared["iw_flow2"],
            shared["if_mask2"])
        if cfg.blendbg:
            fb = shared["fakeB_static"]
            fake_B = ((fake_B / 2 + 0.5) * shared["mask1"]
                      + (fb / 2 + 0.5) * (1 - shared["mask1"])) * 2 - 1
            fake_B2 = ((fake_B2 / 2 + 0.5) * shared["mask2"]
                       + (fb / 2 + 0.5) * (1 - shared["mask2"])) * 2 - 1
        return fake_B, fake_B2

    def d_apply_stacked(dparams, xs, reals):
        """One D pass over len(xs) inputs stacked along batch
        (batch_d_passes), or len(xs) separate passes. Returns the list
        of per-input GAN losses — identical math either way (the D is
        per-sample: convs + InstanceNorm)."""
        if cfg.batch_d_passes and len(xs) > 1:
            n = xs[0].shape[0]
            p = d_apply(dparams, jnp.concatenate(xs, axis=0))
            return [crit(p[i * n:(i + 1) * n], r)
                    for i, r in enumerate(reals)]
        return [crit(d_apply(dparams, x), r) for x, r in zip(xs, reals)]

    def g_loss_fn(g_params, d_params, batch, shared, frozen):
        fake_B, fake_B2 = g_forward(g_params, batch, shared)
        cs = float(cfg.crop_size)
        losses = {}
        la, la2 = d_apply_stacked(d_params["d_a"], [fake_B, fake_B2],
                                  [True, True])
        loss = la + la2
        losses["G_A"] = loss

        locals_ = []
        if cfg.use_mask:
            locals_.append(("d_a_l", "B_mask", "B2_mask"))
        if cfg.use_eye_mask:
            locals_.append(("d_a_le", "B_maske", "B2_maske"))
        if cfg.use_lip_mask:
            locals_.append(("d_a_ll", "B_maskl", "B2_maskl"))
        for dname, m1, m2 in locals_:
            fl = masked(fake_B, batch[m1], cfg.mask_type)
            f2 = masked(fake_B2, batch[m2], cfg.mask_type)
            l1_, l2_ = d_apply_stacked(d_params[dname], [fl, f2],
                                       [True, True])
            l_local = (l1_ + l2_) * cfg.lambda_g_a_l
            losses[f"G_{dname}"] = l_local
            loss += l_local

        if cfg.coherent:
            l_coh = crit(d_apply(
                d_params["d_a_coh"],
                jnp.concatenate([fake_B, fake_B2], axis=-1)), True
            ) * cfg.lambda_g_a_coh
            losses["G_A_coh"] = l_coh
            loss += l_coh

        # geometry loss via frozen MobileFaceNet
        fb_lm = extract_landmarks(_cast(frozen.mobilefacenet),
                                  _cast(fake_B), batch["winB"],
                                  cfg.crop_size).astype(jnp.float32)
        fb2_lm = extract_landmarks(_cast(frozen.mobilefacenet),
                                   _cast(fake_B2), batch["winB2"],
                                   cfg.crop_size).astype(jnp.float32)
        tb = batch["tB_lm_68"][:, :68]
        tb2 = batch["tB2_lm_68"][:, :68]
        if cfg.more_weight_for_lip == 2:
            def mse(a, b):
                return jnp.mean(jnp.square(a / cs - b / cs))
            l_geom = (mse(fb_lm[:, :48], tb[:, :48]) * cfg.lambda_geom
                      + mse(fb_lm[:, 48:68], tb[:, 48:68])
                      * cfg.lambda_geom * 2
                      + mse(fb2_lm[:, :48], tb2[:, :48]) * cfg.lambda_geom
                      + mse(fb2_lm[:, 48:68], tb2[:, 48:68])
                      * cfg.lambda_geom * 2)
        else:
            l_geom = (jnp.mean(jnp.square(fb_lm / cs - tb / cs))
                      + jnp.mean(jnp.square(fb2_lm / cs - tb2 / cs))
                      ) * cfg.lambda_geom
        losses["geom_B"] = l_geom
        loss += l_geom

        if cfg.lambda_geom_lipline > 0:
            m1 = lipline_mask(tb, lip_edges, cfg.crop_size)
            m2 = lipline_mask(tb2, lip_edges, cfg.crop_size)
            l_lip = (jnp.mean((fake_B - (-1.0)) * m1)
                     + jnp.mean((fake_B2 - (-1.0)) * m2)
                     ) * cfg.lambda_geom_lipline
            losses["geom_B_lipline"] = l_lip
            loss += l_lip

        if cfg.warp_loss:
            l_warp = jnp.mean(jnp.abs(
                fake_B - shared["fakeB_static_warp"])) * cfg.lambda_warp
            losses["warp_B"] = l_warp
            loss += l_warp

        # inter-frame coherence: fake_B2 vs TPS-warped (detached) fake_B
        fb_warp = sparse_image_warp(
            fake_B, tb[:, :, ::-1], tb2[:, :, ::-1])[0]
        l_inter = jnp.mean(jnp.abs(
            fake_B2 - jax.lax.stop_gradient(fb_warp))
        ) * cfg.lambda_warp_inter
        losses["warp_inter1"] = l_inter
        loss += l_inter

        if cfg.identity_loss == 2:
            def rep3(x):
                return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x
            from animateportrait_tpu.models.perception import crop_head_bbox
            f_crop = crop_head_bbox(rep3(fake_B), batch["winB"],
                                    out_hw=cfg.face_crop_hw)
            s_crop = crop_head_bbox(rep3(shared["fakeB_static"]),
                                    batch["winA"], out_hw=cfg.face_crop_hw)
            if cfg.use_senet:
                from animateportrait_tpu.models.perception import SENet50
                face_net_apply = (lambda v, x: SENet50().apply(
                    v, x.astype(cdt)))
            else:
                face_net_apply = (lambda v, x: Sphere20a().apply(
                    v, x.astype(cdt)))
            l_iden = face_loss(
                face_net_apply,
                _cast(frozen.sphere), f_crop,
                s_crop).astype(jnp.float32) * cfg.lambda_face
            losses["iden_B"] = l_iden
            loss += l_iden

        losses["G"] = loss
        return loss, (fake_B, fake_B2, losses)

    def d_loss_fn(d_params, batch, fake_B, fake_B2, pooled_B, pooled_B2):
        loss = 0.0
        losses = {}

        def basic3(dname, real, f1, f2):
            if cfg.check_fakeb2_in_backward_d:
                lr_, lf1, lf2 = d_apply_stacked(
                    d_params[dname], [real, f1, f2], [True, False, False])
                return (lr_ + (lf1 + lf2) / 2.0) / 2.0
            lr_, lf1 = d_apply_stacked(
                d_params[dname], [real, f1], [True, False])
            return (lr_ + lf1) * 0.5

        l = basic3("d_a", batch["real_B"], fake_B, fake_B2)
        losses["D_A"] = l
        loss += l
        locals_ = []
        if cfg.use_mask:
            locals_.append(("d_a_l", "Br_mask", "B_mask", "B2_mask"))
        if cfg.use_eye_mask:
            locals_.append(("d_a_le", "Br_maske", "B_maske", "B2_maske"))
        if cfg.use_lip_mask:
            locals_.append(("d_a_ll", "Br_maskl", "B_maskl", "B2_maskl"))
        for dname, mr, m1, m2 in locals_:
            l = basic3(dname,
                       masked(batch["real_B"], batch[mr], cfg.mask_type),
                       masked(fake_B, batch[m1], cfg.mask_type),
                       masked(fake_B2, batch[m2], cfg.mask_type))
            losses[f"D_{dname}"] = l
            loss += l

        if cfg.coherent:
            real_pair = jnp.concatenate(
                [batch["B1_img"], batch["B2_img"]], axis=-1)
            fake_pair = jnp.concatenate([pooled_B, pooled_B2], axis=-1)
            if cfg.coh_use_more:
                extra_pair = jnp.concatenate(
                    [batch["B3"], batch["B4"]], axis=-1)
                lr_, lf, lf2 = d_apply_stacked(
                    d_params["d_a_coh"], [real_pair, fake_pair,
                                          extra_pair],
                    [True, False, False])
                l = (lr_ + lf + lf2) / 3.0
            else:
                lr_, lf = d_apply_stacked(
                    d_params["d_a_coh"], [real_pair, fake_pair],
                    [True, False])
                l = (lr_ + lf) * 0.5
            losses["D_A_coh"] = l
            loss += l
        return loss, losses

    def compute_grads(state: TrainState, batch, frozen: FrozenNets, rng):
        """The G-then-D gradient pass shared by train_step; exposed (as
        ``train_step.grads_fn``) so sharding-equivalence tests can compare
        raw gradients across device layouts, where tolerances are
        meaningful, before Adam's sign-normalization amplifies
        reduction-order noise on near-zero-gradient elements."""
        shared = forward_shared(batch, frozen)

        (_, (fake_B, fake_B2, g_losses)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, batch, shared, frozen)

        fake_B = jax.lax.stop_gradient(fake_B)
        fake_B2 = jax.lax.stop_gradient(fake_B2)
        k1, k2 = jax.random.split(rng)
        pool, count, pooled_B = pool_query(
            state.pool, state.pool_count, fake_B, k1)
        pool, count, pooled_B2 = pool_query(pool, count, fake_B2, k2)

        (_, d_losses), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
            state.d_params, batch, fake_B, fake_B2, pooled_B, pooled_B2)
        metrics = {**g_losses, **d_losses}
        return g_grads, d_grads, pool, count, metrics

    def train_step(state: TrainState, batch, frozen: FrozenNets, rng):
        g_grads, d_grads, pool, count, metrics = compute_grads(
            state, batch, frozen, rng)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params, d_params=d_params,
            g_opt=g_opt, d_opt=d_opt, pool=pool, pool_count=count)
        return new_state, metrics

    def visuals_fn(state: TrainState, batch, frozen: FrozenNets):
        """Dashboard snapshot (no gradients): current-G images plus the
        MobileFaceNet-detected landmarks of the fakes for the
        detected-vs-target overlay self-check images
        (`fake_B_lm_68_vis`/`_vist`, geomgm_ifw_fore_model.py:722-731).

        Returns (visual images dict, aux dict with fb_lm/fb2_lm detected
        landmarks and the target landmark sets + face windows).
        """
        shared = forward_shared(batch, frozen)
        fake_B, fake_B2 = g_forward(state.g_params, batch, shared)
        fb_lm = extract_landmarks(
            _cast(frozen.mobilefacenet), _cast(fake_B), batch["winB"],
            cfg.crop_size).astype(jnp.float32)
        fb2_lm = extract_landmarks(
            _cast(frozen.mobilefacenet), _cast(fake_B2), batch["winB2"],
            cfg.crop_size).astype(jnp.float32)
        visuals = dict(
            real_A=batch["real_A"], real_B=batch["real_B"],
            A_lm=batch["A_lm"], tB_lm=batch["tB_lm"],
            fakeB_static=shared["fakeB_static"],
            fake_B=fake_B, fake_B2=fake_B2)
        aux = dict(fb_lm=fb_lm, fb2_lm=fb2_lm,
                   tb_lm=batch["tB_lm_68"][:, :68],
                   tb2_lm=batch["tB2_lm_68"][:, :68],
                   winB=batch["winB"], winB2=batch["winB2"])
        return visuals, aux

    train_step.visuals_fn = visuals_fn
    train_step.grads_fn = compute_grads
    return train_step


def make_example_batch(cfg: Module2Config, batch_size: int = 1,
                       size: int | None = None) -> dict:
    """Zeros batch with the right shapes (for init / dry runs)."""
    H = size or cfg.crop_size
    nc = cfg.output_nc
    z = functools.partial(jnp.zeros, dtype=jnp.float32)
    # non-degenerate landmark geometry (collinear points would make the
    # TPS solves singular): a circle around the image center
    theta = np.linspace(0.0, 2 * np.pi, 68, endpoint=False)
    lm_np = np.stack([H / 2 + H / 4 * np.cos(theta),
                      H / 2 + H / 4 * np.sin(theta)],
                     axis=-1).astype(np.float32)
    lm = jnp.tile(jnp.asarray(lm_np)[None], (batch_size, 1, 1))
    return {
        "real_A": z((batch_size, H, H, 3)),
        "real_B": z((batch_size, H, H, nc)),
        "A_lm": z((batch_size, H, H, 1)),
        "tB_lm": z((batch_size, H, H, 1)),
        "tB2_lm": z((batch_size, H, H, 1)),
        "A_lm_68": lm, "tB_lm_68": lm + 1.0, "tB2_lm_68": lm + 2.0,
        "warp_motion": z((batch_size, H, H, 2)),
        "warp_motion2": z((batch_size, H, H, 2)),
        "fakeB_static": z((batch_size, H, H, nc)),
        "winA": jnp.tile(jnp.asarray([[40, H - 40, 40, H - 40]],
                                     jnp.int32), (batch_size, 1)),
        "winB": jnp.tile(jnp.asarray([[40, H - 40, 40, H - 40]],
                                     jnp.int32), (batch_size, 1)),
        "winB2": jnp.tile(jnp.asarray([[40, H - 40, 40, H - 40]],
                                      jnp.int32), (batch_size, 1)),
        "B_mask": z((batch_size, H, H, 1)),
        "B2_mask": z((batch_size, H, H, 1)),
        "Br_mask": z((batch_size, H, H, 1)),
        "B_maske": z((batch_size, H, H, 1)),
        "B2_maske": z((batch_size, H, H, 1)),
        "Br_maske": z((batch_size, H, H, 1)),
        "B_maskl": z((batch_size, H, H, 1)),
        "B2_maskl": z((batch_size, H, H, 1)),
        "Br_maskl": z((batch_size, H, H, 1)),
        "B1_img": z((batch_size, H, H, nc)),
        "B2_img": z((batch_size, H, H, nc)),
        "B3": z((batch_size, H, H, nc)),
        "B4": z((batch_size, H, H, nc)),
    }


def init_frozen_random(rng, crop_size: int = 256,
                       face_recog_model: str = "sphere20a") -> FrozenNets:
    """Randomly initialized frozen nets (tests / dry runs; real use loads
    converted reference checkpoints)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    modnet = MODNet().init(k1, jnp.zeros((1, crop_size, crop_size, 3)))
    mfn = MobileFaceNet().init(k2, jnp.zeros((1, 112, 112, 3)))
    if "senet" in face_recog_model:
        from animateportrait_tpu.models.perception import SENet50
        sphere = SENet50().init(k3, jnp.zeros((1, 224, 224, 3)))
    else:
        sphere = Sphere20a().init(k3, jnp.zeros((1, 112, 96, 3)))
    flow = FlowUnet().init(k4, jnp.zeros((1, 224, 224, 136)))
    return FrozenNets(modnet=modnet, mobilefacenet=mfn, sphere=sphere,
                      flowunet=flow)


def fsdp_param_shardings(params, mesh, axis: str = "data",
                         min_size: int = 2 ** 16):
    """FSDP-style NamedShardings: shard each large parameter's largest
    axis divisible by the mesh size across `axis`; small leaves replicate.

    The reference has no model parallelism (SURVEY.md §2.14) — this is
    TPU-native headroom: with parameters sharded, XLA inserts all-gathers
    on use and reduce-scatters on the gradients.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]

    def spec_for(x):
        if x.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % n == 0 and dims[i] >= n:
                spec = [None] * len(dims)
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def shard_state_fsdp(state: TrainState, mesh, axis: str = "data",
                     min_size: int = 2 ** 16) -> TrainState:
    """Apply FSDP shardings to G/D params and their Adam moments; the pool
    and step stay replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put_tree(tree, shardings):
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    g_sh = fsdp_param_shardings(state.g_params, mesh, axis, min_size)
    d_sh = fsdp_param_shardings(state.d_params, mesh, axis, min_size)

    def shard_opt(opt_state, shardings):
        # Adam state mirrors the param tree inside ScaleByAdamState
        new = []
        for part in opt_state:
            if hasattr(part, "mu"):
                part = part._replace(
                    mu=put_tree(part.mu, shardings),
                    nu=put_tree(part.nu, shardings),
                    count=jax.device_put(part.count, repl))
                new.append(part)
            else:
                new.append(jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, repl), part))
        return tuple(new)

    return state.replace(
        g_params=put_tree(state.g_params, g_sh),
        d_params=put_tree(state.d_params, d_sh),
        g_opt=shard_opt(state.g_opt, g_sh),
        d_opt=shard_opt(state.d_opt, d_sh),
        pool=jax.device_put(state.pool, repl),
        pool_count=jax.device_put(state.pool_count, repl),
        step=jax.device_put(state.step, repl),
    )


def state_shardings(state: TrainState):
    """The NamedSharding tree of a placed state (for jit out_shardings so
    updated params keep their FSDP layout instead of being re-replicated)."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)
