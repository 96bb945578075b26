"""Landmark rasterization + the Module2 inference renderer.

Replaces `Module2/test.py` + `GeomCGTIFWTestModel` + `UMLVDFWTestDataset`
(`Module2/models/geomcgt_ifw_test_model.py`, `Module2/data/
umlvdfw_test_dataset.py`) with an in-memory, frame-batched pipeline:

- landmark images are rasterized with cv2 exactly like the reference's
  ``draw2`` (dots / dots+edges / colored polygons);
- the per-frame scipy-griddata warp grid (the reference's dominant CPU
  cost) is computed by a host Delaunay + batched on-device barycentric
  evaluation that reproduces griddata-linear EXACTLY
  (`ops.tps.linear_motion_grid`, the default ``motion_mode="linear"``);
  the fully-on-device polyharmonic-spline substitution
  (`ops.tps.motion_grid_from_landmarks`) remains as opt-in
  ``motion_mode="tps"`` — no host in the loop, sub-px mean deviation;
- MODNet matting + static stylization run ONCE for the source photo;
- per frame the jitted step computes intrinsic flow, the trident generator
  forward, and fg/bg matte blending, batched over frames.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from animateportrait_tpu.models.flowunet import (
    FlowUnet, kp_to_map_binary)
from animateportrait_tpu.models.gan import (
    ResnetStyle2Generator, TridentGeneratorFullIFW)
from animateportrait_tpu.models.modnet import MODNet
from animateportrait_tpu.models.photo2cartoon import Photo2CartoonGenerator
from animateportrait_tpu.nn import interpolate_bilinear
from animateportrait_tpu.ops.tps import motion_grid_from_landmarks
from animateportrait_tpu.ops.warp import grid_sample
from animateportrait_tpu.utils.assets import face_lmark_lookup

_POLY_LOOPS = [
    list(range(17)) + [26, 25, 24, 23, 22, 21, 20, 19, 18, 17],
    [21, 20, 19, 18, 17], [26, 25, 24, 23, 22],
    [39, 38, 37, 36, 41, 40], [45, 44, 43, 42, 47, 46],
    [35, 27, 31, 32, 33, 34],
    [54, 53, 52, 51, 50, 49, 48, 60, 61, 62, 63, 64],
    [54, 64, 65, 66, 67, 60, 48, 59, 58, 57, 56, 55],
    [64, 63, 62, 61, 60, 67, 66, 65],
]
_POLY_COLORS = ["pink", "blue", "green", "purple", "cyan", "brown",
                "orange", "yellow", "magenta"]


def draw_landmarks(height: int, width: int, lands: np.ndarray,
                   radius: int = 3, thickness: int = 2,
                   op: int = 0) -> np.ndarray:
    """Reference ``draw2`` (umlvdfw_test_dataset.py:34-65).

    Returns (H, W, 1) float in [-1, 1] for op 0/1, (H, W, 3) for op 2.
    """
    import cv2

    lands = np.round(np.asarray(lands)).astype(int)
    if op in (0, 1):
        frame = np.zeros((height, width), np.uint8)
        for (x, y) in lands:
            cv2.circle(frame, (int(x), int(y)), radius, 255, -1)
        if op == 1:
            for a, b in face_lmark_lookup():
                cv2.line(frame, (int(lands[a, 0]), int(lands[a, 1])),
                         (int(lands[b, 0]), int(lands[b, 1])), 255,
                         thickness)
        return (frame[..., None].astype(np.float32) / 255.0) * 2 - 1
    if op == 2:
        from PIL import Image, ImageDraw

        img = Image.new("RGB", (width, height), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        for loop, color in zip(_POLY_LOOPS, _POLY_COLORS):
            pts = [(int(lands[i][0]), int(lands[i][1])) for i in loop]
            draw.polygon(pts, fill=color, outline="black")
        return (np.asarray(img, np.float32) / 255.0) * 2 - 1
    raise ValueError(f"op {op}")


_DISC_HW_CACHE: dict[int, np.ndarray] = {}


def _cv2_disc_halfwidths(radius: int = 3) -> np.ndarray:
    """Per-row half-widths of cv2's filled-circle rasterization (so the
    on-device rasterizer reproduces cv2.circle exactly, row by row)."""
    if radius not in _DISC_HW_CACHE:
        import cv2

        c = radius + 3
        img = np.zeros((2 * c + 1, 2 * c + 1), np.uint8)
        cv2.circle(img, (c, c), radius, 255, -1)
        hw = []
        for dy in range(-radius, radius + 1):
            xs = np.where(img[c + dy] > 0)[0]
            hw.append(int(xs.max() - c) if len(xs) else -1)
        _DISC_HW_CACHE[radius] = np.asarray(hw, np.int32)
    return _DISC_HW_CACHE[radius]


def landmark_dot_images(lm68: jax.Array, size: int,
                        radius: int = 3) -> jax.Array:
    """On-device rasterization of the draw2 op=0 dot images
    (umlvdfw_test_dataset.py:34-48): cv2.circle-exact via the measured
    per-row disc half-widths.

    The union-of-discs mask is built as 7 batched (H,68)x(68,W) matmuls —
    one per disc row offset dy: pixel (y,x) is inside landmark k's disc
    iff y == round(yk)+dy and |x - round(xk)| <= halfwidth(dy) — which
    keeps the whole rasterization on the MXU instead of shipping
    half-megabyte images through host->device transfer per frame batch.

    lm68: (B, 68, 2) float (x, y); returns (B, size, size, 1) in [-1, 1].
    """
    hw = _cv2_disc_halfwidths(radius)
    lm = jnp.round(lm68).astype(jnp.int32)  # np.round-then-int like draw2
    xs = jnp.arange(size, dtype=jnp.int32)
    acc = None
    for i, dy in enumerate(range(-radius, radius + 1)):
        if hw[i] < 0:
            continue
        rowhit = (xs[None, :, None]
                  == (lm[:, None, :, 1] + dy)).astype(jnp.float32)
        colhit = (jnp.abs(xs[None, :, None] - lm[:, None, :, 0])
                  <= int(hw[i])).astype(jnp.float32)
        # (B, H, 68) @ (B, 68, W) -> per-dy coverage counts
        m = jnp.einsum("bhk,bwk->bhw", rowhit, colhit)
        acc = m if acc is None else acc + m
    frame = (acc > 0).astype(jnp.float32)[..., None]
    return frame * 2.0 - 1.0


def test_window(load_size: int = 256, rx: float = 0.15, ry: float = 0.2,
                rs: float = 0.7) -> np.ndarray:
    """Face window [x1, x2, y1, y2] for the no-crop test transform
    (umlvdfw_test_dataset.py:12-31 with crop_pos=(0,0), flip=False)."""
    x1 = int(round(rx * load_size))
    y1 = int(round(ry * load_size))
    s = int(round(rs * load_size))
    return np.array([x1, x1 + s, y1, y1 + s], np.int32)


@dataclasses.dataclass
class RendererVariables:
    """Converted checkpoint variables for the inference stack."""

    generator: dict
    flowunet: dict
    modnet: dict
    static_drawing: dict | None = None   # ResnetStyle2Generator
    photo2cartoon: dict | None = None    # Photo2CartoonGenerator


class Module2Renderer:
    """Photo + per-frame target landmarks -> stylized frames.

    Equivalent of `GeomCGTIFWTestModel.forward`
    (geomcgt_ifw_test_model.py:276-302), frame-batched on device.
    """

    def __init__(self, variables: RendererVariables, style: str = "drawing",
                 output_nc: int | None = None, ngf: int = 64,
                 n_blocks: int = 9,
                 div: int = 3, disp: int = 3, crop_size: int = 256,
                 frame_batch: int = 8, flowunet: FlowUnet | None = None,
                 modnet: MODNet | None = None,
                 static_g: ResnetStyle2Generator | None = None,
                 cartoon_g: Photo2CartoonGenerator | None = None,
                 use_bf16: bool = False, output_uint8: bool = False,
                 data_parallel: bool = False,
                 motion_mode: str = "linear"):
        if use_bf16:
            # cast the per-frame nets (trident generator + intrinsic-flow
            # Unet params — flow dominates the per-frame FLOPs) to
            # bfloat16; BatchNorm statistics and the once-per-photo nets
            # stay fp32 for fidelity
            def cast_params(tree):
                return jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x, tree)

            flow_v = dict(variables.flowunet)
            flow_v["params"] = cast_params(flow_v["params"])
            variables = dataclasses.replace(
                variables,
                generator=cast_params(variables.generator),
                flowunet=flow_v)
        self.use_bf16 = use_bf16
        self.v = variables
        self.style = style
        nc = output_nc if output_nc is not None else (
            1 if style == "drawing" else 3)
        self.g = TridentGeneratorFullIFW(output_nc=nc, ngf=ngf,
                                         n_blocks=n_blocks, div=div,
                                         disp=disp)
        self.flowunet = flowunet or FlowUnet()
        self.modnet = modnet or MODNet()
        self.static_g = static_g or ResnetStyle2Generator()
        self.cartoon_g = cartoon_g or Photo2CartoonGenerator()
        self.crop_size = crop_size
        self.frame_batch = frame_batch
        self.output_uint8 = output_uint8
        # "linear" (default): EXACT cal_motion256 semantics — host-side
        # Delaunay of the 76 control points per frame (~100 us) + dense
        # on-device barycentric evaluation (ops.tps.linear_motion_grid).
        # "tps": the fully-on-device polyharmonic-spline substitution
        # (no host in the loop; grids differ sub-pixel from griddata).
        self.motion_mode = motion_mode
        # AP_FETCH=overlap (default): start each batch's host copy right
        # after its dispatch (copy rides the link while later batches
        # compute) and concat on host. "bulk": one device-side concat +
        # one transfer at the end (fewest round trips). Measured on the
        # tunnel 2026-08-19: overlap 155 f/s vs bulk 111 f/s e2e — the
        # downlink hides completely behind compute; bulk stays available
        # for links where round-trip count dominates.
        self._fetch_mode = os.environ.get("AP_FETCH", "overlap")
        # checkpoint variables enter the jits as ARGUMENTS — closing
        # over them inlines hundreds of MB of weight literals into the
        # program, which makes XLA compiles take minutes and defeats any
        # compile caching across processes. They are device_put ONCE
        # here: host-resident arrays passed to a jit re-upload on EVERY
        # call, which over the remote-TPU tunnel (~20 MB/s) turned a
        # 9 ms/frame renderer into a 270 ms/frame one (measured
        # 2026-08-17, bench.py e2e mode).
        # data_parallel: shard the frame batch across ALL devices of a
        # 1-D mesh (rendering is embarrassingly parallel over frames —
        # the idiomatic multi-chip serving layout). Nets and the
        # per-photo prep outputs are replicated; GSPMD partitions the
        # per-frame programs with no user-level collectives.
        self._mesh = None
        self._batch_sharding = None
        if data_parallel and len(jax.devices()) > 1:
            from jax.sharding import (Mesh, NamedSharding, PartitionSpec)

            n_dev = len(jax.devices())
            self._mesh = Mesh(np.asarray(jax.devices()), ("frames",))
            self._batch_sharding = NamedSharding(self._mesh,
                                                 PartitionSpec("frames"))
            self._repl_sharding = NamedSharding(self._mesh,
                                                PartitionSpec())
            # frame_batch must tile evenly across the mesh
            self.frame_batch = -(-self.frame_batch // n_dev) * n_dev
            put = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, self._repl_sharding), t)
        else:
            dev = jax.devices()[0]
            put = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, dev), t)
        self._prep_nets = put({"modnet": self.v.modnet,
                               "static_drawing": self.v.static_drawing,
                               "photo2cartoon": self.v.photo2cartoon})
        self._frame_nets = put({"generator": self.v.generator,
                                "flowunet": self.v.flowunet})
        self._prep_jit = jax.jit(self._prepare)
        self._encode_jit = jax.jit(self._encode)
        self._frames_jit = jax.jit(self._frames,
                                   static_argnames=("return_all",))

    # --- once per photo ---
    def _prepare(self, nets, photo):
        """photo (1,256,256,3) in [-1,1] -> (masked photo, matte,
        fakeB_static)."""
        _, _, matte = self.modnet.apply(nets["modnet"], photo)
        mask = (matte > 0.5).astype(jnp.float32)
        if self.style == "drawing":
            photo_512 = interpolate_bilinear(photo, (512, 512),
                                             align_corners=False)
            style_map = jnp.tile(
                jnp.asarray([0.0, 1.0, 0.0])[None, None, None, :],
                (1, 128, 128, 1))
            static_512 = self.static_g.apply(
                nets["static_drawing"], photo_512, style_map)
            fake_static = interpolate_bilinear(
                static_512, (self.crop_size, self.crop_size),
                align_corners=False)
        else:
            # Photo2Cartoon.inference2 routes the photo through a
            # truncating uint8 round trip before the net
            # (photo2cartoon.py:585-589: (x+1)*127.5 astype(uint8),
            # /127.5-1) — replicated on device for bit-parity
            q = jnp.floor(jnp.clip((photo + 1.0) * 127.5, 0, 255))
            cartoon, _, _ = self.cartoon_g.apply(
                nets["photo2cartoon"], q / 127.5 - 1.0)
            fake_static = cartoon
        photo_fore = ((photo / 2 + 0.5) * mask + 1 - mask) * 2 - 1
        return photo_fore, mask, fake_static

    # --- once per photo: frame-invariant generator work ---
    def _encode(self, nets, photo_fore, a_lm68):
        """The generator's photo stems + source-landmark encoding are
        constant over the whole video; compute them once (batch 1) and
        let `decode` broadcast across every frame batch."""
        a_lm_img = landmark_dot_images(a_lm68, self.crop_size)
        if self.use_bf16:
            photo_fore = photo_fore.astype(jnp.bfloat16)
            a_lm_img = a_lm_img.astype(jnp.bfloat16)
        return self.g.apply(nets["generator"], photo_fore, a_lm_img,
                            method=TridentGeneratorFullIFW.encode_static)

    # --- per frame batch ---
    def _frames(self, nets, g_cache, mask, fake_static,
                a_lm68, tb_lm68s, motions=None, simplices=None,
                return_all=False):
        B = tb_lm68s.shape[0]
        cs = self.crop_size
        if motions is None:
            # Motion grids computed in the same program — a separate
            # dispatch per batch costs a full tunnel round trip.
            # (A precomputed grid can be injected instead, e.g. the
            # reference's scipy-griddata grid for exact-parity runs.)
            src = jnp.broadcast_to(a_lm68, tb_lm68s.shape)
            if simplices is not None:
                # exact griddata-linear semantics: host Delaunay passed
                # in, dense barycentric evaluation on device
                from animateportrait_tpu.ops.tps import linear_motion_grid
                motions = linear_motion_grid(src, tb_lm68s, simplices, cs)
            else:
                motions = motion_grid_from_landmarks(src, tb_lm68s, cs)
        # landmark dot images rasterized ON DEVICE from the 68 coords
        # (cv2-exact): only 68x2 floats cross the host->device link per
        # frame instead of a 64 KB image
        tb_lm_imgs = landmark_dot_images(tb_lm68s, cs)

        # source heatmap stack is frame-invariant: build once, closed over
        # by the vmapped per-frame body instead of materialized B times
        j1 = kp_to_map_binary((224, 224), a_lm68[0] * (7.0 / 8.0))

        def flow_for(lm2):
            j2 = kp_to_map_binary((224, 224), lm2 * (7.0 / 8.0))
            inp = jnp.concatenate([j1, j2], axis=-1)[None]
            if self.use_bf16:
                inp = inp.astype(jnp.bfloat16)
            flow_out, vis_out, _, _ = self.flowunet.apply(
                nets["flowunet"], inp)
            vis = jnp.argmax(vis_out, axis=-1, keepdims=True)
            m = (vis < 2).astype(jnp.float32)
            flow = flow_out * 20.0 * m
            warp_flow = interpolate_bilinear(flow * (8.0 / 7.0), (cs, cs),
                                             align_corners=True)
            res_mask = interpolate_bilinear(m, (cs, cs), align_corners=True)
            return warp_flow[0], res_mask[0]

        flows, fmasks = jax.vmap(flow_for)(tb_lm68s)

        # the frame-invariant half (photo stems + source-landmark
        # encoding) comes in precomputed as g_cache; decode broadcasts
        # its batch-1 entries over the frame batch
        if self.use_bf16:
            # features/images in bf16; motion grids and flows stay f32 —
            # the generator's warp index math is f32 (a bf16 grid
            # quantizes to ~half a pixel at 256), so casting them here
            # would only round-trip-lose precision
            fake_b = self.g.apply(
                nets["generator"], g_cache,
                tb_lm_imgs.astype(jnp.bfloat16), motions, flows, fmasks,
                method=TridentGeneratorFullIFW.decode).astype(jnp.float32)
        else:
            fake_b = self.g.apply(nets["generator"], g_cache, tb_lm_imgs,
                                  motions, flows, fmasks,
                                  method=TridentGeneratorFullIFW.decode)
        mask1 = grid_sample(
            jnp.broadcast_to(mask, (B,) + mask.shape[1:]), motions,
            align_corners=True)
        static_b = jnp.broadcast_to(fake_static,
                                    (B,) + fake_static.shape[1:])
        out = ((fake_b / 2 + 0.5) * mask1
               + (static_b / 2 + 0.5) * (1 - mask1)) * 2 - 1
        if return_all:
            # the reference test model's intermediate visuals
            # (geomcgt_ifw_test_model.py:276-302 attribute names)
            return {"fake_B": out,
                    "fake_B_fore": fake_b.astype(jnp.float32),
                    "fg_mask1": mask1 * 2 - 1,
                    "fakeB_static": static_b,
                    "warp_motion": motions,
                    "iw_flow": flows, "if_mask": fmasks,
                    "target_B_lm": tb_lm_imgs.astype(jnp.float32)}
        if self.output_uint8:
            # on-device frames_to_uint8 (utils/video.py:17-22, same f32
            # math + truncating cast) — 4x less host-transfer traffic
            out = jnp.clip((out + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        return out

    def __call__(self, photo: np.ndarray, a_lm68: np.ndarray,
                 tb_lm68s: np.ndarray,
                 progress: Callable[[int, int], None] | None = None,
                 motions: np.ndarray | None = None) -> np.ndarray:
        """photo (256,256,3) [-1,1]; a_lm68 (68,2); tb_lm68s (T,68,2)
        -> frames (T,256,256,nc) in [-1,1] float32 (or uint8 RGB/gray
        when constructed with output_uint8=True).

        motions: optional (T, cs, cs, 2) precomputed normalized warp
        grids replacing the on-device TPS (the reference's per-frame
        scipy-griddata grids, umlvdfw_test_dataset.py:67-81)."""
        cs = self.crop_size
        photo = jnp.asarray(photo, jnp.float32)[None]
        a68 = jnp.asarray(a_lm68, jnp.float32)[None]
        prep = self._prep_jit(self._prep_nets, photo)
        g_cache = self._encode_jit(self._frame_nets, prep[0], a68)
        if self._mesh is not None:
            # replicate the per-photo tensors across the frame mesh
            prep = jax.device_put(prep, self._repl_sharding)
            g_cache = jax.device_put(g_cache, self._repl_sharding)
            a68 = jax.device_put(a68, self._repl_sharding)

        T = tb_lm68s.shape[0]
        fb = self.frame_batch
        outs = []
        pad = (-T) % fb
        tb68_p = np.concatenate(
            [tb_lm68s, np.repeat(tb_lm68s[-1:], pad, 0)], 0) if pad else (
            np.asarray(tb_lm68s))
        mo_p = None
        if motions is not None:
            mo_p = np.concatenate(
                [motions, np.repeat(motions[-1:], pad, 0)],
                0) if pad else np.asarray(motions)
        tris_p = None
        if motions is None and self.motion_mode == "linear":
            # exact-parity grids: triangulate each frame's dest control
            # points on the host (~100 us per 76-point frame) and hand
            # the simplices to the jitted barycentric evaluation
            from animateportrait_tpu.ops.tps import triangulate_frames
            tris_p = triangulate_frames(tb68_p, cs)
        for j in range(0, tb68_p.shape[0], fb):
            lm_batch = jnp.asarray(tb68_p[j: j + fb], jnp.float32)
            mo_batch = None if mo_p is None else jnp.asarray(
                mo_p[j: j + fb], jnp.float32)
            tri_batch = None if tris_p is None else jnp.asarray(
                tris_p[j: j + fb])
            if self._batch_sharding is not None:
                lm_batch = jax.device_put(lm_batch, self._batch_sharding)
                if mo_batch is not None:
                    mo_batch = jax.device_put(mo_batch,
                                              self._batch_sharding)
                if tri_batch is not None:
                    tri_batch = jax.device_put(tri_batch,
                                               self._batch_sharding)
            out = self._frames_jit(
                self._frame_nets, g_cache, prep[1], prep[2], a68,
                lm_batch, mo_batch, tri_batch)
            # keep the device array and (overlap mode) start its host
            # copy in the background — a synchronous np.asarray here
            # would stall the dispatch pipeline on every batch (compute,
            # then transfer, then idle device while the host prepares
            # the next batch)
            if self._fetch_mode == "overlap":
                try:
                    out.copy_to_host_async()
                except AttributeError:
                    pass
            outs.append(out)
            if progress is not None:
                progress(min(j + fb, T), T)
        if self._fetch_mode == "overlap":
            # per-batch host copies were started right after each
            # dispatch, so they ride the link WHILE later batches
            # compute; each np.asarray below just waits for its
            # already-running copy instead of paying a fresh round trip
            host = [np.asarray(o) for o in outs]
            return (host[0] if len(host) == 1
                    else np.concatenate(host, axis=0))[:T]
        # bulk (default): ONE transfer of one device-side concat —
        # per-batch synchronous np.asarray costs a full tunnel round
        # trip each (~0.45 s/batch measured)
        frames_dev = outs[0] if len(outs) == 1 else jnp.concatenate(
            outs, axis=0)
        return np.asarray(frames_dev)[:T]

    def render_visuals(self, photo: np.ndarray, a_lm68: np.ndarray,
                       tb_lm68s: np.ndarray,
                       motions: np.ndarray | None = None
                       ) -> dict[str, np.ndarray]:
        """One frame batch with every reference test-model intermediate
        (GeomCGTIFWTestModel.forward attributes,
        geomcgt_ifw_test_model.py:276-302): fake_B (blended),
        fake_B_fore (pre-blend G output), fg_mask / fg_mask1 (matte and
        warped matte), fakeB_static, real_A (matted photo), target_B_lm,
        plus warp_motion/iw_flow/if_mask. All (T, H, W, C) float numpy.

        The per-frame visual path of ``test_cli``; the throughput path
        is ``__call__`` (which skips these extra fetches)."""
        photo = jnp.asarray(photo, jnp.float32)[None]
        a68 = jnp.asarray(a_lm68, jnp.float32)[None]
        photo_fore, mask, fake_static = self._prep_jit(
            self._prep_nets, photo)
        g_cache = self._encode_jit(self._frame_nets, photo_fore, a68)
        lm_batch = jnp.asarray(tb_lm68s, jnp.float32)
        mo = None if motions is None else jnp.asarray(motions, jnp.float32)
        tri = None
        if mo is None and self.motion_mode == "linear":
            from animateportrait_tpu.ops.tps import triangulate_frames
            tri = jnp.asarray(
                triangulate_frames(np.asarray(tb_lm68s), self.crop_size))
        vis = self._frames_jit(self._frame_nets, g_cache, mask,
                               fake_static, a68, lm_batch, mo, tri,
                               return_all=True)
        T = lm_batch.shape[0]
        out = {k: np.asarray(v) for k, v in vis.items()}
        out["real_A"] = np.broadcast_to(
            np.asarray(photo_fore), (T,) + photo_fore.shape[1:])
        out["fg_mask"] = np.broadcast_to(
            np.asarray(mask * 2 - 1), (T,) + mask.shape[1:])
        return out
