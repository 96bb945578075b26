"""CLI preserving the reference driver surface (`main_end2end_module2.py`):

    animateportrait --jpg photo.jpg --audio speech.wav --exp formal/drawing

plus the knobs the reference exposes (amp_lip_x/y, amp_pos, --output).
Checkpoints are converted reference weights (see io.torch_convert and each
model's load_*_params); point --ckpt_dir at a directory of .npz/.pth
conversions. Missing checkpoints fall back to random init with a warning —
the pipeline still runs end to end (useful for smoke/perf runs), but output
is not meaningful portrait animation until real weights are supplied.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Persistent XLA compile cache: repeated CLI runs skip the (substantial)
# jit compiles of the audio/landmark/render programs. User-overridable.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/animateportrait_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("animateportrait")
    p.add_argument("--jpg", help="input face photo")
    p.add_argument("--audio", help="input speech wav")
    p.add_argument("--video", help="input video: first frame becomes the "
                   "photo; audio extracted via ffmpeg when available")
    p.add_argument("--rerun", type=int, default=0,
                   help="accepted for reference-CLI parity; the pipeline "
                   "is in-memory so there are no stage files to redo")
    p.add_argument("--epoch", default="70",
                   help="generator checkpoint epoch to load")
    p.add_argument("--exp", default="formal/drawing",
                   help="style: formal/drawing | formal/cartoon")
    p.add_argument("--output", default="output",
                   help="directory for the final video")
    p.add_argument("--output_folder", default=None,
                   help="also write the reference's step-5 artifact "
                   "pred_fls_<audio>_audio_embed.txt here "
                   "(train_audio2landmark.py:340-342; the reference "
                   "writes it under Module1/examples and deletes it "
                   "after step 6, so none is written by default)")
    p.add_argument("--dump_dir", default=None,
                   help="also write the random_val_{fl,au,gaze}.pickle "
                   "stage dumps here (main_end2end_module2.py:230-251; "
                   "the Module1 trainer input format)")
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--load_AUTOVC_name", default="ckpt_autovc.pth")
    p.add_argument("--load_a2l_G_name", default="ckpt_speaker_branch.pth")
    p.add_argument("--load_a2l_C_name", default="ckpt_content_branch.pth")
    p.add_argument("--emb_coef", type=float, default=3.0)
    p.add_argument("--reuse_train_emb_list", nargs="+", default=[],
                   help="render one output per key using the saved "
                   "speaker embedding <ckpt_dir>/emb.pickle[key] for the "
                   "landmark branch instead of the embedding computed "
                   "from --audio")
    p.add_argument("--amp_lip_x", type=float, default=2.0)
    p.add_argument("--amp_lip_y", type=float, default=2.0)
    p.add_argument("--amp_pos", type=float, default=0.5)
    p.add_argument("--gender", default="F", choices=["M", "F"])
    p.add_argument("--frame_batch", type=int, default=32,
                   help="frames per render dispatch (amortizes per-call "
                        "overhead; 8 matches the old default")
    p.add_argument("--render_dp", action="store_true",
                   help="shard each frame batch across all visible "
                        "devices (multi-chip data-parallel rendering)")
    p.add_argument("--render_bf16", action="store_true",
                   help="run the per-frame nets (trident generator + "
                        "intrinsic-flow Unet) in bfloat16; the "
                        "once-per-photo nets stay fp32")
    p.add_argument("--warp_mode", default="linear",
                   choices=["linear", "tps"],
                   help="per-frame warp grids: 'linear' = the "
                        "reference's exact griddata-linear semantics "
                        "(host Delaunay + on-device barycentric eval); "
                        "'tps' = fully-on-device polyharmonic spline "
                        "(no host in the loop, sub-px mean deviation)")
    p.add_argument("--seed", type=int, default=0)
    # net-width knobs (debug/test; the reference architecture fixes these
    # at 64/16/64/32 — smaller values give fast random-init smoke runs,
    # e.g. the cli.main() end-to-end test)
    p.add_argument("--ngf", type=int, default=64,
                   help="trident generator width (reference: 64)")
    p.add_argument("--flow_nf", type=int, default=16,
                   help="intrinsic-flow Unet width (reference: 16)")
    p.add_argument("--static_ngf", type=int, default=64,
                   help="static drawing net width (reference: 64)")
    p.add_argument("--cartoon_ngf", type=int, default=32,
                   help="photo2cartoon generator width (reference: 32)")
    # Module1 model/trainer hyperparameters, accepted like the reference
    # driver (main_end2end_module2.py:147-158). The inference engine
    # hardcodes the shipped architecture exactly as the reference does
    # (train_audio2landmark.py:55-59 ignores these flags), so they only
    # matter to the trainers (train/module1.py configs).
    p.add_argument("--pos_dim", type=int, default=7)
    p.add_argument("--transformer_d_model", type=int, default=32)
    p.add_argument("--transformer_N", type=int, default=2)
    p.add_argument("--transformer_heads", type=int, default=2)
    p.add_argument("--spk_emb_enc_size", type=int, default=16)
    p.add_argument("--init_content_encoder", default="")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--reg_lr", type=float, default=1e-6)
    p.add_argument("--segment_batch_size", type=int, default=1)
    p.add_argument("--lambda_laplacian_smooth_loss", type=float,
                   default=1.0)
    return p


def _load_or_init(path, loader, init_fn, name, unwrap=None):
    """Load+convert a reference checkpoint, unwrapping the reference's
    wrapper dicts (ckpt['model'], ['G'], ['model_g_face_id'], ['genA2B'])
    when present; fall back to CPU-side random init."""
    if path and os.path.exists(path):
        import torch

        from animateportrait_tpu.io.torch_convert import load_torch_statedict

        sd = load_torch_statedict(path)
        if unwrap and not sd:
            obj = torch.load(path, map_location="cpu", weights_only=False)
            if unwrap in obj:
                sd = {k: (v.detach().numpy() if hasattr(v, "detach")
                          else np.asarray(v))
                      for k, v in obj[unwrap].items()}
        return loader(sd)
    print(f"[animateportrait] WARNING: no checkpoint for {name} "
          f"({path}); using random init", file=sys.stderr)
    # smoke/perf fallback: eval_shape + numpy fill, no XLA compile
    # (a single trident-G init is ~441 s of CPU compile on this host)
    from animateportrait_tpu.utils.smoke import random_variables

    return random_variables(init_fn)


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.models import mtcnn as mtcnn_lib
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkContent, Audio2landmarkPos, load_content_params,
        load_pos_params)
    from animateportrait_tpu.models.autovc import (
        AutoVCGenerator, load_autovc_params)
    from animateportrait_tpu.models.flowunet import (
        FlowUnet, load_flowunet_params)
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, TridentGeneratorFullIFW,
        load_style2_params, load_trident_full_ifw_params)
    from animateportrait_tpu.models.modnet import MODNet, load_modnet_params
    from animateportrait_tpu.models.photo2cartoon import (
        Photo2CartoonGenerator, load_photo2cartoon_params)
    from animateportrait_tpu.pipeline.audio import AudioPipeline
    from animateportrait_tpu.pipeline.end2end import TalkingPortraitPipeline
    from animateportrait_tpu.pipeline.landmark import LandmarkPredictor
    from animateportrait_tpu.pipeline.render import (
        Module2Renderer, RendererVariables)

    cd = args.ckpt_dir
    key = jax.random.key(0)
    style = "drawing" if "drawing" in args.exp else "cartoon"
    nc = 1 if style == "drawing" else 3

    # MTCNN weights ship with the reference mount when available
    mtcnn_w = os.path.join("/root/reference/MTCNN/weights")
    if not os.path.exists(os.path.join(mtcnn_w, "pnet.npy")):
        mtcnn_w = os.path.join(cd, "mtcnn")
    detector = mtcnn_lib.MTCNNDetector(
        mtcnn_lib.load_pnet_params(os.path.join(mtcnn_w, "pnet.npy")),
        mtcnn_lib.load_rnet_params(os.path.join(mtcnn_w, "rnet.npy")),
        mtcnn_lib.load_onet_params(os.path.join(mtcnn_w, "onet.npy")),
    )

    # 68-pt landmark source: a converted face_alignment FAN when its
    # checkpoint is present (the driver's step 2,
    # main_end2end_module2.py:188-193); otherwise the canonical-face
    # 5-pt fit — a DEGRADED mode that erases identity-specific geometry.
    from animateportrait_tpu.models.fan3d import (
        FaceAlignment3D, find_fan_checkpoints, load_depth_params,
        load_fan3d_params, make_fan_landmark_fn)

    landmark_fn = None
    fan_path, depth_path = find_fan_checkpoints(cd)
    if fan_path:
        fan_v = load_fan3d_params(_load_fa_statedict(fan_path))
        depth_v = (load_depth_params(_load_fa_statedict(depth_path))
                   if depth_path else None)
        fa = FaceAlignment3D(fan_v, depth_v)
        landmark_fn = make_fan_landmark_fn(fa, detector)
        if depth_path is None:
            print("[animateportrait] FAN loaded without the depth net; "
                  "z comes out 0 (the driver overwrites z anyway)",
                  file=sys.stderr)
    else:
        print(
            "[animateportrait] WARNING: no face_alignment FAN checkpoint "
            f"found under {cd} (looked for 3DFAN4*/2DFAN4*.pth). Falling "
            "back to the canonical-face 5-pt fit: every subject gets the "
            "same jaw/brow/lip geometry up to a similarity transform, so "
            "output will NOT track this face's actual shape. Place a "
            "converted face_alignment checkpoint in the checkpoint dir "
            "to fix this.", file=sys.stderr)

    T0 = 32
    autovc_v = _load_or_init(
        os.path.join(cd, args.load_AUTOVC_name), load_autovc_params,
        lambda: AutoVCGenerator().init(
            key, jnp.zeros((1, T0, 80)), jnp.zeros((1, 256)),
            jnp.zeros((1, 256)), jnp.zeros((1, T0, 257))), "autovc",
        unwrap="model")
    audio = AudioPipeline(autovc_v)

    pos_v = _load_or_init(
        os.path.join(cd, args.load_a2l_G_name), load_pos_params,
        lambda: Audio2landmarkPos().init(
            key, jnp.zeros((4, 18, 80)), jnp.zeros((4, 256)),
            jnp.zeros((1, 204)), jnp.zeros((4, 128))), "speaker branch",
        unwrap="G")
    cont_v = _load_or_init(
        os.path.join(cd, args.load_a2l_C_name), load_content_params,
        lambda: Audio2landmarkContent().init(
            key, jnp.zeros((4, 18, 80)), jnp.zeros((1, 204))),
        "content branch", unwrap="model_g_face_id")
    predictor = LandmarkPredictor(pos_v, cont_v, amp_pos=args.amp_pos,
                                  amp_lip_x=args.amp_lip_x,
                                  amp_lip_y=args.amp_lip_y,
                                  emb_coef=args.emb_coef)

    cs = 256
    flow_net = FlowUnet(nf=args.flow_nf)
    static_net = ResnetStyle2Generator(ngf=args.static_ngf)
    cartoon_net = Photo2CartoonGenerator(ngf=args.cartoon_ngf)
    gen_v = _load_or_init(
        os.path.join(cd, args.exp, f"{args.epoch}_net_G_A.pth"),
        lambda sd: load_trident_full_ifw_params(sd),
        lambda: TridentGeneratorFullIFW(
            output_nc=nc, ngf=args.ngf, div=3, disp=3).init(
            key, jnp.zeros((1, cs, cs, 3)), jnp.zeros((1, cs, cs, 1)),
            jnp.zeros((1, cs, cs, 1)), jnp.zeros((1, cs, cs, 2)),
            jnp.zeros((1, cs, cs, 2)), jnp.zeros((1, cs, cs, 1))),
        f"generator {args.exp}")
    flow_v = _load_or_init(
        os.path.join(cd, "FlowReg_id_flow_faces", "best_net_netF.pth"),
        load_flowunet_params,
        lambda: flow_net.init(key, jnp.zeros((1, 224, 224, 136))),
        "flow regressor")
    modnet_v = _load_or_init(
        os.path.join(cd, "modnet_photographic_portrait_matting.ckpt"),
        load_modnet_params,
        lambda: MODNet().init(key, jnp.zeros((1, cs, cs, 3))), "modnet")
    static_v = None
    cartoon_v = None
    if style == "drawing":
        static_v = _load_or_init(
            os.path.join(cd, "static", "drawing.pth"), load_style2_params,
            lambda: static_net.init(
                key, jnp.zeros((1, 512, 512, 3)),
                jnp.zeros((1, 128, 128, 3))), "static drawing net")
    else:
        cartoon_v = _load_or_init(
            os.path.join(cd, "static", "cartoon.pt"),
            load_photo2cartoon_params,
            lambda: cartoon_net.init(
                key, jnp.zeros((1, cs, cs, 3))), "photo2cartoon",
            unwrap="genA2B")

    renderer = Module2Renderer(
        RendererVariables(generator=gen_v, flowunet=flow_v,
                          modnet=modnet_v, static_drawing=static_v,
                          photo2cartoon=cartoon_v),
        style=style, output_nc=nc, ngf=args.ngf,
        frame_batch=args.frame_batch,
        flowunet=flow_net, static_g=static_net, cartoon_g=cartoon_net,
        output_uint8=True, data_parallel=args.render_dp,
        use_bf16=args.render_bf16,
        motion_mode=getattr(args, "warp_mode", "linear"))

    return TalkingPortraitPipeline(detector, predictor, audio, renderer,
                                   landmark_fn=landmark_fn)


def _load_fa_statedict(path: str) -> dict:
    """face_alignment checkpoint -> numpy state dict. Newer releases ship
    torchscript .zip archives; older ones plain .pth.tar state dicts."""
    import torch

    from animateportrait_tpu.io.torch_convert import load_torch_statedict

    if path.endswith(".zip"):
        mod = torch.jit.load(path, map_location="cpu")
        return {k: v.detach().numpy()
                for k, v in mod.state_dict().items()}
    return load_torch_statedict(path)


def load_train_embs(ckpt_dir: str) -> dict:
    """Load the saved train-speaker embeddings dict {name: (256,) array}.

    Reference: `checkpoints/emb.pickle` probed at two locations
    (train_audio2landmark.py:89-94). Accepts .pickle or .npz."""
    import pickle

    for cand in (os.path.join(ckpt_dir, "emb.pickle"),
                 os.path.join(ckpt_dir, "..", "emb.pickle")):
        if os.path.exists(cand):
            with open(cand, "rb") as fp:
                return {k: np.asarray(v, np.float32).reshape(-1)
                        for k, v in pickle.load(fp).items()}
    npz = os.path.join(ckpt_dir, "emb.npz")
    if os.path.exists(npz):
        with np.load(npz) as z:
            return {k: z[k].astype(np.float32).reshape(-1) for k in z.files}
    raise SystemExit(
        f"--reuse_train_emb_list: no emb.pickle/emb.npz under {ckpt_dir}")


def _split_video(video_path: str, audio_path: str | None):
    """--video support (main_end2end_module2.py:161-183): first frame ->
    temp jpg; audio via ffmpeg when installed, else an explicit --audio
    must accompany --video (this image has no ffmpeg)."""
    import shutil
    import subprocess
    import tempfile

    import cv2

    tmp = tempfile.mkdtemp(prefix="animateportrait_")
    cap = cv2.VideoCapture(video_path)
    ok, frame = cap.read()
    cap.release()
    if not ok:
        raise SystemExit(f"cannot read a frame from {video_path}")
    jpg = os.path.join(tmp, "frame.jpg")
    cv2.imwrite(jpg, frame)
    if audio_path:
        return jpg, audio_path
    if shutil.which("ffmpeg"):
        wav = os.path.join(tmp, "audio.wav")
        subprocess.run(["ffmpeg", "-y", "-loglevel", "error", "-i",
                        video_path, "-vn", "-ar", "16000", "-ac", "1",
                        wav], check=True)
        return jpg, wav
    raise SystemExit("--video without --audio needs ffmpeg on PATH to "
                     "extract the soundtrack")


def main(argv=None):
    import time

    t_start = time.time()

    def stage(msg):
        print(f"[animateportrait +{time.time() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    args = build_argparser().parse_args(argv)
    from animateportrait_tpu.utils.observe import enable_compile_cache
    enable_compile_cache()
    import cv2

    from animateportrait_tpu.pipeline.audio import load_wav
    from animateportrait_tpu.utils.video import write_video_with_audio

    if args.video:
        args.jpg, args.audio = _split_video(args.video, args.audio)
    if not args.jpg or not args.audio:
        raise SystemExit("need --jpg and --audio (or --video)")
    # Saved train-embedding path. The reference loads
    # checkpoints/emb.pickle {name: 256-d emb} and renders one pass per
    # key with test_embs[key] as the speaker embedding
    # (train_audio2landmark.py:89-94,263-275). (Its shipped driver always
    # passes the computed au_emb, which shadows the saved one — we
    # implement the saved-embedding semantics the flag is named for.)
    emb_runs: list[tuple[str, np.ndarray | None]] = [("", None)]
    if args.reuse_train_emb_list:
        embs = load_train_embs(args.ckpt_dir)
        missing = [k for k in args.reuse_train_emb_list if k not in embs]
        if missing:
            raise SystemExit(
                f"--reuse_train_emb_list: unknown keys {missing}; "
                f"available: {sorted(embs)[:20]}")
        emb_runs = [(k, embs[k]) for k in args.reuse_train_emb_list]
    stage("imports done, building pipeline")
    pipeline = build_pipeline(args)
    stage("pipeline built")
    img = cv2.imread(args.jpg)
    if img is None:
        raise SystemExit(f"cannot read {args.jpg}")
    wav = load_wav(args.audio)

    base = "{}-{}".format(
        os.path.splitext(os.path.basename(args.jpg))[0],
        os.path.splitext(os.path.basename(args.audio))[0])
    os.makedirs(os.path.join(args.output, base), exist_ok=True)
    path = None
    for key, emb in emb_runs:
        out = pipeline(img, wav, gender=args.gender,
                       rng=np.random.default_rng(args.seed),
                       spk_emb_override=emb,
                       output_folder=args.output_folder,
                       dump_dir=args.dump_dir,
                       audio_name=os.path.splitext(
                           os.path.basename(args.audio))[0])
        stage("pipeline done, muxing video")
        suffix = f"_{key}" if key else ""
        dst = os.path.join(
            args.output, base,
            f"output_{args.exp.replace('/', '_')}{suffix}.avi")
        path = write_video_with_audio(dst, out.frames, wav, fps=out.fps)
        stage("video written")
        print(f"[animateportrait] wrote {path} "
              f"({out.frames.shape[0]} frames @ {out.fps} fps)")
    return path


if __name__ == "__main__":
    main()
