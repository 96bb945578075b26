"""Inference CLI with the reference's ``Module2/test.py`` flag surface.

    python -m animateportrait_tpu.test_cli --dataroot <db> --name \
        formal/drawing --model geomcgt_ifw_test \
        --netG resnet_9blocks_rcatland32_full_ifw --netg_resb_div 3 \
        --netg_resb_disp 3 --output_nc 1 --load_size 256 --crop_size 256 \
        --epoch 70 --num_test 10000 --serial_batches --imagefolder <db>

Equivalent of `Module2/test.py:39-67` + `UMLVDFWTestDataset` +
`GeomCGTIFWTestModel`: resolves the photo (A) and landmark-frame (B)
lists from `datasets/list/{phase}A|B/<dataroot>.txt` (the files the
driver's ``getTestList`` writes, `main_end2end_module2.py:71-87`) or
from `<dataroot>/{phase}A|B` directories, renders every frame through
the TPU renderer, and writes the reference results tree:

    <results_dir>/<name>/<phase>_<epoch>/<imagefolder>/
        <nameA>-><nameB>_<label>.png      (one per visual)
    <results_dir>/<name>/<phase>_<epoch>/index<folder>.html

with the reference's nine visuals (`geomcgt_ifw_test_model.py:196-204`):
real_A, real_A_lm, target_B_lm, fake_B, fake_B_vis, fg_mask,
fakeB_static, fake_B_fore, fg_mask1. Frames sharing a photo are batched
through one jitted program (the reference runs bs=1 on GPU); the main
end-to-end driver (`cli.py`) uses the faster frames-only path instead.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/animateportrait_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build_test_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("animateportrait-test")
    # base options (base_options.py) — the subset test.py consumes
    p.add_argument("--dataroot", required=True,
                   help="db name (resolved via datasets/list/) or a "
                   "directory containing {phase}A/{phase}B")
    p.add_argument("--name", default="formal/drawing",
                   help="experiment name; 'drawing'/'cartoon' selects "
                   "the static stylizer (geomcgt_ifw_test_model.py:225)")
    p.add_argument("--model", default="geomcgt_ifw_test")
    p.add_argument("--netG", default="resnet_9blocks_rcatland32_full_ifw")
    p.add_argument("--netg_resb_div", type=int, default=3)
    p.add_argument("--netg_resb_disp", type=int, default=1)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--input_nc", type=int, default=3)
    p.add_argument("--output_nc", type=int, default=3)
    p.add_argument("--norm", default="instance")
    p.add_argument("--no_dropout", action="store_true")
    p.add_argument("--load_size", type=int, default=256)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--no_flip", action="store_true")
    p.add_argument("--dataset_mode", default="umlvdfw_test")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--epoch", default="latest")
    p.add_argument("--serial_batches", action="store_true")
    p.add_argument("--max_dataset_size", type=int, default=float("inf"))
    p.add_argument("--direction", default="AtoB")
    p.add_argument("--preprocess", default="resize_and_crop")
    p.add_argument("--suffix", default="")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)   # test.py forces 1
    p.add_argument("--num_threads", type=int, default=0)  # test.py forces 0
    p.add_argument("--gpu_ids", default="0")
    p.add_argument("--display_winsize", type=int, default=256)
    # test options (test_options.py:10-25)
    p.add_argument("--ntest", type=int, default=float("inf"))
    p.add_argument("--results_dir", default="./results/")
    p.add_argument("--aspect_ratio", type=float, default=1.0)
    p.add_argument("--phase", default="test")
    p.add_argument("--eval", action="store_true",
                   help="accepted for compatibility: the flax nets are "
                   "always in inference mode (no dropout; frozen BN)")
    p.add_argument("--num_test", type=int, default=50)
    p.add_argument("--imagefolder", default="images")
    # model-injected flags (geomcgt_ifw_test_model.py:176-186)
    p.add_argument("--draw_op", type=int, default=0,
                   help="landmark image style: 0 dots / 1 +lines / "
                   "2 colored polygons (umlvdfw_test_dataset.py:34-65)")
    p.add_argument("--blendbg", type=int, default=0,
                   help="accepted for compatibility (the reference test "
                   "model injects but never reads it; the fg/bg blend "
                   "always runs)")
    p.add_argument("--truncate", type=float, default=0.0,
                   help="accepted for compatibility (injected but never "
                   "read by the reference test model)")
    # TPU-native extra
    p.add_argument("--frame_batch", type=int, default=8,
                   help="frames per jitted render program")
    p.add_argument("--warp_mode", default="linear",
                   choices=["linear", "tps"],
                   help="'linear' = exact reference griddata-linear warp "
                        "grids (host Delaunay + device barycentric); "
                        "'tps' = fully-on-device spline substitution")
    return p


def resolve_lists(dataroot: str, phase: str,
                  max_size: float) -> tuple[list[str], list[str]]:
    """A/B image lists (umlvdfw_test_dataset.py:93-105): the driver's
    list files when present, else <dataroot>/{phase}A|B directories."""
    la = os.path.join("datasets", "list", phase + "A", dataroot + ".txt")
    lb = os.path.join("datasets", "list", phase + "B", dataroot + ".txt")
    if os.path.exists(la) and os.path.exists(lb):
        A = sorted(open(la).read().splitlines())
        B = sorted(open(lb).read().splitlines())
    else:
        exts = (".png", ".jpg", ".jpeg")

        def walk(d):
            out = []
            for r, _, files in os.walk(d):
                out += [os.path.join(r, f) for f in files
                        if f.lower().endswith(exts)]
            return sorted(out)

        A = walk(os.path.join(dataroot, phase + "A"))
        B = walk(os.path.join(dataroot, phase + "B"))
    if np.isfinite(max_size):
        A, B = A[:int(max_size)], B[:int(max_size)]
    return A, B


def _lm_txt_for(path: str) -> str:
    """Landmark txt path for an A photo or a B landmark-frame image
    (umlvdfw_test_dataset.py:125-130)."""
    if "/Alm/MTCNN/" in path or os.sep + "Alm" + os.sep in path:
        base = path.replace("/Alm/MTCNN/", "/Alm_txt/MTCNN/")
    elif "/Photo/" in path:
        base = path.replace("/Photo/", "/Alm_txt/MTCNN/")
    else:
        base = path.replace("/Drawing/", "/Blm_txt/MTCNN/")
    return os.path.splitext(base)[0] + ".txt"


def _read_lm(path: str) -> np.ndarray:
    rows = open(path).read().splitlines()
    return np.array([[float(e.split()[0]), float(e.split()[1])]
                     for e in rows], np.float32)


def _tensor2im(arr: np.ndarray) -> np.ndarray:
    """[-1,1] float (H,W,C) -> uint8 RGB (util/util.py:9-30)."""
    a = np.asarray(arr, np.float32)
    if a.ndim == 4:
        a = a[0]
    a = np.clip((a + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    return a


def build_renderer(args):
    """Renderer from converted checkpoints in the reference layout:
    G_A at <checkpoints_dir>/<name>/<epoch>_net_G_A.pth, frozen nets at
    <checkpoints_dir>/{modnet...ckpt, static/, FlowReg_id_flow_faces/}
    (geomcgt_ifw_test_model.py:202-229)."""
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.cli import _load_or_init
    from animateportrait_tpu.models.flowunet import (
        FlowUnet, load_flowunet_params)
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, TridentGeneratorFullIFW,
        load_style2_params, load_trident_full_ifw_params)
    from animateportrait_tpu.models.modnet import MODNet, load_modnet_params
    from animateportrait_tpu.models.photo2cartoon import (
        Photo2CartoonGenerator, load_photo2cartoon_params)
    from animateportrait_tpu.pipeline.render import (
        Module2Renderer, RendererVariables)

    cd = args.checkpoints_dir
    style = "cartoon" if "cartoon" in args.name else "drawing"
    if "drawing" not in args.name and "cartoon" not in args.name:
        print(f"[test] WARNING: --name {args.name} names neither "
              "'drawing' nor 'cartoon'; defaulting the static stylizer "
              "to drawing (the reference would crash here)",
              file=sys.stderr)
    nc = args.output_nc
    key = jax.random.key(0)
    cs = args.crop_size

    gen_v = _load_or_init(
        os.path.join(cd, args.name, f"{args.epoch}_net_G_A.pth"),
        load_trident_full_ifw_params,
        lambda: TridentGeneratorFullIFW(
            output_nc=nc, ngf=args.ngf, div=args.netg_resb_div,
            disp=args.netg_resb_disp).init(
            key, jnp.zeros((1, cs, cs, 3)), jnp.zeros((1, cs, cs, 1)),
            jnp.zeros((1, cs, cs, 1)), jnp.zeros((1, cs, cs, 2)),
            jnp.zeros((1, cs, cs, 2)), jnp.zeros((1, cs, cs, 1))),
        f"generator {args.name}")
    flow_v = _load_or_init(
        os.path.join(cd, "FlowReg_id_flow_faces", "best_net_netF.pth"),
        load_flowunet_params,
        lambda: FlowUnet().init(key, jnp.zeros((1, 224, 224, 136))),
        "flow regressor")
    modnet_v = _load_or_init(
        os.path.join(cd, "modnet_photographic_portrait_matting.ckpt"),
        load_modnet_params,
        lambda: MODNet().init(key, jnp.zeros((1, cs, cs, 3))), "modnet")
    static_v = cartoon_v = None
    if style == "drawing":
        static_v = _load_or_init(
            os.path.join(cd, "static", "drawing.pth"), load_style2_params,
            lambda: ResnetStyle2Generator().init(
                key, jnp.zeros((1, 512, 512, 3)),
                jnp.zeros((1, 128, 128, 3))), "static drawing net")
    else:
        cartoon_v = _load_or_init(
            os.path.join(cd, "static", "cartoon.pt"),
            load_photo2cartoon_params,
            lambda: Photo2CartoonGenerator().init(
                key, jnp.zeros((1, cs, cs, 3))), "photo2cartoon",
            unwrap="genA2B")

    return Module2Renderer(
        RendererVariables(generator=gen_v, flowunet=flow_v,
                          modnet=modnet_v, static_drawing=static_v,
                          photo2cartoon=cartoon_v),
        style=style, output_nc=nc, ngf=args.ngf,
        div=args.netg_resb_div, disp=args.netg_resb_disp,
        crop_size=cs, frame_batch=args.frame_batch,
        motion_mode=getattr(args, "warp_mode", "linear"))


def main(argv=None):
    args = build_test_argparser().parse_args(argv)
    if args.suffix:
        args.name = args.name + "_" + args.suffix.format(**vars(args))
    if args.preprocess != "resize_and_crop":
        raise SystemExit(f"--preprocess {args.preprocess}: only "
                         "resize_and_crop is supported")

    import cv2
    from PIL import Image

    from animateportrait_tpu.data.umlvd_ifw import (
        DataConfig, _get_params2, trans_lm)
    from animateportrait_tpu.pipeline.render import draw_landmarks
    from animateportrait_tpu.utils.observe import draw_lm_overlay
    from animateportrait_tpu.utils.options import archive_options
    args.phase = args.phase or "test"
    print(archive_options(args))

    A_paths, B_paths = resolve_lists(args.dataroot, args.phase,
                                     args.max_dataset_size)
    if not A_paths or not B_paths:
        raise SystemExit(
            f"no test images: A={len(A_paths)} B={len(B_paths)} "
            f"(dataroot {args.dataroot}, phase {args.phase})")
    n = min(len(B_paths) if args.serial_batches
            else max(len(A_paths), len(B_paths)),
            args.num_test, args.ntest)
    n = int(n)

    renderer = build_renderer(args)
    cfg = DataConfig(root="", load_size=args.load_size,
                     crop_size=args.crop_size, no_flip=True,
                     output_nc=args.output_nc)
    # test.py forces no_flip; with load_size == crop_size (the
    # TestOptions default) the crop is deterministically (0, 0)
    prng = np.random.default_rng(0)

    web_dir = os.path.join(args.results_dir, args.name,
                           f"{args.phase}_{args.epoch}")
    img_dir = os.path.join(web_dir, args.imagefolder)
    os.makedirs(img_dir, exist_ok=True)

    radius = 5 if args.crop_size == 512 else 3
    thickness = 4 if args.crop_size == 512 else 2

    # per-item geometry (host, cheap); frames sharing one photo + crop
    # batch through one jitted render program below
    items = []
    for i in range(n):
        A_path = A_paths[i % len(A_paths)]
        B_path = (B_paths[i % len(B_paths)] if args.serial_batches else
                  B_paths[int(prng.integers(0, len(B_paths)))])
        items.append((A_path, B_path))

    rows = []  # (name, [(label, filename), ...]) for the HTML index
    i = 0
    while i < n:
        A_path = items[i][0]
        j = i
        while j < n and items[j][0] == A_path:
            j += 1
        # one photo group [i, j)
        A_img = Image.open(A_path).convert(
            "L" if args.input_nc == 1 else "RGB")
        w, h = A_img.size
        pA = _get_params2(cfg, (w, h), np.random.default_rng(0))
        A_res = A_img.resize((args.load_size, args.load_size),
                             Image.BICUBIC)
        x0, y0 = pA["crop_pos"]
        A_crop = A_res.crop((x0, y0, x0 + args.crop_size,
                             y0 + args.crop_size))
        A_arr = np.asarray(A_crop, np.float32) / 255.0 * 2 - 1
        if A_arr.ndim == 2:
            A_arr = A_arr[..., None]
        Alm_68_raw = _read_lm(_lm_txt_for(A_path))
        Alm_68, _ = trans_lm(Alm_68_raw, pA, cfg, (w, h))

        tb68s, wins, names = [], [], []
        for k in range(i, j):
            B_path = items[k][1]
            Bsize = (w, h)  # reference: Bsize = A_img.size (:136)
            pB = _get_params2(cfg, Bsize, np.random.default_rng(0))
            Blm_68, winB = trans_lm(_read_lm(_lm_txt_for(B_path)), pB,
                                    cfg, Bsize)
            tb68s.append(Blm_68)
            wins.append(winB)
            nameA = os.path.splitext(os.path.basename(A_path))[0]
            nameB = os.path.splitext(os.path.basename(B_path))[0]
            names.append(f"{nameA}->{nameB}")
        tb68s = np.stack(tb68s)

        fb = args.frame_batch
        T = tb68s.shape[0]
        pad = (-T) % fb
        tb_p = (np.concatenate([tb68s, np.repeat(tb68s[-1:], pad, 0)])
                if pad else tb68s)
        vis_batches = []
        for s in range(0, tb_p.shape[0], fb):
            vis_batches.append(renderer.render_visuals(
                A_arr, Alm_68, tb_p[s: s + fb]))
        vis = {k: np.concatenate([vb[k] for vb in vis_batches])[:T]
               for k in vis_batches[0]}

        a_lm_img = draw_landmarks(args.crop_size, args.crop_size, Alm_68,
                                  radius, thickness, op=args.draw_op)
        for t in range(T):
            visuals = {
                "real_A": vis["real_A"][t],
                "real_A_lm": a_lm_img,
                "target_B_lm": draw_landmarks(
                    args.crop_size, args.crop_size, tb68s[t], radius,
                    thickness, op=args.draw_op),
                "fake_B": vis["fake_B"][t],
                "fake_B_vis": draw_lm_overlay(
                    vis["fake_B"][t], tb68s[t], wins[t], hradius=3),
                "fg_mask": vis["fg_mask"][t],
                "fakeB_static": vis["fakeB_static"][t],
                "fake_B_fore": vis["fake_B_fore"][t],
                "fg_mask1": vis["fg_mask1"][t],
            }
            row = []
            for label, im in visuals.items():
                rgb = _tensor2im(im)
                if args.aspect_ratio != 1.0:
                    hh, ww = rgb.shape[:2]
                    if args.aspect_ratio > 1.0:
                        rgb = np.array(Image.fromarray(rgb).resize(
                            (int(ww * args.aspect_ratio), hh),
                            Image.BICUBIC))
                    else:
                        rgb = np.array(Image.fromarray(rgb).resize(
                            (ww, int(hh / args.aspect_ratio)),
                            Image.BICUBIC))
                fn = f"{names[t]}_{label}.png"
                cv2.imwrite(os.path.join(img_dir, fn), rgb[:, :, ::-1])
                row.append((label, fn))
            rows.append((names[t], row))
        print(f"[test] {j}/{n} frames rendered", file=sys.stderr)
        i = j

    # index<folder>.html (util/html.py:71-78 naming)
    folder = args.imagefolder
    suffix = folder[6:] if folder.startswith("images") else folder
    index = os.path.join(web_dir, f"index{suffix}.html")
    with open(index, "w") as f:
        f.write(f"<html><head><title>Experiment = {args.name}, Phase = "
                f"{args.phase}, Epoch = {args.epoch}</title></head>"
                "<body>\n")
        for name, row in rows:
            f.write(f"<h3>{name}</h3>\n"
                    "<table border='1' style='table-layout: fixed;'><tr>\n")
            for label, fn in row:
                src = f"{folder}/{fn}"
                f.write(
                    f"<td style='word-wrap: break-word;' valign='top'>"
                    f"<p><a href='{src}'><img style='width:"
                    f"{args.display_winsize}px' src='{src}'></a><br>"
                    f"<p>{label}</p></p></td>\n")
            f.write("</tr></table>\n")
        f.write("</body></html>\n")
    print(f"[test] wrote {index}")


if __name__ == "__main__":
    main()
