"""Generate the training dataset's /fakeB_static/ images.

The UMLVD-IFW trainer consumes per-photo static stylizations
(`<root>/fakeB_static/`); the reference produces them with the static
drawing net (or photo2cartoon). This tool batch-runs the converted static
generator over `<root>/Photo/`.

Usage:
    python tools/make_fakeb_static.py --root <dataset root> \
        --static_ckpt checkpoints/static/drawing.pth [--style cartoon]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--static_ckpt", default=None)
    p.add_argument("--style", default="drawing",
                   choices=["drawing", "cartoon"])
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.io.torch_convert import load_torch_statedict
    from animateportrait_tpu.models.gan import (
        ResnetStyle2Generator, load_style2_params)
    from animateportrait_tpu.models.photo2cartoon import (
        Photo2CartoonGenerator, load_photo2cartoon_params)

    photos = sorted(glob.glob(os.path.join(args.root, "Photo", "*.png"))
                    + glob.glob(os.path.join(args.root, "Photo", "*.jpg")))
    if not photos:
        raise SystemExit(f"no photos under {args.root}/Photo")
    out_dir = os.path.join(args.root, "fakeB_static")
    os.makedirs(out_dir, exist_ok=True)

    if args.style == "drawing":
        model = ResnetStyle2Generator()
        if args.static_ckpt:
            variables = load_style2_params(
                load_torch_statedict(args.static_ckpt))
        else:
            print("WARNING: no --static_ckpt; random init", file=sys.stderr)
            variables = model.init(jax.random.key(0),
                                   jnp.zeros((1, 512, 512, 3)),
                                   jnp.zeros((1, 128, 128, 3)))
        style_map = jnp.tile(jnp.asarray([0.0, 1.0, 0.0])[None, None, None],
                             (1, 128, 128, 1))
        fwd = jax.jit(lambda x: model.apply(variables, x, style_map))
    else:
        model = Photo2CartoonGenerator()
        if args.static_ckpt:
            import torch

            obj = torch.load(args.static_ckpt, map_location="cpu",
                             weights_only=False)
            sd = {k: v.detach().numpy() for k, v in obj["genA2B"].items()}
            variables = load_photo2cartoon_params(sd)
        else:
            print("WARNING: no --static_ckpt; random init", file=sys.stderr)
            variables = model.init(jax.random.key(0),
                                   jnp.zeros((1, 256, 256, 3)))
        fwd = jax.jit(lambda x: model.apply(variables, x)[0])

    for path in photos:
        img = cv2.imread(path)
        size = 512 if args.style == "drawing" else 256
        rgb = cv2.resize(img, (size, size),
                         interpolation=cv2.INTER_CUBIC)[:, :, ::-1]
        x = jnp.asarray(rgb, jnp.float32)[None] / 127.5 - 1.0
        out = np.asarray(fwd(x))[0]
        out8 = np.clip((out + 1) * 127.5, 0, 255).astype(np.uint8)
        if out8.shape[-1] == 1:
            out8 = np.repeat(out8, 3, axis=-1)
        # match the source photo resolution for the dataset loader
        out8 = cv2.resize(out8, (img.shape[1], img.shape[0]))
        dst = os.path.join(out_dir, os.path.basename(path))
        cv2.imwrite(dst, out8[:, :, ::-1])
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
