"""Convert every reference PyTorch checkpoint found under a directory into
this framework's parameter trees (saved as Orbax checkpoints).

Usage:
    python tools/convert_checkpoints.py --src <dir with reference ckpts> \
        --dst checkpoints_jax

Expected source layout (the reference's download bundles, readme.md:26-59):
    ckpt_autovc.pth, ckpt_content_branch.pth, ckpt_speaker_branch.pth
    <exp>/<epoch>_net_G_A.pth                      (Module2 generators)
    static/drawing.pth, static/cartoon.pt
    modnet_photographic_portrait_matting.ckpt
    mobilefacenet_model_best.pth.tar, sphere20a_20171020.pth
    FlowReg_id_flow_faces/best_net_netF.pth
    resemblyzer `pretrained.pt`                    (speaker encoder)

Missing files are skipped with a note, so partial bundles convert fine.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    args = p.parse_args(argv)

    from animateportrait_tpu.io.checkpoint import save
    from animateportrait_tpu.io.torch_convert import load_torch_statedict

    jobs = []

    def add(rel, loader, unwrap=None, name=None):
        path = os.path.join(args.src, rel)
        for match in sorted(glob.glob(path)):
            jobs.append((match, loader, unwrap,
                         name or os.path.relpath(match, args.src)))

    from animateportrait_tpu.models.audio2landmark import (
        load_content_params, load_pos_params)
    from animateportrait_tpu.models.autovc import load_autovc_params
    from animateportrait_tpu.models.flowunet import load_flowunet_params
    from animateportrait_tpu.models.gan import (
        load_nlayer_d_params, load_style2_params,
        load_trident_full_ifw_params)
    from animateportrait_tpu.models.modnet import load_modnet_params
    from animateportrait_tpu.models.perception import (
        load_mobilefacenet_params, load_sphere20a_params)
    from animateportrait_tpu.models.photo2cartoon import (
        load_photo2cartoon_params)
    from animateportrait_tpu.models.speaker_encoder import (
        load_voice_encoder_params)

    add("ckpt_autovc.pth", load_autovc_params, unwrap="model")
    add("ckpt_content_branch.pth", load_content_params,
        unwrap="model_g_face_id")
    add("ckpt_speaker_branch.pth", load_pos_params, unwrap="G")
    add("*/*_net_G_A.pth", load_trident_full_ifw_params)
    add("*/*_net_D_A*.pth", load_nlayer_d_params)
    add("static/drawing.pth", load_style2_params)
    add("static/cartoon.pt", load_photo2cartoon_params, unwrap="genA2B")
    add("modnet_photographic_portrait_matting.ckpt", load_modnet_params)
    add("mobilefacenet_model_best.pth.tar", load_mobilefacenet_params,
        unwrap="state_dict")
    add("sphere20a_20171020.pth", load_sphere20a_params)
    add("FlowReg_id_flow_faces/best_net_netF.pth", load_flowunet_params)
    add("pretrained.pt", load_voice_encoder_params, unwrap="model_state")

    if not jobs:
        print(f"no recognizable checkpoints under {args.src}")
        return 1
    os.makedirs(args.dst, exist_ok=True)
    for path, loader, unwrap, name in jobs:
        try:
            sd = load_torch_statedict(path)
            if unwrap and not sd:
                import torch

                obj = torch.load(path, map_location="cpu",
                                 weights_only=False)
                sd = {k: v.detach().numpy()
                      for k, v in obj[unwrap].items()}
            variables = loader(sd)
            out = os.path.join(args.dst,
                               name.replace("/", "__") + ".orbax")
            save(out, variables)
            print(f"converted {name} -> {out}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FAILED {name}: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
