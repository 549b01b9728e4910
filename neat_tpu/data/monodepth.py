"""Monocular depth/normal preprocessing hook.

Parity target: reference data/preprocess/monodepth.py — run the omnidata
monocular depth + surface-normal networks over an image directory and save
per-image .npy cues consumed by the depth-supervised loss variants
(loss_wfr_spd / loss_wfr_rpd; ground_truth['depth']).

omnidata (and its weights) are external downloads in the reference too; in
this offline image the torch hub path is unavailable, so this CLI:
  * uses omnidata when importable (identical contract to the reference),
  * else falls back to a DPT model from a local transformers cache when
    present,
  * else exits with a clear instruction — the rest of the framework treats
    depth cues as optional inputs.
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import numpy as np


def _try_omnidata(task: str):
    try:
        from omnidata_tools.torch.modules.midas.dpt_depth import DPTDepthModel  # noqa

        return "omnidata"
    except ImportError:
        return None


def _try_transformers_dpt():
    try:
        import transformers  # noqa

        # only usable with a pre-downloaded local cache (zero-egress image)
        cache = os.environ.get("HF_HOME") or osp.expanduser("~/.cache/huggingface")
        if osp.exists(osp.join(cache, "hub")) and os.listdir(osp.join(cache, "hub")):
            return "transformers"
    except ImportError:
        pass
    return None


def run(image_dir: str, out_dir: str, task: str = "depth") -> int:
    os.makedirs(out_dir, exist_ok=True)
    backend = _try_omnidata(task)
    if backend is None and task == "depth":
        backend = _try_transformers_dpt()
    if backend is None:
        extra = "" if task == "depth" else " (surface normals require omnidata)"
        raise SystemExit(
            "No monocular-cue backend available: install omnidata (the "
            "reference's dependency) or, for depth, provide a local "
            f"transformers DPT cache{extra}. Cues are optional — training "
            "without them uses the standard NEAT losses."
        )
    images = sorted(
        p for ext in ("*.png", "*.jpg") for p in glob.glob(osp.join(image_dir, ext))
    )
    import imageio.v2 as imageio

    if backend == "omnidata":
        import torch

        if task == "depth":
            from omnidata_tools.torch.modules.midas.dpt_depth import DPTDepthModel

            model = DPTDepthModel(backbone="vitb_rn50_384")
            default_w = "omnidata_dpt_depth_v2.ckpt"
        else:
            from omnidata_tools.torch.modules.midas.dpt_depth import DPTDepthModel

            model = DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)
            default_w = "omnidata_dpt_normal_v2.ckpt"
        ckpt = os.environ.get("OMNIDATA_WEIGHTS", default_w)
        state = torch.load(ckpt, map_location="cpu")
        model.load_state_dict(state.get("state_dict", state))
        model.eval()
        suffix = "_depth.npy" if task == "depth" else "_normal.npy"
        for p in images:
            img = imageio.imread(p).astype(np.float32) / 255.0
            with torch.no_grad():
                t = torch.from_numpy(img).permute(2, 0, 1)[None]
                out = model(t)[0].numpy()
            np.save(osp.join(out_dir, osp.splitext(osp.basename(p))[0] + suffix), out)
    else:  # transformers DPT depth from the local cache
        from transformers import pipeline

        pipe = pipeline("depth-estimation", device=-1)
        from PIL import Image as PILImage

        for p in images:
            depth = np.asarray(pipe(PILImage.open(p))["predicted_depth"])
            np.save(
                osp.join(out_dir, osp.splitext(osp.basename(p))[0] + "_depth.npy"),
                depth.squeeze(),
            )
    return len(images)


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--task", choices=["depth", "normal"], default="depth")
    args = parser.parse_args(argv)
    n = run(args.images, args.out, args.task)
    print(f"processed {n} images")


if __name__ == "__main__":
    main()
